package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-portable hash idiom, defined ONCE for the query
  * corpus: the first 15 hex characters of md5 read base-16 — what
  * every oracle replays as
  * `('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT`
  * (DuckDB) ≡ `conv(substring(md5(cast(x as string)), 1, 15), 16,
  * 10)` (Spark). 60 bits keeps the value inside a signed BIGINT in
  * both engines. Previously re-implemented per file (six string /
  * Column variants that had to stay bit-identical by discipline
  * alone — and one interpolated `Column.toString` into SQL text,
  * which breaks for any composite expression).
  */
private[graft] object Portable {

  /** 2^60 as a double — the divisor that maps h60 to (0, 1]. */
  val two60: Double = 1152921504606846976.0

  /** 60-bit md5-prefix hash of any Column expression. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
      .cast("long")
}
