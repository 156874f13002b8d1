package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to each left row the newest right row with
  * `right.ts <= left.ts` within the same key — the time-series
  * enrichment operator (trades⋈quotes, event⋈last-config, …).
  *
  * Spark has no built-in as-of join; the naive non-equi formulation
  * (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes into a range
  * join with O(|matches|) intermediate rows. This implementation is
  * the scale-correct composition (build-brief preference (a)):
  * tag both sides, union, ONE shuffle+sort by (key, ts, side), then a
  * running `last(payload, ignoreNulls)` window — O(n log n) with no
  * pair blow-up, and the window frame is growing-only so Spark keeps
  * a single running value (no frame re-scan).
  *
  * Ties: a right row at exactly left.ts is visible (side orders
  * right-before-left at equal ts), matching `>=` as-of semantics.
  * Right payload is wrapped in a struct internally so genuinely-null
  * payload fields survive `last(ignoreNulls)`.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String]): DataFrame = {
    val rp = right
      // null key/ts never match — the asOfStatic contract. Without
      // this, a null-ts right row sorts FIRST in the ascending
      // window (nulls-first) and its payload attaches to every left
      // row that precedes all real right rows, a match whose ts
      // relation is unknown.
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
        col(key), col(ts),
        struct(payloadCols.map(col): _*).as("__asof_payload"))
      .withColumn("__side", lit(0))
    val lp = left.withColumn("__side", lit(1))
    val unioned = lp.unionByName(rp, allowMissingColumns = true)
    // payload as the final sort key makes equal-(ts, side) right
    // rows a TOTAL order: last() then deterministically attaches the
    // max payload — the same winner asOfStatic's sorted index picks
    // (rightmost entry at a tied ts) — instead of whichever row the
    // physical sort happened to place last in that run
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__asof_payload"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val attached = unioned.withColumn("__asof_match",
      last(col("__asof_payload"), ignoreNulls = true).over(w))
    val out = attached.filter(col("__side") === 1)
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, col(s"__asof_match.$c"))
    }.drop("__side", "__asof_payload", "__asof_match")
  }

  /** Stream-static as-of: enrich a (possibly streaming) left side
    * against a STATIC right side collected once into a broadcast
    * per-key sorted index, probed with binary search per row — no
    * state, no join, no shuffle on the stream, so it composes with
    * any output mode and any downstream operator. This is the
    * streaming member of the as-of family (the union+window
    * composition and the native merge both need the full right side
    * per batch); the static side must fit on the driver, the right
    * trade for the reference-shaped "enrich live events against a
    * slowly-changing history" pipeline.
    *
    * Key/ts are read as longs (cast timestamps to `unix_millis`
    * upstream); payload is a single string column for the same
    * reason the CoT pipeline serializes structured payloads —
    * encoder-simple and null-cleanly absent for no-match rows.
    * Semantics match [[asOf]]: newest right row with ts' <= ts,
    * equal-ts visible, null key/ts never match.
    *
    * `maxRows` is the driver-envelope guard (same discipline as
    * [[Dedup.connectedComponents]]'s `driverMaxEdges`): the right
    * side is counted BEFORE the collect, and a side above the cap
    * fails fast with an actionable error instead of a late driver
    * OOM mid-collect. The default (2²¹ ≈ 2M rows) matches the
    * "broadcast dimension" envelope — tens of MB of (long, long,
    * short string) — not "whatever happens to fit today".
    */
  def asOfStatic(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: String,
      outCol: String, maxRows: Long = 1L << 21): DataFrame = {
    val spark = left.sparkSession
    val projected = right
      .select(col(key).cast("long"), col(ts).cast("long"),
        col(payload).cast("string"))
      .filter(col(key).isNotNull && col(ts).isNotNull)
    val n = projected.count()
    if (n > maxRows)
      throw new IllegalArgumentException(
        s"asOfStatic: static right side has $n rows, above the " +
          s"driver-collect envelope of $maxRows. This operator " +
          "builds a driver-side broadcast index and is only for " +
          "small static dimensions; for a large right side use " +
          "AsOfJoin.asOf (union + single-shuffle running window) " +
          "or the native ASOF JOIN (graft.plans.AsOfJoinNative / " +
          "`l ASOF JOIN r`), which never leave the executors. " +
          "If the size is intentional, raise maxRows explicitly.")
    val index: Map[Long, (Array[Long], Array[String])] =
      projected
        .collect()
        .groupBy(_.getLong(0))
        .map { case (k, rows) =>
          val sorted = rows.map(r => (r.getLong(1), r.getString(2)))
            .sortBy(r => (r._1, r._2))
          k -> (sorted.map(_._1), sorted.map(_._2))
        }
    val bcast = spark.sparkContext.broadcast(index)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    left.withColumn(outCol, column(graft.plans.AsOfLookupExpr(
      expression(col(key).cast("long")),
      expression(col(ts).cast("long")), bcast)))
  }
}
