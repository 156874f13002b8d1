package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable bloom-filter join pruning — the explicit form of Spark's
  * runtime-filter idea (`InjectRuntimeFilter`): build a fixed-size bit
  * set from the join keys of the selective side, broadcast it, and
  * drop fact rows MAP-SIDE before they reach the join shuffle. At
  * 100 TB the build side is often too big to broadcast as a hash
  * relation (so the join itself must co-shuffle both sides) while its
  * key set still compresses into a few KB of bloom bits — the filter
  * removes the non-matching fact rows before the exchange, which is
  * where the win lives (shuffle volume ∝ matching fraction + false
  * positives, not |fact|).
  *
  * Engine-portability (the repo's oracle-exactness recipe): bit
  * positions are Kirsch–Mitzenmacher double hashing over the two
  * 60-bit halves of ONE md5 digest (see
  * [[graft.plans.BloomHash]] — one digest per row, evaluated by a
  * native expression with a tight bit-test loop); each 64-bit word
  * holds 63 bits so no mask ever touches the sign bit — every
  * arithmetic step replays exactly in DuckDB, making even the
  * false-positive set deterministic and oracle-checkable.
  * The final semi join is exact, so query RESULTS never depend on the
  * bloom parameters; only the pruned fraction does.
  *
  * Reference anchor: the reference filters fact streams against a
  * config-loaded key set in JS (`/root/reference/task.ts:213-224`
  * `filterFeatures`); this is that gate re-expressed as a
  * shuffle-avoiding plan fragment.
  */
object BloomJoin {

  /** Bits per 64-bit word: 63 keeps `1L << bit` positive everywhere
    * (DuckDB BIGINT `<<` overflows at bit 63).
    */
  val BitsPerWord = 63

  /** One-row DataFrame `(bloom: array<long>)` of length `words` with
    * the bits of every key in `keys(keyCol)` set, `hashes` positions
    * per key. Build shape: explode keys×hashes → one `bit_or` shuffle
    * of at most `words` groups (map-side partial `bit_or` makes the
    * exchange O(words·partitions) regardless of key count) → a single
    * dense array row. No driver action — the bloom stays a plan.
    */
  def bloomBits(keys: DataFrame, keyCol: String,
      words: Int, hashes: Int): DataFrame =
    bloomBits(keys, col(keyCol), words, hashes)

  def bloomBits(keys: DataFrame, key: Column,
      words: Int, hashes: Int): DataFrame = {
    keys.select(explode(graft.plans.BloomHash.bloomPositions(
        key.cast("string"), words, hashes)).as("p"))
      .select((col("p") / BitsPerWord).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          (col("p") % BitsPerWord).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("word"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("word"))))
        .as("wm"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("bloom"))
  }

  /** Membership predicate: all `hashes` bits of `key` set in `bloom`
    * (an `array<long>` column). A native expression (one md5 digest
    * per row, early-exit bit-test loop) — lives in the scan stage,
    * below any exchange.
    */
  def mightContain(key: Column, bloom: Column,
      words: Int, hashes: Int): Column =
    graft.plans.BloomHash.bloomMightContain(
      key.cast("string"), bloom, words, hashes)

  /** Exact semi join with bloom pre-pruning: `fact` rows whose
    * `factKey` can't be in `dims(dimKey)` drop before the join; the
    * final LEFT SEMI join removes bloom false positives, so the
    * result is row-identical to the plain semi join at any bloom
    * size. The bloom reaches the predicate as a SCALAR SUBQUERY (the
    * InjectRuntimeFilter shape) rather than a broadcast cross join:
    * a join formulation gets reordered by
    * PushLeftSemiLeftAntiThroughJoin, which would move the exact
    * semi join BELOW the bloom test and defeat the pruning; a
    * subquery-fed Filter is a fixed point — it stays glued to the
    * scan, below the join exchange (BloomJoinSpec asserts this).
    */
  def semiJoinPruned(fact: DataFrame, factKey: String,
      dims: DataFrame, dimKey: String,
      words: Int = 4096, hashes: Int = 3): DataFrame =
    bloomPass(fact, factKey, dims, dimKey, words, hashes)
      .join(dims, col(factKey) === dims(dimKey), "left_semi")

  /** Bloom-only pass (no exact verify): what reaches the join — used
    * to pin the deterministic false-positive set and measure pruning.
    */
  def bloomPass(fact: DataFrame, factKey: String,
      dims: DataFrame, dimKey: String,
      words: Int = 4096, hashes: Int = 3): DataFrame = {
    val bloom = org.apache.spark.sql.graftbridge.ColumnBridge
      .scalarSubquery(bloomBits(dims, dimKey, words, hashes))
    fact.filter(mightContain(col(factKey), bloom, words, hashes))
  }

  /** Driver-materialized bloom bits, for contexts that can't carry a
    * scalar subquery — a STREAMING ingest filter, chiefly. One
    * collect of the one-row bloom at stream setup (the array is
    * `words` longs — 32 KB at the default), then the bits ride the
    * per-batch filter as a literal: every micro-batch drops
    * non-matching rows map-side with zero state and zero join, the
    * streaming mirror of the batch pre-prune. Same deterministic
    * md5 positions, so stream and batch pass the same rows.
    */
  def bloomBitsLocal(dims: DataFrame, dimKey: String,
      words: Int = 4096, hashes: Int = 3): Array[Long] =
    bloomBits(dims, dimKey, words, hashes)
      .head().getSeq[Long](0).toArray

  def mightContainLocal(key: Column, bits: Array[Long],
      words: Int = 4096, hashes: Int = 3): Column =
    mightContain(key, typedLit(bits.toSeq), words, hashes)
}
