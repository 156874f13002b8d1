package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's track-point pipeline (reference `task.ts:97-264`),
  * re-expressed as composable `DataFrame => DataFrame` operators.
  *
  * The reference (dfpc-coe/etl-everywhere-hub) ingests GPS track points
  * and emits TAK Cursor-on-Target features, keeping a keyed
  * latest-position cache with time-based retention. Each operator here
  * is the Spark-native equivalent of one labelled operator in
  * SURVEY.md §2a:
  *
  *  - T2 computed key            (`task.ts:122,213`)  → [[cotId]]
  *  - T3 conditional CoT type    (`task.ts:125,216`)  → [[cotType]]
  *  - T4 falsy coalesce callsign (`task.ts:128,219`)  → [[callsign]]
  *  - T5 epoch-millis → ISO-8601 (`task.ts:129-130`)  → [[isoTime]]
  *  - F1 retention filter        (`task.ts:251-258`)  → [[retained]]
  *  - A1 latest-per-key          (`task.ts:178`)      → [[latestPerKey]]
  *  - A2 keyed last-write upsert (`task.ts:148`)      → [[upsert]]
  *
  * Scale notes (100 TB / 1000-executor design):
  *  - [[latestPerKey]] uses `max_by` over a `groupBy` — a hash
  *    aggregate with map-side partial aggregation, so the shuffle
  *    carries one row per key per map partition, not the raw stream.
  *    This beats the `row_number()` window formulation, which must
  *    shuffle + sort EVERY row before discarding all but one per key.
  *  - [[upsert]] is `unionByName` + [[latestPerKey]]: one shuffle
  *    total. The snapshot and delta are both partitioned by the key
  *    after the agg, so iterative upserts reuse the partitioning.
  *  - [[retained]] is a plain predicate → pushed into the parquet scan
  *    by Catalyst (shows under `PushedFilters` in explain).
  */
object TrackPipeline {

  /** CoT 2525 type codes (reference `task.ts:125`): emergency beacon
    * vs friendly-ground-unit.
    */
  val EmergencyType = "b-a-o-tbl"
  val FriendlyType  = "a-f-G-U-U-S-X"

  /** T2 — `id = "inreach-" + entityId` (reference `task.ts:122,213`). */
  def cotId(entityId: Column): Column =
    concat(lit("inreach-"), entityId.cast("string"))

  /** T3 — emergency classification (reference `task.ts:125,216`). */
  def cotType(isEmergency: Column): Column =
    when(isEmergency, lit(EmergencyType)).otherwise(lit(FriendlyType))

  /** T4 — `alias || name` with JS falsy semantics: empty string falls
    * through to `name`, not just null (reference `task.ts:128,219`;
    * quirk documented in SURVEY.md §5.2.4).
    */
  def callsign(alias: Column, name: Column): Column =
    coalesce(nullif(alias, lit("")), name)

  /** T5 — epoch-millis → ISO-8601 with milliseconds + 'Z', exactly as
    * JS `Date.toISOString()` renders it (reference `task.ts:129-130`).
    * Session TZ is pinned UTC (build.sbt / Verify).
    */
  def isoTime(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")

  /** K1' — a CoT event XML wire format (reference `task.ts:2,121`:
    * the emitted feature is serialized to Cursor-on-Target XML by the
    * peer `node-cot` library before submission — node-cot is an
    * external dependency, not vendored in the reference, so the
    * +10 min stale window and the hae/ce/le placeholder constants
    * here are ASSUMED defaults of that serialization, chosen to be
    * plausible and pinned by our own golden tests rather than traced
    * to node-cot source). Deterministic string construction — every
    * numeric field goes through a fixed-scale decimal render,
    * timestamps through the ISO-8601-with-millis render — so the
    * full XML string carries an exact SQL oracle.
    * Pure codegen'd `concat`: scan-speed, no UDF, no shuffle.
    *
    * Domain assumption: course/lat/lon are rendered via
    * decimal(12,2), which nulls (ANSI off) beyond |1e10| — far
    * outside the physical domain (course < 360, |lat| ≤ 90,
    * |lon| ≤ 180, the validated-schema ranges), but a caller feeding
    * unvalidated numerics should widen the scale or pre-filter.
    */
  def cotXml(entityId: Column, isEmergency: Column, ts: Column,
      course: Column, lat: Column, lon: Column): Column = {
    def f2(c: Column) = c.cast("decimal(12,2)").cast("string")
    val uid = cotId(entityId)
    val stale = isoTime(ts + expr("INTERVAL 10 MINUTES"))
    concat(
      lit("<event version=\"2.0\" uid=\""), uid,
      lit("\" type=\""), cotType(isEmergency),
      lit("\" how=\"m-g\" time=\""), isoTime(ts),
      lit("\" start=\""), isoTime(ts),
      lit("\" stale=\""), stale,
      lit("\"><point lat=\""), f2(lat),
      lit("\" lon=\""), f2(lon),
      lit("\" hae=\"0.0\" ce=\"9999999.0\" le=\"9999999.0\"/>"),
      lit("<detail><contact callsign=\""), uid,
      lit("\"/><track course=\""), f2(course),
      lit("\"/></detail></event>"))
  }

  /** F1 — retention filter with the reference's `?? 0` rule: a missing
    * timestamp coerces to epoch 0 and is always evicted
    * (reference `task.ts:251-258`, quirk SURVEY.md §5.2.3).
    */
  def retained(df: DataFrame, tsCol: String, cutoff: Column): DataFrame =
    df.filter(coalesce(col(tsCol), timestamp_millis(lit(0L))) >= cutoff)

  /** A1 — latest row per key (`latestPositionOnly=true`, reference
    * `task.ts:178`). Tie-break on `tieCol` so results are deterministic
    * (SURVEY.md §7.4: JS object-key replace is last-write-wins; we pin
    * ties to the larger id).
    *
    * Returns one `latest` struct column per key; callers project
    * fields out of it. One hash-aggregate shuffle; partial aggregation
    * keeps the exchange at |keys| × mapPartitions rows.
    */
  def latestPerKey(df: DataFrame, key: String, tsCol: String,
                   tieCol: String): DataFrame = {
    val payload = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(col(key))
      .agg(max_by(payload, struct(col(tsCol), col(tieCol))).as("latest"))
  }

  /** A2 — keyed last-write-wins upsert (reference `task.ts:148`):
    * merge fresh rows into a prior snapshot, newest per key wins.
    * Batch formulation of the streaming state update: union + A1.
    */
  def upsert(snapshot: DataFrame, fresh: DataFrame, key: String,
             tsCol: String, tieCol: String): DataFrame =
    latestPerKey(snapshot.unionByName(fresh), key, tsCol, tieCol)
}
