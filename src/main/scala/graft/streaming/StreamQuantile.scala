package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed value observation arriving on the stream. */
case class QPoint(event_id: Long, event_type: String, value: Double)

/** Per-batch quantile estimates for one key. */
case class QuantileEstimate(event_type: String, n_sample: Long,
    est_p50: Double, est_p90: Double)

/** The k entries with the smallest (hash, id), ascending. */
case class QSketchState(entries: List[(Long, Long, Double)])

/** Streaming form of the deterministic-sample quantile sketch
  * (`q_agg_quantile_sketch`): per key, keep the k observations with
  * the smallest md5(event_id) — a uniform random sample whose
  * membership is a pure function of the ids, so it is
  * ORDER-INDEPENDENT: any arrival order, any micro-batch split, and
  * any merge of partial sketches lands on the identical sample, which
  * is why the streaming estimates equal the batch query's exactly
  * (QuantileStreamSpec pins it). State is k (hash, id, value) triples
  * per key — fixed, uptime-independent, the streaming analogue of
  * the batch plan's WindowGroupLimit bound.
  */
object StreamQuantile {

  /** Same 60-bit hash as the batch SQL:
    * `conv(substring(md5(id), 1, 15), 16, 10)` — shared numeric
    * form (per-thread digest, no hex-string allocation per event).
    */
  private def hash60(s: String): Long = StreamArith.hash60(s)

  private def round4(v: Double): Double = StreamArith.round4(v)

  def estimates(points: Dataset[QPoint], k: Int = 256)
      : Dataset[QuantileEstimate] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[QPoint],
         state: GroupState[QSketchState]) =>
          val prev = state.getOption.map(_.entries).getOrElse(Nil)
          // .distinct BEFORE take(k): an at-least-once source can
          // re-deliver an event; its (hash, id, value) triple is
          // identical, and without dedup it would occupy two sample
          // slots and evict a legitimate distinct event — membership
          // must stay a pure function of the id set
          val merged = (prev ++ it.map(p =>
              (hash60(p.event_id.toString), p.event_id, p.value)))
            .distinct.sortBy(e => (e._1, e._2)).take(k)
          state.update(QSketchState(merged))
          val sv = merged.map(_._3).sorted
          val n = sv.length
          def est(q: Double) =
            round4(sv(math.max(1, math.ceil(q * n).toInt) - 1))
          Iterator.single(
            QuantileEstimate(key, n.toLong, est(0.5), est(0.9)))
      }
  }
}
