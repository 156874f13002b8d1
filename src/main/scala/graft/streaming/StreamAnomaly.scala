package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed metric observation arriving on the stream. */
case class MetricPoint(event_id: Long, ts: java.sql.Timestamp,
    event_type: String, value: Double)

/** Per-event verdict; z is None until the key has full history (and
  * when the trailing window has zero variance).
  */
case class AnomalyScore(event_id: Long, event_type: String,
    z: Option[Double], anomalous: Boolean)

/** The last `window` raw values per key, oldest first. */
case class RingState(values: List[Double])

/** Streaming parity for the batch rolling z-score operator
  * ([[graft.operators.Anomaly.rollingZ]] / `q_anomaly_zscore`):
  * events score as they arrive against the mean/stddev of the
  * previous `window` same-key values.
  *
  * State is the raw trailing values (`window` doubles per key — a
  * few hundred bytes regardless of uptime), NOT running moments:
  * storing sum/sum-of-squares would need exact decimal state to stay
  * drift-free, and re-deriving both from the ring costs O(window)
  * per event — trivial at any realistic window. Scoring quantizes
  * through the SAME DECIMAL(18,6) grid as the batch plan (Spark's
  * double→decimal cast is HALF_UP on the shortest decimal form,
  * which `BigDecimal.decimal` reproduces), then runs the identical
  * double arithmetic — so stream and batch z-scores are
  * bit-identical, which AnomalyStreamSpec pins across uneven
  * micro-batch splits.
  *
  * In-order feed contract: like the geofence stream, per-key
  * ordering across micro-batches is the caller's responsibility
  * (each group's batch slice is sorted here; production fronts this
  * with a watermark + sorted repartition or reads an ordered log).
  */
object StreamAnomaly {

  private def micros(ts: java.sql.Timestamp): Long =
    StreamArith.micros(ts)

  def zScores(events: Dataset[MetricPoint], window: Int = 20,
      zMax: Double = 3.0): Dataset[AnomalyScore] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[MetricPoint],
         state: GroupState[RingState]) =>
          var buf = state.getOption.map(_.values).getOrElse(Nil)
          val out = List.newBuilder[AnomalyScore]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val z: Option[Double] =
              if (buf.length == window) {
                val q = buf.map(v => BigDecimal.decimal(v)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP))
                val sm = q.sum
                val sq = q.map(d => d * d).sum
                val mean = sm.toDouble / window
                // exact-decimal numerator — same formula as the
                // batch rollingZ and its oracle (no E[x²] − E[x]²
                // double cancellation)
                val variance = (sq * window - sm * sm).toDouble /
                  (window.toLong * window)
                if (variance > 0)
                  Some((e.value - mean) / math.sqrt(variance))
                else None
              } else None
            out += AnomalyScore(e.event_id, key, z,
              z.exists(v => math.abs(v) > zMax))
            buf = (buf :+ e.value).takeRight(window)
          }
          state.update(RingState(buf))
          out.result().iterator
      }
  }
}
