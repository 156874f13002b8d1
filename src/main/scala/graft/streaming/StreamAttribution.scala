package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attribution-relevant event arriving on the stream. */
case class TouchEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, event_type: String, value: Double)

/** Emitted when a purchase is attributed to its last touch. */
case class Attribution(user_id: Long, event_id: Long,
    channel: String, value: Double)

/** Streaming parity for the batch last-touch attribution window
  * ([[graft.queries.SequenceQueries]] `q_attribution_last_touch`):
  * ONE string of state per user (the latest touch channel seen),
  * where the batch form needs an unbounded-preceding window over
  * the whole history. Purchases emit immediately with their
  * attributed channel — append-mode, no retraction, O(1) state.
  *
  * Same in-order feed contract as the funnel/anomaly/CDC streams:
  * per-key order across micro-batches is the caller's job; each
  * group's slice is sorted here by (µs, event_id) — the same total
  * order the batch window uses (Timestamp.getTime is ms-truncated,
  * hence the Instant-based micros).
  */
object StreamAttribution {

  private val touches = Set("click", "view", "signup")

  private def micros(ts: java.sql.Timestamp): Long =
    StreamArith.micros(ts)

  def attributions(events: Dataset[TouchEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[TouchEvent],
         state: GroupState[String]) =>
          var channel = state.getOption.getOrElse("unattributed")
          val out = List.newBuilder[Attribution]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (touches(e.event_type)) channel = e.event_type
            else if (e.event_type == "purchase")
              out += Attribution(uid, e.event_id, channel, e.value)
          }
          state.update(channel)
          out.result().iterator
      }
  }
}
