package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-relevant event arriving on the stream. */
case class FunnelEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, event_type: String)

/** Emitted when a user advances a funnel stage. */
case class StageAdvance(user_id: Long, stage: Int, at_us: Long)

/** Per-user funnel position: stage reached + its event time (µs). */
case class FunnelState(st: Int, t: Long)

/** Stage advance tagged with the user's experiment arm. */
case class VariantStageAdvance(variant: String, user_id: Long,
    stage: Int, at_us: Long)

/** Streaming parity for the batch ordered-funnel fold
  * ([[graft.queries.AnalyticsQueries]] `q_funnel_steps`): users
  * advance signup → click → purchase AS EVENTS ARRIVE, with two
  * ints of state per user — where the batch form must wait for the
  * corpus and collect each user's array.
  *
  * Emits one row per stage ADVANCE (append-mode friendly, no
  * retraction); a user's latest emitted stage equals the batch
  * fold's final stage, which FunnelStreamSpec pins across uneven
  * micro-batch splits. Step comparisons use µs timestamps derived
  * via Instant (java.sql.Timestamp.getTime is ms-truncated — not
  * enough when the batch fold orders by unix_micros).
  *
  * Same in-order feed contract as the anomaly/geofence streams:
  * per-key order across micro-batches is the caller's job; each
  * group's slice is sorted here.
  */
object StreamFunnel {

  private def micros(ts: java.sql.Timestamp): Long =
    StreamArith.micros(ts)

  def stageAdvances(events: Dataset[FunnelEvent]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.map(_.st).getOrElse(0)
          var t = state.getOption.map(_.t).getOrElse(-1L)
          val out = List.newBuilder[StageAdvance]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val u = micros(e.ts)
            val advance =
              (st == 0 && e.event_type == "signup") ||
              (st == 1 && e.event_type == "click" && u > t) ||
              (st == 2 && e.event_type == "purchase" && u > t)
            if (advance) {
              st += 1; t = u
              out += StageAdvance(uid, st, u)
            }
          }
          state.update(FunnelState(st, t))
          out.result().iterator
      }
  }

  /** The user's experiment arm — byte-identical to the batch
    * `variantOf` (md5 hex prefix, 8 nibbles = first 4 digest bytes,
    * parity of the 32-bit value = lowest bit of byte 3): same hash,
    * same assignment, so stream and batch bucket every user alike.
    * Digest via StreamArith's per-thread MessageDigest — this runs
    * on the hot path of every stage advance.
    */
  private[graft] def variantOf(uid: Long): String =
    if ((StreamArith.md5Bytes(uid.toString)(3) & 1) == 0) "control"
    else "treatment"

  /** `q_funnel_by_variant` twin: the same two-int per-user fold,
    * each advance tagged with the experiment arm. Per-variant
    * final-stage counts (stage ≥ k) reproduce the batch conversion
    * table; state stays O(1) per user because the arm is a pure
    * hash of the key, never stored.
    */
  def variantStageAdvances(events: Dataset[FunnelEvent])
      : Dataset[VariantStageAdvance] = {
    import events.sparkSession.implicits._
    stageAdvances(events).map(a => VariantStageAdvance(
      variantOf(a.user_id), a.user_id, a.stage, a.at_us))
  }
}
