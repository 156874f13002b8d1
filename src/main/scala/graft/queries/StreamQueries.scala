package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch analogues of the streaming window operators (SURVEY.md §2b
  * "streaming: windows"): tumbling is in RelationalQueries; here the
  * sliding and session variants, both oracle-checked (the session
  * oracle is the classic gaps-and-islands rewrite). The true
  * streaming forms (watermarks, state, triggers) run in
  * StreamingSpec over MemoryStream — not SQL-expressible, per the
  * driver contract.
  */
object StreamQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sliding window: 1h window, 30m slide — every event lands in
    // exactly two windows.
    "q_sliding_window" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4)
          .as("total"))
        .select(unix_millis(col("window.start")).as("win_start_ms"),
          col("event_type"), col("cnt"), col("total"))
        .orderBy(col("win_start_ms"), col("event_type"))
    },

    // Session window: per-user sessions closed by a 30-minute gap.
    "q_session_window" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          col("n_events"), col("total"))
        .orderBy(col("user_id"), col("session_start_ms"))
    },
  )

  val oracles: Map[String, String] = Map(
    // Each event belongs to the two 30m-aligned windows in
    // (ts-1h, ts]; reconstruct them with k ∈ {0,1} grid shifts.
    "q_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value
                    FROM events),
         w AS (SELECT
             ((us - k * 1800000000) // 3600000000 * 3600000000
               + k * 1800000000) // 1000 AS win_start_ms,
             event_type, value
           FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k))
         SELECT win_start_ms, event_type, count(*) AS cnt,
           round(sum(value), 4) AS total
         FROM w GROUP BY win_start_ms, event_type
         ORDER BY win_start_ms, event_type""",

    // Gaps-and-islands: a new session starts when the gap from the
    // previous event (µs precision, matching Spark's timestamp
    // granularity) reaches 30 minutes.
    "q_session_window" ->
      """WITH o AS (
           SELECT user_id, ts, event_id, value, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         g AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o)
         SELECT user_id, min(us) // 1000 AS session_start_ms,
           count(*) AS n_events, round(sum(value), 4) AS total
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_start_ms""",
  )
}
