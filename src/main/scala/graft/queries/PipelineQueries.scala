package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.TrackPipeline

/** The reference's track-point pipeline (SURVEY.md §2a) over the
  * `events` table, which stands in for the track stream:
  * `user_id`≈entityId, `ts`≈trackPoint.time,
  * `event_type='error'`≈isEmergency, `value`≈direction/course.
  *
  * Each named query maps to labelled reference operators
  * (reference `task.ts`, cites in [[graft.operators.TrackPipeline]]).
  */
object PipelineQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Flagship: retention filter (F1) + latest-per-key (A1) + CoT
    * transform (T2/T3/T5) — the reference's whole scheduled-poll
    * dataflow in one plan (reference `task.ts:166-242`).
    */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-20").cast("timestamp")
    val kept = TrackPipeline.retained(ev(s, dir), "ts", cutoff)
    TrackPipeline.latestPerKey(kept, "user_id", "ts", "event_id")
      .select(
        TrackPipeline.cotId(col("user_id")).as("id"),
        TrackPipeline.cotType(col("latest.event_type") === "error")
          .as("cot_type"),
        col("latest.value").as("course"),
        unix_millis(col("latest.ts")).as("time_ms"))
      .orderBy(col("id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // T1–T7: projection/rename, computed key, conditional CoT type,
    // literal column, ISO-8601 time, point array (reference
    // `task.ts:121-143`).
    "tp_cot_transform" -> { (s, dir) =>
      ev(s, dir).select(
        TrackPipeline.cotId(col("user_id")).as("id"),
        col("event_id"),
        TrackPipeline.cotType(col("event_type") === "error").as("cot_type"),
        lit("m-g").as("how"),
        col("value").as("course"),
        TrackPipeline.isoTime(col("ts")).as("time_iso"),
        // T7 builds the coordinates array; emit its elements as scalar
        // doubles — the driver's pandas compare can't hash ndarray
        // cells (round-1 tp_cot_transform err).
        element_at(array(col("value"), col("user_id").cast("double")), 1)
          .as("point_x"),
        element_at(array(col("value"), col("user_id").cast("double")), 2)
          .as("point_y"))
        .orderBy(col("id"), col("event_id"))
    },

    // T4: JS `alias || name` falsy coalesce (empty string falls
    // through too — reference `task.ts:128,219`, SURVEY §5.2.4).
    "tp_callsign_coalesce" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TrackPipeline.callsign(col("source"), col("lang")).as("callsign"))
        .orderBy(col("doc_id"))
    },

    // F1 with the `?? 0` quirk: rows whose timestamp is NULL coerce
    // to epoch 0 and are always evicted (reference `task.ts:252`).
    // We null out 'signup' timestamps to exercise the rule.
    "tp_retention_eviction" -> { (s, dir) =>
      val withNulls = ev(s, dir).withColumn("ts",
        when(col("event_type") === "signup", lit(null).cast("timestamp"))
          .otherwise(col("ts")))
      TrackPipeline.retained(withNulls, "ts",
          lit("2024-01-10").cast("timestamp"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    },

    // SCD2 history build: each event becomes a validity interval
    // [valid_from, valid_to) per entity — valid_to is the next
    // event's time (lead window), open intervals get a far-future
    // sentinel and is_current=1. The standard dimension-history shape
    // a warehouse pipeline derives from a change stream; one shuffle
    // on the entity key, WindowGroupLimit-free (full history kept by
    // design).
    "tp_scd2_intervals" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      val sentinel = 253402300800000L // 10000-01-01T00:00:00Z, epoch ms
      ev(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("valid_from"),
          col("event_type").as("state"), col("value"))
        .withColumn("valid_to",
          coalesce(lead(col("valid_from"), 1).over(w), lit(sentinel)))
        .withColumn("is_current",
          (col("valid_to") === sentinel).cast("int"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },

    // A1: latest row per key with deterministic tie-break
    // (`latestPositionOnly=true`, reference `task.ts:178`).
    "tp_latest_per_key" -> { (s, dir) =>
      TrackPipeline.latestPerKey(ev(s, dir), "user_id", "ts", "event_id")
        .select(col("user_id"),
          unix_millis(col("latest.ts")).as("last_ms"),
          col("latest.event_type").as("last_type"),
          col("latest.value").as("last_value"))
        .orderBy(col("user_id"))
    },

    // A2: keyed last-write-wins upsert — prior snapshot merged with a
    // filtered fresh batch, newest per key wins (reference
    // `task.ts:148`; batch form = union + A1 per SURVEY §2a).
    "tp_upsert_merge" -> { (s, dir) =>
      val cut = lit("2024-01-15").cast("timestamp")
      val e = ev(s, dir)
      val snapshot = TrackPipeline
        .latestPerKey(e.filter(col("ts") < cut), "user_id", "ts", "event_id")
        .select(col("latest.*"))
      val fresh = e.filter(col("ts") >= cut && col("event_type") =!= "view")
      TrackPipeline.upsert(snapshot, fresh, "user_id", "ts", "event_id")
        .select(col("user_id"),
          unix_millis(col("latest.ts")).as("last_ms"),
          col("latest.event_type").as("last_type"))
        .orderBy(col("user_id"))
    },

    // K1': the CoT XML wire format — each event rendered as the
    // Cursor-on-Target <event> document a TAK consumer ingests
    // (reference task.ts:2,121 via the peer node-cot serializer).
    // Deterministic string construction, so the whole XML is
    // hash-compared against the oracle.
    "tp_cot_xml" -> { (s, dir) =>
      // lon stand-in is DOMAIN-PRESERVING (pmod into [-180, 180)):
      // cotXml documents the validated physical ranges and renders
      // via decimal(12,2) — a raw user_id stand-in overflows it once
      // key-offset synthesis pushes ids past 1e10 (sf10 sweep)
      ev(s, dir).select(
        col("event_id"),
        TrackPipeline.cotId(col("user_id")).as("uid"),
        TrackPipeline.cotXml(col("user_id"),
          col("event_type") === "error", col("ts"),
          course = col("value"), lat = col("value"),
          lon = (pmod(col("user_id"), lit(360)) - lit(180))
            .cast("double")).as("cot_xml"))
        .orderBy(col("uid"), col("event_id"))
    },

    // The full scheduled-poll dataflow (flagship, also SparkEntry.entry).
    "tp_pipeline_e2e" -> { (s, dir) => flagship(s, dir) },
  )

  val oracles: Map[String, String] = Map(
    "tp_scd2_intervals" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS valid_from,
         event_type AS state, value,
         coalesce(lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
           ORDER BY epoch_ms(ts), event_id), 253402300800000)
           AS valid_to,
         CAST(coalesce(lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
           ORDER BY epoch_ms(ts), event_id), 253402300800000)
           = 253402300800000 AS INTEGER) AS is_current
         FROM events
         ORDER BY user_id, valid_from, event_id""",

    "tp_cot_transform" ->
      """SELECT 'inreach-' || user_id AS id, event_id,
         CASE WHEN event_type = 'error' THEN 'b-a-o-tbl'
              ELSE 'a-f-G-U-U-S-X' END AS cot_type,
         'm-g' AS how, value AS course,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS time_iso,
         [value, CAST(user_id AS DOUBLE)][1] AS point_x,
         [value, CAST(user_id AS DOUBLE)][2] AS point_y
         FROM events ORDER BY id, event_id""",

    "tp_callsign_coalesce" ->
      """SELECT doc_id, coalesce(nullif(source, ''), lang) AS callsign
         FROM documents ORDER BY doc_id""",

    "tp_retention_eviction" ->
      """SELECT event_type, count(*) AS cnt FROM events
         WHERE coalesce(
             CASE WHEN event_type = 'signup' THEN NULL ELSE ts END,
             TIMESTAMP '1970-01-01') >= TIMESTAMP '2024-01-10'
         GROUP BY event_type ORDER BY event_type""",

    "tp_latest_per_key" ->
      """SELECT user_id, epoch_ms(ts) AS last_ms,
         event_type AS last_type, value AS last_value
         FROM events
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) = 1
         ORDER BY user_id""",

    "tp_upsert_merge" ->
      """WITH snap AS (
           SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-15'
           QUALIFY row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) = 1
         ), fresh AS (
           SELECT * FROM events
           WHERE ts >= TIMESTAMP '2024-01-15' AND event_type <> 'view'
         ), merged AS (
           SELECT * FROM snap UNION ALL SELECT * FROM fresh
         )
         SELECT user_id, epoch_ms(ts) AS last_ms, event_type AS last_type
         FROM merged
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) = 1
         ORDER BY user_id""",

    "tp_cot_xml" ->
      """SELECT event_id, 'inreach-' || user_id AS uid,
         '<event version="2.0" uid="inreach-' || user_id ||
         '" type="' ||
           CASE WHEN event_type = 'error' THEN 'b-a-o-tbl'
                ELSE 'a-f-G-U-U-S-X' END ||
         '" how="m-g" time="' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') ||
         '" start="' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') ||
         '" stale="' || strftime(ts + INTERVAL 10 MINUTE,
                                 '%Y-%m-%dT%H:%M:%S.%gZ') ||
         '"><point lat="' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) ||
         '" lon="' || CAST(CAST(CAST((user_id % 360 + 360) % 360 - 180
                             AS DOUBLE) AS DECIMAL(12,2))
                           AS VARCHAR) ||
         '" hae="0.0" ce="9999999.0" le="9999999.0"/>' ||
         '<detail><contact callsign="inreach-' || user_id ||
         '"/><track course="' ||
           CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) ||
         '"/></detail></event>' AS cot_xml
         FROM events ORDER BY uid, event_id""",

    "tp_pipeline_e2e" ->
      """SELECT 'inreach-' || user_id AS id,
         CASE WHEN event_type = 'error' THEN 'b-a-o-tbl'
              ELSE 'a-f-G-U-U-S-X' END AS cot_type,
         value AS course, epoch_ms(ts) AS time_ms
         FROM events WHERE ts >= TIMESTAMP '2024-01-20'
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) = 1
         ORDER BY id""",
  )
}
