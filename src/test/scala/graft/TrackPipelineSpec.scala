package graft

import org.apache.spark.sql.functions._
import graft.operators.TrackPipeline

/** Semantics of the track-point pipeline operators, including the
  * reference's behavioral quirks (SURVEY.md §5.2).
  */
class TrackPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("T4 callsign: JS falsy coalesce treats empty string as absent") {
    val df = Seq(
      ("ALPHA-1", "Unit Alpha"), // alias wins
      ("", "Unit Bravo"),        // empty alias falls through (quirk §5.2.4)
      (null, "Unit Charlie")     // null alias falls through
    ).toDF("alias", "name")
    val got = df.select(TrackPipeline.callsign($"alias", $"name"))
      .as[String].collect().toSeq
    assert(got == Seq("ALPHA-1", "Unit Bravo", "Unit Charlie"))
  }

  test("T3 cotType: emergency classification") {
    val df = Seq(true, false).toDF("emg")
    val got = df.select(TrackPipeline.cotType($"emg")).as[String].collect()
    assert(got.toSeq == Seq("b-a-o-tbl", "a-f-G-U-U-S-X"))
  }

  test("T5 isoTime matches JS Date.toISOString format") {
    val df = Seq(1754956800123L).toDF("ms")
    val got = df.select(TrackPipeline.isoTime(timestamp_millis($"ms")))
      .as[String].head()
    assert(got == "2025-08-12T00:00:00.123Z")
  }

  test("T2 cotId prefixes entity id") {
    val got = Seq(1001L).toDF("e")
      .select(TrackPipeline.cotId($"e")).as[String].head()
    assert(got == "inreach-1001")
  }

  test("K1' cotXml renders the golden CoT event document") {
    val df = Seq((7L, "error", 1705314600000L, 123.456))
      .toDF("user_id", "event_type", "ms", "value")
    val got = df.select(TrackPipeline.cotXml($"user_id",
      $"event_type" === "error", timestamp_millis($"ms"),
      course = $"value", lat = $"value",
      lon = $"user_id".cast("double"))).as[String].head()
    val want =
      """<event version="2.0" uid="inreach-7" type="b-a-o-tbl" how="m-g"""" +
      """ time="2024-01-15T10:30:00.000Z" start="2024-01-15T10:30:00.000Z"""" +
      """ stale="2024-01-15T10:40:00.000Z"><point lat="123.46" lon="7.00"""" +
      """ hae="0.0" ce="9999999.0" le="9999999.0"/><detail>""" +
      """<contact callsign="inreach-7"/><track course="123.46"/>""" +
      """</detail></event>"""
    assert(got == want)
  }

  test("F1 retention: null timestamp coerces to epoch 0 and is evicted (quirk §5.2.3)") {
    val df = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))),
      (2L, None) // missing time → `?? 0` → always evicted
    ).toDF("id", "ts")
    val kept = TrackPipeline.retained(df, "ts",
      lit("2024-01-01").cast("timestamp"))
    assert(kept.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("A1 latestPerKey picks newest with deterministic tie-break") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "a"),
      (1L, "2024-01-02 00:00:00", 11L, "b"),
      (1L, "2024-01-02 00:00:00", 12L, "c"), // tie on ts → higher id wins
      (2L, "2024-01-01 00:00:00", 13L, "d")
    ).map { case (k, t, i, v) => (k, java.sql.Timestamp.valueOf(t), i, v) }
      .toDF("key", "ts", "id", "v")
    val got = TrackPipeline.latestPerKey(df, "key", "ts", "id")
      .select($"key", $"latest.v").as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "c", 2L -> "d"))
  }

  test("A2 upsert: newest per key wins across snapshot and fresh batch") {
    def row(k: Long, t: String, i: Long, v: String) =
      (k, java.sql.Timestamp.valueOf(t), i, v)
    val snap = Seq(row(1, "2024-01-01 00:00:00", 1, "old1"),
      row(2, "2024-01-05 00:00:00", 2, "old2")).toDF("key", "ts", "id", "v")
    val fresh = Seq(row(1, "2024-01-03 00:00:00", 3, "new1"),
      row(2, "2024-01-04 00:00:00", 4, "stale2"),
      row(3, "2024-01-06 00:00:00", 5, "new3")).toDF("key", "ts", "id", "v")
    val got = TrackPipeline.upsert(snap, fresh, "key", "ts", "id")
      .select($"key", $"latest.v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new1", 2L -> "old2", 3L -> "new3"))
  }
}
