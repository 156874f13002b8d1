package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{ClosedSession, SessionEvent, StreamSessionize}

/** Stream/batch parity for gap sessionization: replaying the event
  * table must close exactly the batch window's sessions — every
  * session except each user's final (still-open) one — with
  * identical ordinals, sizes, durations, and type counts, across
  * uneven micro-batch splits.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("streamed closed sessions equal batch sessions minus each user's open one") {
    val all = Tables(spark, sf("0.001"), "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .as[SessionEvent].collect().toSeq
      .sortBy(e => (micros(e.ts), e.event_id)) // in-order feed contract

    val input = MemoryStream[SessionEvent]
    val q = StreamSessionize.closedSessions(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      val (a, rest) = all.splitAt(all.size / 4)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("sessions").as[ClosedSession].collect().toSeq
    } finally q.stop()

    val batch = SparkEntry.queries("q_sessionize")(spark, sf("0.001"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms"),
          r.getAs[Long]("n_types")))
      .toMap
    // each user's final session is still open on the stream
    val lastSeq = batch.keys.groupBy(_._1)
      .map { case (u, ks) => u -> ks.map(_._2).max }
    val expected = batch.filter { case ((u, s), _) => s < lastSeq(u) }
    assert(expected.nonEmpty,
      "no closed sessions in the fixture — parity below is vacuous")

    val got = streamed
      .map(s => (s.user_id, s.session_seq) ->
        (s.n_events, s.duration_ms, s.n_types)).toMap
    assert(got.size == streamed.size, "duplicate closed sessions")
    assert(got.keySet == expected.keySet,
      s"session sets differ: missing=${expected.keySet -- got.keySet} " +
        s"extra=${got.keySet -- expected.keySet}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"session $k: stream ${got(k)} != batch $v")
    }
  }
}
