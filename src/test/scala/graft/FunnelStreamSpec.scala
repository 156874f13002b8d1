package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{FunnelEvent, StreamFunnel}

/** Stream/batch parity for the ordered funnel: replaying the event
  * table through the stateful stage tracker must land every user on
  * the same final stage as the batch HOF fold, across uneven
  * micro-batch splits — and stage advances must arrive monotonically.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def events: Seq[FunnelEvent] =
    Tables(spark, sf("0.001"), "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .as[FunnelEvent].collect().toSeq
      // in-order feed contract at FULL µs precision (getTime is
      // ms-truncated — same fix as AnomalyStreamSpec)
      .sortBy(e => (micros(e.ts), e.event_id))

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("streaming stage advances land on the batch fold's final stages") {
    val batch = graft.queries.AnalyticsQueries
      .userStages(spark, sf("0.001"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val all = events
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.stageAdvances(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append).start()
    val advances = try {
      val (a, rest) = all.splitAt(all.size / 4)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("funnel").as[(Long, Int, Long)].collect().toSeq
    } finally q.stop()

    // advances are strictly monotone per user: 1, 2, 3 with no skips
    advances.groupBy(_._1).foreach { case (uid, rows) =>
      val stages = rows.sortBy(_._3).map(_._2)
      assert(stages == (1 to stages.max).toList,
        s"user $uid advanced non-monotonically: $stages")
    }

    val streamedFinal = advances.groupBy(_._1)
      .map { case (uid, rows) => uid -> rows.map(_._2).max }
    // every batch stage ≥1 must match; batch stage-0 users emit nothing
    assert(batch.nonEmpty, "batch funnel returned no users — vacuous")
    assert(streamedFinal.keySet.subsetOf(batch.keySet),
      s"stream advanced unknown users: " +
        s"${streamedFinal.keySet.diff(batch.keySet)}")
    batch.foreach { case (uid, st) =>
      assert(streamedFinal.getOrElse(uid, 0) == st,
        s"user $uid: stream ${streamedFinal.getOrElse(uid, 0)} != batch $st")
    }
  }

  test("variant-tagged advances reproduce q_funnel_by_variant") {
    val batch = SparkEntry.queries("q_funnel_by_variant")(
        spark, sf("0.001"))
      .collect()
      .map(r => r.getAs[String]("variant") ->
        (r.getAs[Long]("n_signup"), r.getAs[Long]("n_click"),
          r.getAs[Long]("n_purchase"), r.getAs[Double]("cr_click"),
          r.getAs[Double]("cr_purchase"))).toMap
    assert(batch.nonEmpty)

    val all = events
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.variantStageAdvances(input.toDS())
      .writeStream.format("memory").queryName("vfunnel")
      .outputMode(OutputMode.Append).start()
    val advances = try {
      val (a, rest) = all.splitAt(all.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("vfunnel")
        .as[(String, Long, Int, Long)].collect().toSeq
    } finally q.stop()

    // per-variant conversion table from each user's final stage
    val streamed = advances.groupBy(_._2)
      .map { case (uid, rows) => (rows.head._1, uid,
        rows.map(_._3).max) }
      .groupBy(_._1)
      .map { case (v, users) =>
        val n1 = users.count(_._3 >= 1).toLong
        val n2 = users.count(_._3 >= 2).toLong
        val n3 = users.count(_._3 >= 3).toLong
        def r4(x: Double) = BigDecimal(x)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        v -> (n1, n2, n3, r4(n2.toDouble / n1), r4(n3.toDouble / n1))
      }
    assert(streamed == batch,
      s"variant funnel parity broken:\n stream=$streamed\n batch=$batch")
  }
}
