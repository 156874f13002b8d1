package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{RowcountEvent, StreamRowcount}

/** Stream/batch parity for the ingest row-count monitor: after the
  * stream has absorbed every event — shuffled, uneven micro-batches
  * — its final per-key summary must agree with the batch
  * `q_dq_rowcount_anomaly` rows exactly (same trailing-7 window,
  * same integer-exact moments, same flags).
  */
class RowcountStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("final streaming summary == batch q_dq_rowcount_anomaly") {
    val batchRows = SparkEntry.queries("q_dq_rowcount_anomaly")(
      spark, sf()).collect()
    assert(batchRows.nonEmpty)
    val batch = batchRows.groupBy(_.getAs[String]("event_type"))
      .map { case (et, rs) =>
        val last = rs.maxBy(_.getAs[String]("day"))
        et -> (rs.length.toLong,
          rs.count(_.getAs[Boolean]("anomaly")).toLong,
          last.getAs[String]("day"), last.getAs[Double]("z_score"))
      }

    val feed = Tables(spark, sf(), "events")
      .select(col("event_type"),
        to_date(col("ts")).cast("string").as("day"))
      .as[RowcountEvent]
      .collect().toSeq.reverse

    val input = MemoryStream[RowcountEvent]
    val q = StreamRowcount.monitor(input.toDS())
      .writeStream.format("memory").queryName("rcsink")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      val (a, rest) = feed.splitAt(feed.size / 4)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("rcsink")
        .as[(String, Long, Long, Long, String, Double)]
        .collect().zipWithIndex.groupBy(_._1._1)
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    } finally q.stop()

    assert(batch.keySet.subsetOf(streamed.keySet))
    batch.foreach { case (et, (nScored, nAnom, lastDay, lastZ)) =>
      val (_, _, sScored, sAnom, sDay, sZ) = streamed(et)
      assert(sScored == nScored,
        s"$et: scored $sScored != batch $nScored")
      assert(sAnom == nAnom, s"$et: anomalies $sAnom != batch $nAnom")
      assert(sDay == lastDay, s"$et: last day $sDay != $lastDay")
      assert(sZ == lastZ, s"$et: last z $sZ != batch $lastZ")
    }
  }

  test("score matches a hand-checked series") {
    val counts = Map(
      "2024-01-01" -> 10L, "2024-01-02" -> 10L, "2024-01-03" -> 10L,
      "2024-01-04" -> 10L, "2024-01-05" -> 100L)
    val est = StreamRowcount.score("t", counts)
    // days 4 and 5 have >=3 prior days
    assert(est.n_days == 5 && est.n_scored == 2)
    // day 5: window {10,10,10,10}, mean 10, var 0 -> clamp 1 ->
    // z = 90
    assert(est.last_day == "2024-01-05")
    assert(est.last_z == 90.0)
    assert(est.n_anomalies == 1)
  }
}
