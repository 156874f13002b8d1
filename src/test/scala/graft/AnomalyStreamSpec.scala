package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{MetricPoint, StreamAnomaly}

/** Stream/batch parity for rolling z-score anomaly detection: the
  * flatMapGroupsWithState ring-buffer scorer must produce
  * BIT-IDENTICAL z-scores to the batch window plan
  * ([[graft.operators.Anomaly.rollingZ]]) on the same data, across
  * uneven micro-batch splits — the decimal-quantized moments are
  * what make that equality exact rather than ulp-close.
  */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def points: Seq[MetricPoint] =
    Tables(spark, sf("0.001"), "events")
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .as[MetricPoint].collect().toSeq
      .sortBy(p => (p.ts.getTime, p.event_id)) // in-order feed contract

  test("streaming z-scores == batch rollingZ, bit-exact, across splits") {
    val batch = graft.operators.Anomaly.rollingZ(
        Tables(spark, sf("0.001"), "events"), col("event_type"),
        Seq(col("ts"), col("event_id")), col("value"))
      .select(col("event_id"), col("z")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    val all = points
    val input = MemoryStream[MetricPoint]
    val q = StreamAnomaly.zScores(input.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      val (a, rest) = all.splitAt(all.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("anom").as[(Long, String, Option[Double], Boolean)]
        .collect().map(t => t._1 -> t._3).toMap
    } finally q.stop()

    assert(streamed.size == batch.size,
      s"row counts differ: stream ${streamed.size} vs batch ${batch.size}")
    val diffs = batch.collect {
      case (id, z) if streamed(id) != z => (id, z, streamed(id))
    }
    assert(diffs.isEmpty,
      s"${diffs.size} z-scores differ, e.g. ${diffs.take(3)}")
  }
}
