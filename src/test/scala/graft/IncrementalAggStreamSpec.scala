package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Third-execution-mode parity for the mergeable-partial contract
  * behind q_agg_incremental: a Structured Streaming aggregate keeps
  * exactly the same state (count + DECIMAL sum per group) that the
  * batch query stores as its "materialized view" partials, and
  * merges micro-batches the same way the query merges
  * snapshot+delta. Feeding the same events through uneven
  * micro-batches must land on the identical rollup — decimal
  * quantization is what makes the split points irrelevant.
  */
class IncrementalAggStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streaming aggregate snapshot == batch rollup across splits") {
    val rows = Tables(spark, sf(), "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().toSeq

    // the batch side is q_agg_incremental ITSELF — the query whose
    // stored-partial/delta merge this spec claims to gate. (An
    // earlier version recomputed the rollup inline with the same
    // expressions as the stream side, so a regression in the query's
    // snapshot+delta merge could never fail the parity.)
    val batch = SparkEntry.queries("q_agg_incremental")(spark, sf())
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toMap
    assert(batch.nonEmpty, "q_agg_incremental returned no groups")

    val input = MemoryStream[(String, Double)]
    val latest = scala.collection.concurrent.TrieMap
      .empty[String, (Long, Double)]
    val q = input.toDF().toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("sum_value"))
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach { r =>
          // the query's output surface: DECIMAL state, round(double)
          latest(r.getString(0)) = (r.getLong(1),
            BigDecimal(r.getDecimal(2)).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        ()
      }
      .start()
    try {
      val (a, rest) = rows.splitAt(rows.size / 4)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    assert(latest.toMap == batch,
      s"streaming state diverged from q_agg_incremental:\n" +
        s"stream ${latest.toMap}\nbatch  $batch")
  }
}
