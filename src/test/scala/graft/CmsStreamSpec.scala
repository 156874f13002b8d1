package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.queries.AnalyticsQueries

/** The count-min sketch is a pure additive aggregate, so its
  * streaming form is NOT custom state — it is Spark's own streaming
  * aggregation over the exploded (row, bucket) cells, state bounded
  * by d×w counters. This spec pins that the streaming sketch equals
  * the batch-built sketch cell-for-cell on the same data, across
  * micro-batch splits — the "mergeable sketches stream for free"
  * property the batch scaladoc claims.
  */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streaming CMS cells == batch sketch, additive across batches") {
    val keys = Tables(spark, sf(), "lineitem")
      .select(col("l_partkey")).as[Long].collect().toSeq

    val batchCells = AnalyticsQueries.withDigestHalves(
        keys.toDF("l_partkey"), col("l_partkey"))
      .select(posexplode(AnalyticsQueries.cmsCells)
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).count()
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val input = MemoryStream[Long]
    val cells = AnalyticsQueries.withDigestHalves(
        input.toDS().toDF("l_partkey"), col("l_partkey"))
      .select(posexplode(AnalyticsQueries.cmsCells)
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).count()
    val q = cells.writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Complete).start()
    val streamedCells = try {
      val (a, rest) = keys.splitAt(keys.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("cms").as[(Int, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    } finally q.stop()

    assert(batchCells.nonEmpty, "no sketch cells — parity vacuous")
    assert(streamedCells.size == batchCells.size,
      s"cell counts differ: ${streamedCells.size} vs ${batchCells.size}")
    assert(streamedCells == batchCells, "sketch cells diverge")
    // independent pin the shared-helper parity cannot give (a bug in
    // the shared hash/bucket derivation corrupts both sides
    // identically): CMS point estimates — min over rows of the
    // key's cell counters — can never undercount a true frequency
    val truth = keys.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val probes = truth.keys.take(50).toSeq
    val probeCells = AnalyticsQueries.withDigestHalves(
        probes.toDF("l_partkey"), col("l_partkey"))
      .select(col("l_partkey"),
        posexplode(AnalyticsQueries.cmsCells).as(Seq("j", "bucket")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    probes.foreach { k =>
      val est = probeCells(k)
        .map(c => streamedCells.getOrElse(c, 0L)).min
      assert(est >= truth(k),
        s"CMS undercounts key $k: est=$est true=${truth(k)}")
    }
    assert(streamedCells.size <= 4 * 256,
      "state exceeded the d×w bound")
  }
}
