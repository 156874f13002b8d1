package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StreamOverlap, TypeUserEvent}

/** Stream/batch parity for the audience-overlap Jaccard matrix:
  * replaying the event table through the per-user type-set tracker
  * must reproduce `q_user_overlap_jaccard` cell-for-cell from the
  * LATEST emission per user — and each user must emit at most
  * |their distinct types| rows (growth-only emission, the bound
  * that keeps the append stream retraction-free).
  */
class OverlapStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("latest per-user type sets reproduce q_user_overlap_jaccard") {
    val batch = SparkEntry.queries("q_user_overlap_jaccard")(
        spark, sf("0.001"))
      .collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("n_both"), r.getAs[Double]("jaccard")))
      .toMap
    assert(batch.nonEmpty)

    val feed = Tables(spark, sf("0.001"), "events")
      .select(col("user_id"), col("event_type"))
      .as[TypeUserEvent].collect().toSeq

    val input = MemoryStream[TypeUserEvent]
    val q = StreamOverlap.userTypeSets(input.toDS())
      .writeStream.format("memory").queryName("overlap")
      .outputMode(OutputMode.Append).start()
    val emissions = try {
      val (a, rest) = feed.splitAt(feed.size / 4)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("overlap")
        .as[(Long, Seq[String])].collect().toSeq
    } finally q.stop()

    // growth-only emission bound: ≤ |distinct types| rows per user,
    // strictly growing set sizes
    emissions.zipWithIndex.groupBy(_._1._1).foreach {
      case (uid, rows) =>
        val sizes = rows.sortBy(_._2).map(_._1._2.size)
        assert(sizes == sizes.sorted && sizes.distinct == sizes,
          s"user $uid emitted non-growing sets: $sizes")
    }

    // the latest emission per user IS the batch distinct aggregate
    val finalSets = emissions.zipWithIndex.groupBy(_._1._1)
      .map { case (uid, rows) => uid -> rows.maxBy(_._2)._1._2.toSet }
    val sizes = finalSets.values.toSeq.flatten
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val streamed = (for {
      (_, ts) <- finalSets.toSeq
      a <- ts; b <- ts if a < b
    } yield (a, b)).groupBy(identity)
      .map { case ((a, b), xs) =>
        val (na, nb, both) = (sizes(a), sizes(b), xs.size.toLong)
        val j = BigDecimal(both.toDouble / (na + nb - both))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b) -> (na, nb, both, j)
      }
    assert(streamed == batch,
      s"overlap parity broken:\n stream=$streamed\n batch=$batch")
  }
}
