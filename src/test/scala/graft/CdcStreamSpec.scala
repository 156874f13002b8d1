package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{ChangeEvent, StreamCdc}

/** Stream/batch parity for CDC apply-changes: replaying the change
  * log through the stateful collapser — in a SHUFFLED order, since
  * last-(ts,event_id)-wins is order-independent — must land every
  * key on the batch q_cdc_apply snapshot, with deleted keys' final
  * emission carrying op="D".
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streaming snapshot == batch q_cdc_apply, shuffled arrival order") {
    val batch = SparkEntry.queries("q_cdc_apply")(spark, sf())
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_op"), r.getAs[Double]("last_value"),
          r.getAs[Long]("last_ts_ms"), r.getAs[Long]("n_changes")))
      .toMap

    val all = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        col("value"))
      .as[ChangeEvent].collect().toSeq
      // deterministic NON-chronological order: the collapser must not care
      .sortBy(e => (e.event_id * 2654435761L) % 1000003)

    val input = MemoryStream[ChangeEvent]
    val q = StreamCdc.applyChanges(input.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode(OutputMode.Append).start()
    val finalRows = try {
      val (a, rest) = all.splitAt(all.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("cdc").as[(Long, String, Double, Long, Long)]
        .collect().zipWithIndex
        .groupBy(_._1._1)
        .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    } finally q.stop()

    // live keys match the batch snapshot (value rounded like batch)
    batch.foreach { case (uid, (op, v, ms, n)) =>
      val (_, sOp, sV, sMs, sN) = finalRows(uid)
      val sVr = BigDecimal.decimal(sV)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sOp == op && sVr == v && sMs == ms && sN == n,
        s"key $uid: stream ($sOp,$sVr,$sMs,$sN) != batch ($op,$v,$ms,$n)")
    }
    // every key absent from the batch snapshot ended deleted — AND
    // every deleted key must actually appear in the stream's final
    // emissions (iterating only finalRows let a stream that swallows
    // deleted keys pass, since q_cdc_apply filters them out of batch)
    val deleted = all.groupBy(_.user_id).collect {
      case (uid, es) if es.maxBy(e => (e.ts.getTime, e.event_id)).op
        == "D" => uid
    }.toSet
    assert(deleted.nonEmpty,
      "fixture has no deleted keys — the delete leg is vacuous")
    deleted.foreach { uid =>
      assert(finalRows.contains(uid) && finalRows(uid)._2 == "D",
        s"deleted key $uid: final stream emission is " +
          s"${finalRows.get(uid)}, expected op=D")
    }
    finalRows.foreach { case (uid, row) =>
      if (!batch.contains(uid))
        assert(row._2 == "D", s"key $uid missing from batch but not deleted")
    }
  }
}
