package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{StreamTopK, TKEvent}

/** Space-Saving top-k: exact-parity with the batch aggregate when
  * capacity covers the distinct-item domain, and the classic
  * over/under-count guarantees when it doesn't.
  */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("capacity ≥ distinct items ⇒ stream top-k == batch exact top-k") {
    val ev = Tables(spark, sf(), "events")
      .select(col("event_id"), col("event_type"),
        col("user_id").cast("string").as("item"))
    val batch = ev.groupBy(col("event_type"), col("item"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val distinctItems = batch.keySet.groupBy(_._1).map {
      case (et, ks) => et -> ks.size
    }

    val all = ev.as[TKEvent].collect().toSeq.sortBy(_.event_id)
    val input = MemoryStream[TKEvent]
    // foreachBatch records the batch id with every row: "the final
    // sketch state" is then literally the rows of each key's last
    // EMITTING batch — no last-k sink-index arithmetic, which mixed
    // rows from two batches whenever a batch emitted fewer than k
    // rows (ADVICE r8)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (String, String, Long, Long, Int))]
    // capacity 512 > any key's distinct users (≤150 at sf0.001)
    val q = StreamTopK.topK(input.toDS(), capacity = 512, k = 5)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[graft.streaming.TopKEstimate],
         batchId: Long) =>
          val rows = ds.collect()
          emitted.synchronized {
            rows.foreach(r => emitted +=
              batchId -> ((r.event_type, r.item, r.est, r.err, r.rank)))
          }
      }
      .start()
    val streamed = try {
      val (a, rest) = all.splitAt(all.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      emitted.synchronized {
        emitted.toSeq.groupBy(_._2._1).map { case (et, rows) =>
          val lastBatch = rows.map(_._1).max // key's last emitting batch
          et -> rows.collect { case (b, r) if b == lastBatch => r }
        }
      }
    } finally q.stop()

    // non-vacuity + coverage: a stream that stops emitting (overall
    // or for one event_type) must fail here, not skip the loop below
    assert(streamed.nonEmpty, "stream emitted nothing")
    assert(streamed.keySet == distinctItems.keySet,
      s"stream keys ${streamed.keySet} != batch ${distinctItems.keySet}")
    streamed.foreach { case (et, rows) =>
      assert(distinctItems(et) <= 512, "fixture outgrew capacity")
      rows.foreach { case (_, item, est, err, _) =>
        assert(err == 0L, s"exact regime must carry zero error: $et/$item")
        assert(est == batch((et, item)),
          s"$et/$item: stream $est != batch ${batch((et, item))}")
      }
      // the stream's top-5 IS the batch top-5 (count desc, item asc)
      val batchTop = batch.toSeq.collect {
        case ((e, i), n) if e == et => (i, n)
      }.sortBy { case (i, n) => (-n, i) }.take(5).map(_._1)
      val streamTop = rows.sortBy(_._5).map(_._2)
      assert(streamTop.sameElements(batchTop),
        s"$et: stream ${streamTop.toSeq} != batch ${batchTop.toSeq}")
    }
  }

  test("bounded capacity ⇒ Space-Saving guarantees on a skewed feed") {
    val feed = (Seq.fill(500)("A") ++ Seq.fill(300)("B") ++
      Seq.fill(200)("C") ++ (1 to 50).map(i => s"rare$i"))
      .zipWithIndex.map { case (item, i) =>
        TKEvent(i.toLong, "k", item)
      }
    val truth = feed.groupBy(_.item).map { case (i, es) =>
      i -> es.size.toLong
    }
    val input = MemoryStream[TKEvent]
    // batch-id-tagged sink (see test 1): the sketch's end state is
    // the rows of the last EMITTING batch id — taking the top-8 sink
    // indexes instead assumed the final batch emitted exactly k rows
    // and mixed two batches' rows when it didn't (ADVICE r8)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (String, String, Long, Long, Int))]
    val q = StreamTopK.topK(input.toDS(), capacity = 8, k = 8)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[graft.streaming.TopKEstimate],
         batchId: Long) =>
          val rs = ds.collect()
          emitted.synchronized {
            rs.foreach(r => emitted +=
              batchId -> ((r.event_type, r.item, r.est, r.err, r.rank)))
          }
      }
      .start()
    val rows = try {
      val (a, b) = feed.splitAt(feed.size / 2)
      Seq(a, b).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      emitted.synchronized {
        val lastBatch = emitted.map(_._1).max
        emitted.collect { case (bid, r) if bid == lastBatch => r }.toSeq
      }
    } finally q.stop()
    assert(rows.size == 8, s"final emission should carry k=8 rows: $rows")

    val byItem = rows.map(r => r._2 -> r).toMap
    // every item with true count > n/capacity must be retained
    val n = feed.size
    truth.filter(_._2 > n / 8).keys.foreach { hot =>
      assert(byItem.contains(hot), s"guaranteed heavy hitter $hot evicted")
    }
    // Space-Saving bounds: true ≤ est ≤ true + err
    byItem.foreach { case (item, (_, _, est, err, _)) =>
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item undercounted: est=$est true=$t")
      assert(est - err <= t,
        s"$item: est-err=${est - err} exceeds true=$t")
    }
  }

  test("checkpointed restart recovers the Space-Saving sketch (file source)") {
    // K2 depth beyond the windowed-agg restart gate (StreamingSpec):
    // CUSTOM flatMapGroupsWithState state — the counters map itself —
    // must come back from the checkpoint. Durable JSON source +
    // foreachBatch (the production recoverable sink).
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-topk-src").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-topk-ckpt").toString
    def writeFile(name: String, events: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name),
        events.map { case (id, item) =>
          s"""{"event_id":$id,"event_type":"k","item":"$item"}"""
        }.mkString("\n").getBytes("UTF-8"))
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (String, Long, Long))]
    def start() = {
      val events = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[TKEvent]].schema)
        .json(srcDir).as[TKEvent]
      StreamTopK.topK(events, capacity = 8, k = 8)
        .writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[graft.streaming.TopKEstimate],
           batchId: Long) =>
            val rs = ds.collect()
            emitted.synchronized {
              rs.foreach(r => emitted +=
                batchId -> ((r.item, r.est, r.err)))
            }
        }
        .option("checkpointLocation", ckpt).start()
    }
    writeFile("a.json", Seq(1L -> "A", 2L -> "A", 3L -> "B"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterRun1 = emitted.synchronized {
      emitted.map { case (_, (i, est, _)) => i -> est }.toMap
    }
    assert(afterRun1.get("A").contains(2L) &&
      afterRun1.get("B").contains(1L),
      s"run 1 should count A=2 B=1: $afterRun1")
    // new arrivals while the query is down; delete the processed
    // file so a checkpoint-IGNORING restart would see only b.json
    // and emit A=1 — A=3 below can only come from recovered counters
    writeFile("b.json", Seq(4L -> "A", 5L -> "C"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(srcDir, "a.json"))
    emitted.synchronized(emitted.clear())
    val q2 = start()
    try {
      q2.processAllAvailable()
      val lastBatch = emitted.synchronized {
        val lb = emitted.map(_._1).max
        emitted.collect { case (b, r) if b == lb => r }
      }
      val est = lastBatch.map { case (i, e, _) => i -> e }.toMap
      assert(est.get("A").contains(3L),
        s"recovered sketch must continue A at 3 (2 + 1): $est")
      assert(est.get("B").contains(1L) && est.get("C").contains(1L),
        s"recovered B + new C expected: $est")
    } finally q2.stop()
  }
}
