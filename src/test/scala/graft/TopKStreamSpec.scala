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
    // capacity 512 > any key's distinct users (≤150 at sf0.001)
    val q = StreamTopK.topK(input.toDS(), capacity = 512, k = 5)
      .writeStream.format("memory").queryName("tksink")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      val (a, rest) = all.splitAt(all.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table("tksink")
        .as[(String, String, Long, Long, Int)].collect()
        .zipWithIndex.groupBy(_._1._1) // last emission per key wins
        .map { case (et, rows) =>
          val lastBatchMax = rows.map(_._2).max
          et -> rows.filter(_._2 > lastBatchMax - 5).map(_._1)
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
    val q = StreamTopK.topK(input.toDS(), capacity = 8, k = 8)
      .writeStream.format("memory").queryName("tksink2")
      .outputMode(OutputMode.Append).start()
    val rows = try {
      val (a, b) = feed.splitAt(feed.size / 2)
      Seq(a, b).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      // the FINAL batch's emission is the sketch's end state: the
      // k=8 rows with the highest sink indexes. Taking each item's
      // last emission across the WHOLE run would count an item
      // evicted after batch 1 as retained — the retention guarantee
      // is about the final sketch, not "emitted at least once".
      val all = spark.table("tksink2")
        .as[(String, String, Long, Long, Int)].collect().zipWithIndex
      val cut = all.map(_._2).max - 8
      all.filter(_._2 > cut).map(_._1).toSeq
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
}
