package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.BloomJoin

/** Bloom-filter join pruning: exact results at any false-positive
  * rate, no false negatives, and the scale claim itself — the bloom
  * filter drops fact rows BEFORE the join exchange.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinPruned is row-identical to a plain semi join even " +
      "when the bloom is saturated") {
    // words = 1 → 63 slots for 40 keys: heavy false-positive rate by
    // construction; the exact verify must erase every one of them.
    val fact = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "payload")
    val dims = (1L to 120L by 3).toDF("d")
    val got = BloomJoin.semiJoinPruned(fact, "k", dims, "d",
        words = 1, hashes = 2)
      .select($"k").as[Long].collect().sorted
    val want = fact.join(dims, $"k" === $"d", "left_semi")
      .select($"k").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("bloomPass has no false negatives: every true match survives") {
    val fact = (1L to 500L).toDF("k")
    val dims = (7L to 490L by 7).toDF("d")
    val pass = BloomJoin.bloomPass(fact, "k", dims, "d",
        words = 4, hashes = 3)
      .select($"k").as[Long].collect().toSet
    val truth = (7L to 490L by 7).toSet
    assert(truth.subsetOf(pass))
  }

  test("streaming ingest filter passes exactly the batch bloom's rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dims = (1L to 120L by 3).toDF("d")
    val bits = BloomJoin.bloomBitsLocal(dims, "d", words = 4, hashes = 3)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = input.toDF().toDF("k")
      .filter(BloomJoin.mightContainLocal(col("k"), bits, 4, 3))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    try {
      input.addData(1L to 200L)
      q.processAllAvailable()
      val streamed = spark.table("bloom_stream")
        .select($"k").as[Long].collect().sorted
      val batch = BloomJoin.bloomPass(
          (1L to 200L).toDF("k"), "k", dims, "d", words = 4, hashes = 3)
        .select($"k").as[Long].collect().sorted
      assert(streamed.sameElements(batch)) // FP set included, bit-equal
      assert((1L to 120L by 3).forall(streamed.contains(_))) // no FNs
    } finally q.stop()
  }

  test("bloom filter prunes the fact side below the join exchange " +
      "(measured shuffle rows + plan shape)") {
    withoutAqe {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val urgent = Tables(spark, sf(), "orders")
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey")
        val fact = Tables(spark, sf(), "lineitem")
          .select($"l_orderkey", $"l_quantity")

        val pruned = BloomJoin.semiJoinPruned(
          fact, "l_orderkey", urgent, "o_orderkey")
        val plain = fact.join(
          urgent, $"l_orderkey" === $"o_orderkey", "left_semi")

        // Plan shape: the shuffle feeding the semi join from the fact
        // side must carry the bloom-membership filter (the native
        // bloom_might_contain test) BELOW it — i.e. rows are dropped
        // before the exchange.
        val exchanges = pruned.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        val factExchange = exchanges.filter(_.toString.contains("l_orderkey"))
        assert(factExchange.exists(_.child.collect {
          case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
        }.nonEmpty), "bloom filter not below the fact-side exchange")

        // Measured: the bloom run shuffles materially fewer records
        // than the plain co-shuffled semi join (sf0.001: ~1/5 of
        // orderkeys are urgent; bloom FPs are rare at these counts).
        val prunedRows = shuffledRecords { pruned.count() }
        val plainRows = shuffledRecords { plain.count() }
        assert(prunedRows < plainRows / 2,
          s"expected <half the shuffle: pruned=$prunedRows plain=$plainRows")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
