package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The conf-gated automatic bloom-injection rule
  * ([[graft.plans.AutoBloomJoin]]): off by default, bit-identical
  * results when on, filter lands below the probe-side exchange,
  * measured shuffle reduction, and no injection where it can't pay
  * (broadcastable build, unselective build, small probe).
  */
class AutoBloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withAutoBloom[T](on: Boolean)(body: => T): T = {
    val key = "spark.graft.autoBloom.enabled"
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(key, on.toString)
    // sf0.001 column-pruned scans are only ~2x apart; the default
    // ratio guard (4) is sized for real skew, relax it for the spec
    spark.conf.set("spark.graft.autoBloom.minProbeRatio", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.unset(key)
      spark.conf.unset("spark.graft.autoBloom.minProbeRatio")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  private def urgentJoin() = {
    val orders = Tables(spark, sf(), "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate")
    Tables(spark, sf(), "lineitem")
      .select($"l_orderkey", $"l_quantity")
      .join(orders, $"l_orderkey" === $"o_orderkey")
  }

  test("off by default: no bloom filter in the plan") {
    withoutAqe {
      // relax every OTHER guard (ratio, broadcast) so the enabled
      // flag is the DECIDING conjunct — with session defaults the
      // ratio/broadcast guards block injection anyway and a flipped
      // enabled default could not fail this test
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.graft.autoBloom.minProbeRatio", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = urgentJoin().queryExecution.optimizedPlan.toString
        assert(!plan.contains("bloom_might_contain"))
      } finally {
        spark.conf.unset("spark.graft.autoBloom.minProbeRatio")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      }
    }
  }

  test("on: filter below the probe exchange, results identical, " +
      "shuffle measurably reduced") {
    withoutAqe {
      val plain = urgentJoin()
        .groupBy($"o_orderdate").agg(sum($"l_quantity").as("q"))
        .orderBy($"o_orderdate").collect()
      val plainRows = shuffledRecords {
        withAutoBloom(false)(urgentJoin().count())
      }
      withAutoBloom(true) {
        val df = urgentJoin()
        val exec = df.queryExecution.executedPlan
        val factExchange = exec.collect {
          case e: ShuffleExchangeExec
            if e.toString.contains("l_orderkey") => e
        }
        assert(factExchange.exists(_.child.collect {
          case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
        }.nonEmpty), s"no bloom filter below the fact exchange:\n$exec")
        val got = df.groupBy($"o_orderdate").agg(sum($"l_quantity").as("q"))
          .orderBy($"o_orderdate").collect()
        assert(got.sameElements(plain))
        val bloomRows = shuffledRecords(urgentJoin().count())
        assert(bloomRows < plainRows / 2,
          s"expected <half the shuffle: bloom=$bloomRows plain=$plainRows")
      }
    }
  }

  test("no injection when the build side would broadcast anyway") {
    withoutAqe {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.graft.autoBloom.enabled", "true")
      // relax the ratio guard so the broadcast-threshold conjunct is
      // the one that decides (the session-default ratio of 4 already
      // blocks injection on this ~2x data, which made deleting the
      // broadcast guard undetectable)
      spark.conf.set("spark.graft.autoBloom.minProbeRatio", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
      try {
        val plan = urgentJoin().queryExecution.optimizedPlan.toString
        assert(!plan.contains("bloom_might_contain"))
      } finally {
        spark.conf.unset("spark.graft.autoBloom.enabled")
        spark.conf.unset("spark.graft.autoBloom.minProbeRatio")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }
  }

  test("no injection without a selective build-side filter") {
    withoutAqe {
      withAutoBloom(true) {
        val orders = Tables(spark, sf(), "orders")
          .select($"o_orderkey", $"o_orderdate") // unfiltered
        val plan = Tables(spark, sf(), "lineitem")
          .select($"l_orderkey", $"l_quantity")
          .join(orders, $"l_orderkey" === $"o_orderkey")
          .queryExecution.optimizedPlan.toString
        assert(!plan.contains("bloom_might_contain"))
      }
    }
  }

  test("left semi: the left (probe) side gets the filter") {
    withoutAqe {
      withAutoBloom(true) {
        val urgent = Tables(spark, sf(), "orders")
          .filter($"o_orderpriority" === "1-URGENT")
          .select($"o_orderkey")
        val df = Tables(spark, sf(), "lineitem")
          .select($"l_orderkey", $"l_quantity")
          .join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
        // the filter must sit below the PROBE (lineitem) exchange —
        // contains() over the whole plan also passed a wrong-side
        // injection, which a semi join cannot expose via results
        // (blooms have no false negatives)
        val exec = df.queryExecution.executedPlan
        val factExchange = exec.collect {
          case e: ShuffleExchangeExec
            if e.toString.contains("l_orderkey") => e
        }
        assert(factExchange.exists(_.child.collect {
          case f: FilterExec
            if f.condition.toString.contains("bloom_might_contain") => f
        }.nonEmpty), s"no bloom filter below the probe exchange:\n$exec")
        val want = withAutoBloom(false) {
          Tables(spark, sf(), "lineitem")
            .select($"l_orderkey", $"l_quantity")
            .join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
            .count()
        }
        assert(df.count() === want)
      }
    }
  }
}
