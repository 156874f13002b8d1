package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the day-partitioned events layout:
  * the fact scan's PartitionFilters must carry a runtime
  * dynamicpruning expression (directories skipped based on the dim
  * side's day set), and results must be identical with the feature
  * off.
  */
class DppSpec extends SparkSpec {

  test("q_join_dpp prunes fact partitions at runtime") {
    withoutAqe {
      val df = graft.queries.JoinExtQueries
        .defs("q_join_dpp")(spark, sf("0.001"))
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.toString.contains("events_by_day") => s
      }
      assert(scans.nonEmpty, "no partitioned fact scan in the plan")
      assert(scans.exists(_.partitionFilters.exists(
          _.toString.toLowerCase.contains("dynamicpruning"))),
        s"no dynamic pruning on the fact scan:\n${scans.head}")
    }
  }

  test("measured: fact scan reads exactly the dim-side day set") {
    withoutAqe {
      val df = graft.queries.JoinExtQueries
        .defs("q_join_dpp")(spark, sf("0.001"))
      df.collect() // populate scan metrics
      val scan = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.toString.contains("events_by_day") => s
      }.head
      val readPartitions = scan.metrics("numPartitions").value
      val dimDays = Tables(spark, sf("0.001"), "events")
        .filter(col("event_type") === "purchase" && col("user_id") % 50 === 0)
        .select(to_date(col("ts"))).distinct().count()
      val allDays = Tables(spark, sf("0.001"), "events")
        .select(to_date(col("ts"))).distinct().count()
      info(s"partitions read: $readPartitions of $allDays (dim days: $dimDays)")
      assert(readPartitions == dimDays,
        s"DPP should read exactly the dim day set: $readPartitions != $dimDays")
    }
  }

  test("results identical with dynamic pruning disabled") {
    val on = graft.queries.JoinExtQueries
      .defs("q_join_dpp")(spark, sf("0.001")).collect()
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(key, "false")
    try {
      val off = graft.queries.JoinExtQueries
        .defs("q_join_dpp")(spark, sf("0.001")).collect()
      assert(on.sameElements(off))
      assert(on.nonEmpty)
    } finally spark.conf.unset(key)
  }
}
