package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning: the skew-join split. Salting
  * (`q_salted_agg`) is the write-side answer to skew; this pins the
  * read-side one — at execution time AQE observes the skewed shuffle
  * partition and splits it across tasks, no query change. On a
  * 1000-executor cluster this is the difference between one straggler
  * task holding the stage for hours and even task times.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // shrink thresholds so local-scale skew is detectable: a
      // partition is skewed above max(threshold, factor * median)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB")
    val prev = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of the fact rows share one key; wide payload makes the
      // skew visible in bytes, not just rows
      val fact = spark.range(0, 120000)
        .select(when($"id" % 5 =!= 0, 0L).otherwise($"id").as("k"),
          concat(lit("p"), lpad($"id".cast("string"), 96, "x"))
            .as("payload"))
      val dim = spark.range(0, 2000).select($"id".as("k2"),
        ($"id" * 2).as("w"))
      // the aggregate references the payload so it survives column
      // pruning and rides the fact-side shuffle (the skew is in
      // BYTES of the shuffled partition, not row count alone)
      val joined = fact.join(dim, $"k" === $"k2")
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("s"))
      // collect() executes THIS queryExecution (head() clones a
      // limited plan, leaving this one un-executed / non-final)
      val row = joined.collect().head
      // correctness: the 96 000 folded rows plus id=0 all hit dim key
      // 0; surviving identity keys are ids 5..1995 step 5
      val nonZero = (1L until 120000L).count(i => i % 5 == 0 && i < 2000)
      assert(row.getLong(0) == 96001L + nonZero)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$planStr")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
