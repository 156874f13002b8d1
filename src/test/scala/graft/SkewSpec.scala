package graft

import org.apache.spark.sql.functions._

/** Skew handling, both levers from the build brief: explicit salting
  * (Skew.saltedAgg — oracle-checked via q_salted_agg) and AQE's
  * runtime skew-join split, demonstrated here on a deliberately
  * skewed sort-merge join. At 100 TB a single hot key otherwise pins
  * one task with the whole key's data.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime") {
    val confs = Seq(
      // force SMJ (no broadcast escape hatch) and make the skew
      // detector fire at toy sizes
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of the left side lands on key 0 (deterministic). The
      // right side must be a plain projection: OptimizeSkewedJoin
      // only matches SMJ(Sort(Shuffle), Sort(Shuffle)) — an aggregate
      // between shuffle and sort (e.g. distinct) defeats it.
      // repartition(16) first: the skew split regroups MAP outputs,
      // so a skewed reduce partition fed by a single map task (one
      // small parquet file here) would be unsplittable
      val left = Tables(spark, sf("0.1"), "events").repartition(16)
        .select(when(col("event_id") % 10 < 9, 0L)
          .otherwise(col("event_id")).as("k"), col("value"))
      val right = Tables(spark, sf("0.1"), "events").repartition(16)
        .select(col("event_id").as("k"))
      val joined = left.join(right, "k")
      // run THIS query execution's physical plan (count()/foreach()
      // build separate executions and leave this one un-run, so its
      // AdaptiveSparkPlan would never reach the final plan)
      val qe = joined.queryExecution
      qe.executedPlan.execute().foreachPartition(_ => ())
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(400))
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin: identical rows to the plain join, hot key spread over salts") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // planted skew: 90% of fact rows hit key 7
      val fact = spark.range(20000)
        .select(col("id"),
          when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100)
            .as("k"),
          (col("id") % 97).as("v"))
      val dim = spark.range(100)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val plain = fact.join(dim, "k")
      val salted = graft.operators.Skew.saltedJoin(fact, dim, "k",
        col("id"), salts = 8)
      // row-identical result
      assert(salted.select("k", "id", "v", "name")
        .exceptAll(plain.select("k", "id", "v", "name")).isEmpty &&
        plain.select("k", "id", "v", "name")
          .exceptAll(salted.select("k", "id", "v", "name")).isEmpty,
        "salted join changed the result")
      // measured spread: the hot key's rows land in ≥4 of the 8 salt
      // buckets' partitions, so no task sees more than ~half of them
      def maxPart(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val mPlain = maxPart(plain)
      val mSalted = maxPart(salted)
      assert(mSalted <= mPlain / 2,
        s"salting did not spread the hot key: plain max-task=$mPlain " +
          s"salted max-task=$mSalted")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
