package graft

import org.apache.spark.sql.functions._

/** Data layout at scale: a date-partitioned write plus evidence that
  * a day filter prunes partitions at planning time (PartitionFilters
  * in the scan) — the layout the 100 TB events table would use.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned layout prunes untouched days at the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part").toString
    Tables(spark, sf("0.001"), "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter should be a partition filter:\n$plan")
    // and it reads only that day's rows
    val expected = Tables(spark, sf("0.001"), "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expected)
    assert(expected > 0)
  }

  test("captured webhook payload files read back through the schema (S1 batch)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-webhook").toString
    import spark.implicits._
    // simulate a capture directory of webhook bodies (JSON lines)
    val bodies = Tables(spark, sf("0.001"), "events").limit(50)
      .select(to_json(struct(
        col("user_id").cast("int").as("entityId"),
        lit("cap").as("name"),
        struct(unix_millis(col("ts")).as("time"),
          col("value").as("direction"),
          struct(col("value").as("x"), col("value").as("y")).as("point"))
          .as("trackPoint"))).as("body"))
    bodies.write.mode("overwrite").text(dir)
    val decoded = spark.read
      .schema(graft.sources.JsonSources.webhookSchema).json(dir)
    assert(decoded.count() == 50)
    assert(decoded.filter(col("entityId").isNotNull).count() == 50)
    assert(decoded.select(max(col("trackPoint.time"))).head().getLong(0) > 0)
  }
}
