package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed by the join
  * key join WITHOUT a shuffle — the repeated-fact-join strategy at
  * 100 TB (pay the partitioning once at write time, every subsequent
  * join is exchange-free).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans no hash-partitioning exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables(spark, sf("0.001"), "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    Tables(spark, sf("0.001"), "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("b_customer")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withoutAqe {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("Join"), plan)
      // the downstream groupBy(c_mktsegment) legitimately shuffles;
      // the JOIN KEYS must not — bucketing satisfies the join's
      // distribution requirement directly
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join should not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // and it still computes the right thing
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n == Tables(spark, sf("0.001"), "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
