package graft

/** Diagnostic main (not a spec): per-query plan audit — exchange
  * count and anti-pattern flags (cartesian products, non-broadcast
  * dim joins). Run with
  *   sbt "Test/runMain graft.PlanAudit"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"${"query"}%-26s ex  bhj smj cart notes")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        val notes = new StringBuilder
        if (p.contains("CartesianProduct")) notes ++= " CARTESIAN!"
        if (c("Exchange ") > 4) notes ++= " many-exchanges"
        println(f"$name%-26s ${c("Exchange ")}%2d  ${c("BroadcastHashJoin")}%2d  ${c("SortMergeJoin")}%2d  ${c("CartesianProduct")}%2d $notes")
      } catch {
        case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
