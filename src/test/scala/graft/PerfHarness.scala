package graft

/** Ad-hoc timing harness (not a correctness spec): time individual
  * queries at a chosen SF without running the whole Bench. Run with
  *   sbt "Test/runMain graft.PerfHarness q_dedup_simhash ..."
  */
object PerfHarness {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSpec.session
    args.foreach { name =>
      // warm nothing: mirror Bench's cold per-query count
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[perf] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
