package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Contract: the LAST stdout line is one JSON object
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},...}`.
  * Because the driver captures only a stdout TAIL (historically
  * truncating the per-query map to ~65 of 82 entries), the complete
  * artifact is ALSO written to a file — `SPARK_GRAFT_BENCH_OUT`, by
  * default `BENCH_full.json` in the working directory — so
  * round-over-round regression diffs cover every query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classloading warmup on the smallest SF so the first timed
    // queries don't absorb JVM startup (3-4 s skew otherwise).
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // Three passes, report min per query: steady-state timing. A
    // single pass swings ±40% on this box (GC phase, page-cache
    // state, JIT tiers) — larger than any per-query difference worth
    // measuring; min-of-3 also rides out one-off GC pauses that
    // min-of-2 still caught.
    val runs = 3
    def timeAll(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val passes = Seq.fill(runs)(timeAll())
    val results = passes.head.keys.map { name =>
      name -> passes.map(_(name)).min
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"n_queries":${results.size}}"""
    // full artifact to file first (never truncated), then the
    // contract line on stdout
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    println(json)
    spark.stop()
  }
}
