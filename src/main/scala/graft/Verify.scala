package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional 3rd arg: comma-separated name filter (local iteration;
    // the driver always runs the full set). Since r12 the filter's
    // ORDER is honored: SparkEntry.queries is a hash map, and a
    // batched scale leg that wants its solo re-measures first (before
    // the JVM has run anything heavier than the pre-touch) was
    // getting hash order instead. Deduped order-preservingly (ADVICE
    // r12): a name pasted twice would run the query twice into the
    // same output directory mid-leg.
    val only: Option[Seq[String]] =
      rest.headOption.map(_.split(',').toSeq.distinct)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Read pandas-written naive parquet timestamps as TimestampType
      // (session-UTC), not TIMESTAMP_NTZ — keeps epoch/ms functions
      // applicable and matches DuckDB's naive-timestamp semantics.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Timestamp dumps stay on the INT96 default deliberately:
      // pyarrow reads INT96 as NAIVE ns, matching DuckDB's naive
      // micros after value canonicalization (driver-verified).
      // TIMESTAMP_MICROS would be physically closer but is written
      // isAdjustedToUTC=true, which reads back tz-AWARE and fails a
      // value compare against DuckDB's naive timestamps — a worse
      // divergence than the ns/us width difference.
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Written BEFORE the query loop (r12): it depends only on
    // SparkEntry.oracleSql, and a pipelined oracle lane polling this
    // outDir for _SUCCESS dumps needs the SQL long before a batched
    // scale leg finishes its last query.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    only.fold(SparkEntry.queries.toSeq)(names =>
        names.flatMap(n => SparkEntry.queries.get(n).map(n -> _)))
      .foreach { case (name, fn) =>
      // NonFatal only (an OOM must abort, not cascade per-query
      // failures); the stderr line is single-line and null-safe so a
      // multi-line AnalysisException plan dump can't corrupt the
      // driver's line-oriented failure parsing
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Per-query wall on stderr for scale soaks that batch many
        // queries in one JVM (the decade tables read these). The tag
        // differs from the driver's `[verify] ... failed` failure
        // grammar, so line-oriented failure parsing is unaffected.
        System.err.println(f"[verify-time] $name ${
          (System.nanoTime() - t0) / 1e9}%.1f")
      }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: " +
          s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("")
            .replaceAll("\\s+", " ").take(300))
      }
      // Release per query like Bench does: cached plans pin their
      // lineage, and the ContextCleaner only deletes shuffle files
      // once the dependency objects are GC'd — at sf100 the
      // accumulated spill of a 32-query run crossed 26GB before the
      // heavy tail (observed live) and would exhaust the disk. The
      // explicit GC makes the cleanup prompt instead of
      // heap-pressure-dependent.
      graft.CachedPlans.release()
      System.gc()
    }
    graft.CachedPlans.release()
    spark.stop()
  }
}
