package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._
import graft.sources.Compaction

/** Small-file bin-packing (graft.sources.Compaction): file-count
  * math, zero-shuffle coalesce path, data identity, and the
  * clusterBy rewrite preserving Z-order data skipping.
  */
class CompactionSpec extends SparkSpec {

  private def fileCount(dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  private def dirBytes(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
  }

  /** Order-independent checksum over EVERY column (a product of two
    * id columns was blind to corruption in ts/type/value/props —
    * a rewrite projecting them away passed the identity gate).
    */
  private def checksum(dir: String): (Long, Long) = {
    val df = spark.read.parquet(dir)
    val r = df
      .agg(count(lit(1)),
        sum(hash(df.columns.map(col): _*).cast("long")))
      .head
    (r.getLong(0), r.getLong(1))
  }

  test("bin-packs to ceil(bytes/target) files with identical data, no shuffle") {
    val dir = "target/fixtures/compact/plain"
    Tables(spark, sf("0.01"), "events")
      .repartition(64)
      .write.mode("overwrite").parquet(dir)
    assert(fileCount(dir) == 64)
    val beforeSum = checksum(dir)

    var stats: graft.sources.CompactionStats = null
    val target = (dirBytes(dir) + 3) / 4 // quarter of current bytes -> 4 files
    val shuffled = shuffledRecords {
      stats = Compaction.compact(spark, dir, targetBytes = target)
    }
    info(s"compacted ${stats.filesBefore} files (${stats.bytesBefore} B) -> " +
      s"${stats.filesAfter} files (${stats.bytesAfter} B), " +
      s"shuffle records: $shuffled")
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter == 4,
      s"expected ceil-packed 4 files, got ${stats.filesAfter}")
    assert(fileCount(dir) == 4)
    assert(shuffled == 0L, s"coalesce path must not shuffle: $shuffled")
    assert(checksum(dir) == beforeSum, "compaction changed the data")
  }

  test("clusterBy rewrite restores Z-order skipping on the packed layout") {
    val dir = "target/fixtures/compact/zorder"
    // simulate incremental-append erosion: morton-keyed rows written
    // in ARRIVAL (event_id) order across many small files
    Tables(spark, sf("0.01"), "events")
      .withColumn("lat",
        lit(30.0) + (col("event_id") * 37 % 3000).cast("double") / 100.0)
      .withColumn("lon", lit(-120.0) +
        ((col("event_id") * 73 + col("user_id") * 131) % 6000)
          .cast("double") / 100.0)
      .withColumn("morton", mortonKey(col("lat"), col("lon")))
      .repartition(48, col("event_id"))
      .write.mode("overwrite").parquet(dir)

    def boxScanRows(): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("lat") >= 40.0 && col("lat") <= 42.0 &&
          col("lon") >= -100.0 && col("lon") <= -95.0)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head.metrics("numOutputRows").value
    }
    val total = spark.read.parquet(dir).count()
    val eroded = boxScanRows()
    assert(eroded == total,
      s"arrival-ordered layout should scan everything: $eroded != $total")

    val beforeZ = checksum(dir)
    val stats = Compaction.compact(spark, dir,
      targetBytes = (dirBytes(dir) + 15) / 16, // pack 48 -> 16 clustered files
      clusterBy = Some("morton"))
    val packed = boxScanRows()
    info(s"box-probe scan rows: eroded=$eroded packed=$packed " +
      s"(${stats.filesBefore} -> ${stats.filesAfter} files)")
    assert(stats.filesAfter < stats.filesBefore)
    // range repartition picks boundaries by reservoir sampling, so
    // the packed row-group split drifts a little run to run (observed
    // 2.4k–2.6k rows on this probe — right at 4×); gate the claim at
    // 3× so the test pins "skipping restored", not a sampling seed
    assert(packed * 3 <= eroded,
      s"clusterBy compaction should restore >=3x skipping: $packed vs $eroded")
    // full-column identity, not just the row count — a clusterBy
    // rewrite that drops one row and duplicates another (or mangles
    // a column) must fail here
    assert(checksum(dir) == beforeZ,
      "clusterBy compaction changed the data")
  }
}
