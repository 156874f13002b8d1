package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Before/after accounting for one compaction run. */
case class CompactionStats(filesBefore: Int, bytesBefore: Long,
    filesAfter: Int, bytesAfter: Long)

/** OPTIMIZE-style small-file compaction: bin-pack a parquet
  * directory's files into `ceil(totalBytes / targetBytes)` outputs.
  *
  * Why it's a first-class operator at 100 TB: streaming sinks and
  * fine-grained partitioned writes accrete small files; every scan
  * then pays per-file open/footer costs, the driver pays listing
  * memory, and the scheduler pays task overhead — a table that
  * should scan in hundreds of tasks degrades into hundreds of
  * thousands. Periodic bin-packing is how every production lakehouse
  * keeps that bounded (Delta/Iceberg `OPTIMIZE`); this is the
  * layout-level core of it over plain parquet directories.
  *
  * Two rewrite modes:
  *  - `clusterBy = None`: `coalesce` — NO shuffle (CompactionSpec
  *    pins zero shuffle records); input files are concatenated into
  *    wider tasks. Use when the existing row order is fine.
  *  - `clusterBy = Some(col)`: `repartitionByRange` + in-partition
  *    sort — one range exchange that (re-)establishes clustering on
  *    the rewrite, composing with Z-order data skipping (ZOrderSpec):
  *    compaction is exactly the moment to restore locality that
  *    incremental appends eroded.
  *
  * Commit protocol here is write-to-sibling + delete + rename — the
  * single-writer maintenance-job shape. A concurrent-reader
  * deployment would wrap the same rewrite in a table format's
  * transactional commit instead; the data movement is identical.
  */
object Compaction {

  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      clusterBy: Option[String] = None): CompactionStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val bytesBefore = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(dir)
    val packed = clusterBy match {
      case Some(c) =>
        df.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case None => df.coalesce(nOut)
    }
    val tmp = new Path(p.toString + "__compact_tmp")
    packed.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    val after = dataFiles()
    CompactionStats(before.size, bytesBefore, after.size,
      after.map(_.getLen).sum)
  }
}
