package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, to_date}

/** Day-partitioned copy of the events table (written once per JVM
  * and scale factor under `target/fixtures/`): the 100 TB fact-table
  * layout — `partitionBy` on the natural time key so that both
  * static filters AND runtime-derived key sets (dynamic partition
  * pruning, `q_join_dpp`) skip whole directories instead of reading
  * and discarding rows. Partition values ride in the directory
  * names; the parquet files don't store `dt` at all.
  */
object PartitionedEvents {

  private val written = scala.collection.mutable.Set[String]()

  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"target/fixtures/events_by_day$tag"
    // _SUCCESS, not bare-directory existence: a crashed partial
    // write would otherwise be silently reused forever (the sibling
    // fixtures all guard the same way); overwrite mode heals it
    if (!written.contains(dir) &&
        !new java.io.File(path, "_SUCCESS").exists()) {
      graft.Tables(spark, dir, "events")
        .withColumn("dt", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("dt").parquet(path)
    }
    written += dir
    path
  }
}
