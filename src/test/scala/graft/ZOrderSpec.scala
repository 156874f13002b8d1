package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Z-order (Morton) clustering as a data-skipping LAYOUT: the same
  * rows written morton-clustered vs id-ordered, probed with the same
  * lat/lon box predicate. Parquet keeps per-row-group min/max stats;
  * clustering by the interleaved key makes BOTH lat and lon locally
  * tight, so the box prunes almost every row group — the 100 TB
  * answer to "scan only the operating area", complementing
  * directory-level partition pruning (DppSpec) one level finer.
  *
  * Measured: the scan's numOutputRows counts rows AFTER row-group
  * pruning (the vectorized parquet reader skips whole groups on
  * stats, it does not filter records), so the layout's effect is
  * read directly off the scan metric.
  */
class ZOrderSpec extends SparkSpec {

  private val dir = "target/fixtures/zorder"

  private def geo = Tables(spark, sf("0.01"), "events")
    .withColumn("lat",
      lit(30.0) + (col("event_id") * 37 % 3000).cast("double") / 100.0)
    .withColumn("lon", lit(-120.0) +
      ((col("event_id") * 73 + col("user_id") * 131) % 6000)
        .cast("double") / 100.0)
    .withColumn("morton", mortonKey(col("lat"), col("lon")))
    .select("event_id", "user_id", "lat", "lon", "morton")

  private lazy val written: Long = {
    val df = geo
    df.repartitionByRange(32, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/linear")
    df.repartitionByRange(32, col("morton"))
      .sortWithinPartitions(col("morton"))
      .write.mode("overwrite").parquet(s"$dir/zorder")
    df.count()
  }

  /** Rows the parquet scan materializes for a 2°×5° box probe. */
  private def scanRows(layout: String): Long = {
    val df = spark.read.parquet(s"$dir/$layout")
      .filter(col("lat") >= 40.0 && col("lat") <= 42.0 &&
        col("lon") >= -100.0 && col("lon") <= -95.0)
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    scan.metrics("numOutputRows").value
  }

  test("box predicates reach the parquet reader as pushed filters") {
    assert(written > 0)
    val df = spark.read.parquet(s"$dir/zorder")
      .filter(col("lat") >= 40.0 && col("lat") <= 42.0)
    val scan = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(lat,40.0)") &&
      pushed.contains("LessThanOrEqual(lat,42.0)"),
      s"box filter not pushed: $pushed")
  }

  test("measured: morton layout prunes row groups the linear layout reads") {
    assert(written > 0)
    val linear = scanRows("linear")
    val zorder = scanRows("zorder")
    val selected = spark.read.parquet(s"$dir/zorder")
      .filter(col("lat") >= 40.0 && col("lat") <= 42.0 &&
        col("lon") >= -100.0 && col("lon") <= -95.0).count()
    info(s"scan rows: linear=$linear zorder=$zorder " +
      s"(box matches $selected of $written)")
    // id-ordered files spread geography uniformly: every row group
    // straddles the box bounds, nothing prunes.
    assert(linear == written,
      s"expected the linear layout to read everything: $linear != $written")
    // morton-clustered files are spatially tight: the box touches a
    // handful of the 32 groups.
    assert(zorder * 4 <= linear,
      s"z-order should prune >=4x vs linear: $zorder vs $linear")
  }

  test("layout does not change results") {
    assert(written > 0)
    def res(l: String) = spark.read.parquet(s"$dir/$l")
      .filter(col("lat") >= 40.0 && col("lat") <= 42.0 &&
        col("lon") >= -100.0 && col("lon") <= -95.0)
      .orderBy(col("event_id")).collect().toSeq
    assert(res("linear") == res("zorder"))
  }
}
