package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(d: String = "0.001"): String = s"/root/testdata/sf$d"

  /** Run a block with AQE off — plan-shape assertions need the
    * static physical plan (AdaptiveSparkPlan hides codegen subtrees
    * until execution).
    */
  def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Run a block with automatic broadcast-join selection off (both
    * the static and the AQE thresholds; explicit broadcast() hints
    * still apply). Scaling gates use this to pin the AT-SCALE
    * exchange-based plan: after the r13 fan-out/cache work the
    * planner broadcasts whole small-SF dedup tables, executing the
    * match pipelines map-side with no shuffle at all — correct at
    * these sizes, but it hides the exchange growth the decade gates
    * exist to measure (at 100 TB nothing corpus-sized broadcasts).
    */
  def withoutBroadcastJoins[T](body: => T): T = {
    val k1 = "spark.sql.autoBroadcastJoinThreshold"
    val k2 = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val p1 = spark.conf.get(k1, "10485760")
    val p2 = spark.conf.get(k2, "-1")
    spark.conf.set(k1, "-1")
    spark.conf.set(k2, "-1")
    try body finally {
      spark.conf.set(k1, p1); spark.conf.set(k2, p2)
    }
  }

  /** Total shuffle records written by everything `f` runs, from real
    * task metrics. The listener bus is async, so drain it to empty
    * (via the private-API bridge) before reading the tally.
    */
  def shuffledRecords(f: => Unit): Long = {
    val tally = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          tally.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      tally.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** Max shuffle bytes read by any SINGLE task across everything `f`
    * runs — the measured form of "no task receives an unbounded
    * per-key payload". (Execution-memory metrics can't see this:
    * ObjectHashAggregate's per-key buffers are untracked on-heap
    * state, which is exactly why a whale key is dangerous there.)
    */
  /** (max single-task, total) shuffle read bytes across `f` — the
    * skew-ratio form of "no task receives an unbounded payload":
    * max/total stays near 1/partitions when work is spread, and
    * approaches the dominant stage's share of the wire when one
    * task serializes it.
    */
  def shuffleReadSkew(f: => Unit): (Long, Long) = {
    val peak = new java.util.concurrent.atomic.AtomicLong
    val total = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          val b = te.taskMetrics.shuffleReadMetrics.totalBytesRead
          peak.accumulateAndGet(b, Math.max(_, _))
          total.addAndGet(b)
        }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (peak.get, total.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  def maxTaskShuffleReadBytes(f: => Unit): Long = {
    val peak = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          peak.accumulateAndGet(
            te.taskMetrics.shuffleReadMetrics.totalBytesRead,
            Math.max(_, _))
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      peak.get
    } finally spark.sparkContext.removeSparkListener(l)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
