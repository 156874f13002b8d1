package graft

import org.apache.spark.sql.DataFrame
import graft.streaming.SubmitSink

/** Crash-ordering parity for the two sink paths (SURVEY §3.1/§3.2):
  * the reference submits-then-persists on refresh (`task.ts:235` →
  * `242`) and persists-then-submits on webhook (`task.ts:149` →
  * `151`). This spec kills a checkpointed streaming query BETWEEN
  * the two writes in each order and pins the opposite failure
  * semantics: submit-first re-sends but never loses (at-least-once);
  * state-first never duplicates but loses the killed batch's send
  * (at-most-once).
  */
class SinkOrderingSpec extends SparkSpec {
  import spark.implicits._

  private case class Run(submitCounts: Map[Long, Long],
      stateKeys: Set[Long])

  /** Drive a file-source checkpointed query through: clean batch
    * {1,2} → crash between the writes on batch {3,4} → restart and
    * drain. Returns per-key submit counts and the state key set.
    */
  private def run(order: SubmitSink.Order): Run = {
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(s"graft-sink-$p").toString
    val (srcDir, ckpt) = (tmp("src"), tmp("ckpt"))
    // parquet writers refuse a pre-existing dir only on overwrite;
    // append-mode creation is fine, so just name the paths
    val submitDir = tmp("submit") + "/out"
    val stateDir = tmp("state") + "/st"
    val crash = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = spark.readStream
      .schema("entityId LONG, course DOUBLE")
      .json(srcDir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        SubmitSink.processBatch(df, "entityId", order, submitDir,
          stateDir, () => if (crash.getAndSet(false))
            throw new RuntimeException("injected crash between writes"))
      }
      .option("checkpointLocation", ckpt).start()
    def feed(name: String, keys: Seq[Long]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, name),
        keys.map(k => s"""{"entityId":$k,"course":${k * 10.0}}""")
          .mkString("\n").getBytes("UTF-8"))

    feed("a.json", Seq(1L, 2L))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    feed("b.json", Seq(3L, 4L))
    crash.set(true)
    val q2 = start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q2.processAllAvailable())
    } finally q2.stop()
    assert(!crash.get(), "failpoint should have fired")

    val q3 = start() // recovery: offsets uncommitted → batch replays
    try q3.processAllAvailable() finally q3.stop()

    // a CLEAN batch after state already exists — the regression leg
    // for the recacheByPath loss: StateFirst's anti-joined batch
    // must survive its own state write (persist() did not — the
    // state append recomputed the cached plan against the
    // just-written keys and submitted EMPTY)
    feed("c.json", Seq(5L, 6L))
    val q4 = start()
    try q4.processAllAvailable() finally q4.stop()

    val submits = spark.read.parquet(submitDir)
      .groupBy($"entityId").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val state = spark.read.parquet(stateDir)
      .select($"entityId").distinct().as[Long].collect().toSet
    Run(submits, state)
  }

  test("submit-before-state (refresh, task.ts:235->242): crash re-sends, never loses") {
    val r = run(SubmitSink.SubmitFirst)
    // the clean batch went through once
    assert(r.submitCounts(1L) == 1 && r.submitCounts(2L) == 1)
    // the killed batch was submitted, crashed before the state
    // write, and REPLAYED: present (no loss) and duplicated
    assert(r.submitCounts(3L) == 2 && r.submitCounts(4L) == 2,
      s"expected the killed batch re-sent exactly twice: ${r.submitCounts}")
    assert(r.stateKeys == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"state must catch up on replay: ${r.stateKeys}")
    assert(r.submitCounts(5L) == 1 && r.submitCounts(6L) == 1,
      s"clean post-crash batch must submit once: ${r.submitCounts}")
  }

  test("state-before-submit (webhook, task.ts:149->151): crash loses, never duplicates") {
    val r = run(SubmitSink.StateFirst)
    assert(r.submitCounts(1L) == 1 && r.submitCounts(2L) == 1)
    // the state write landed before the crash, so the replay is
    // guarded off: the killed batch's submit never happens — lost
    // from the sink, exactly once in the state, zero duplicates
    assert(!r.submitCounts.contains(3L) && !r.submitCounts.contains(4L),
      s"state-first must NOT re-send after the state landed: " +
        s"${r.submitCounts}")
    assert(r.stateKeys == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"state should have recorded the killed batch: ${r.stateKeys}")
    // the clean batch AFTER state exists must flow — the
    // recacheByPath regression lost exactly this leg
    assert(r.submitCounts(5L) == 1 && r.submitCounts(6L) == 1,
      s"clean second batch lost (recacheByPath regression): " +
        s"${r.submitCounts}")
    assert(r.submitCounts.values.forall(_ == 1L),
      s"state-first must never duplicate: ${r.submitCounts}")
  }

  test("StateFirst: uncommitted state dir (crash during first write) reads as nothing-processed") {
    // a kill mid-way through the FIRST state write leaves the dir
    // existing with only _temporary scaffolding — replay must treat
    // that as an empty log (the batch flows), not crash-loop on
    // "unable to infer schema"
    def tmp(p: String) = java.nio.file.Files
      .createTempDirectory(s"graft-uncommitted-$p").toString
    val stateDir = tmp("state") + "/st"
    val submitDir = tmp("submit") + "/out"
    assert(new java.io.File(stateDir, "_temporary/0").mkdirs())
    val batch = Seq((1L, 10.0), (2L, 20.0))
      .toDF("entityId", "course")
    SubmitSink.processBatch(batch, "entityId",
      SubmitSink.StateFirst, submitDir, stateDir)
    assert(spark.read.parquet(submitDir).count() == 2,
      "batch must submit against an uncommitted state dir")
    assert(spark.read.parquet(stateDir).distinct().count() == 2)
  }
}
