package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-larger-than-heap streaming soak (VERDICT r10 #2).
  *
  * RocksDbParitySpec proves the RocksDB provider's SEMANTICS on
  * micro-batches; this main proves the REGIME the provider exists
  * for: keyed state that exceeds the executor heap. It runs the
  * latest-cache fMGWS twin ([[graft.streaming.TrackStream
  * .latestWithTtl]], the reference's A2 keyed cache) over millions
  * of device keys inside a deliberately small JVM (the harness
  * script launches it with -Xmx512m):
  *
  *   - `rocksdb` leg: must COMPLETE — RocksDB keeps state in native
  *     memory + disk, so heap stays flat while state grows — and its
  *     emitted latest-per-key set must equal the batch ground truth
  *     computed from the same feed (exact EXCEPT, both directions).
  *   - `default` leg (negative control): the HDFS-backed provider
  *     materializes every loaded partition's state map ON HEAP, so
  *     the same run must die with OutOfMemoryError — proving the
  *     heap constraint was real and the RocksDB completion is not
  *     vacuous. The harness treats a SURVIVING default leg as
  *     inconclusive (state fit the heap — raise nKeys).
  *
  * Determinism: the feed is 2 points per key, range-partitioned so
  * every key lives in exactly ONE parquet file; with
  * maxFilesPerTrigger=1 each key is touched by exactly one
  * micro-batch, so the update-mode twin emits exactly one
  * DeviceUpdate per key — its max-ts point — regardless of file
  * order. Retention is ~10 years so no timer fires and the
  * watermark never drops a row.
  *
  * Usage: StateSoak <default|rocksdb> <nKeys> <workDir>
  * Exit 0 = leg completed and output matched ground truth;
  * exit 1 = completed but output WRONG (a real parity defect);
  * OOM/abort = JVM death (the expected default-leg outcome).
  */
object StateSoak {
  private val Files = 8
  private val BaseMs = 1704067200000L // 2024-01-01T00:00:00Z

  def main(args: Array[String]): Unit = {
    val provider = args(0)
    val nKeys = args(1).toLong
    val work = args(2)
    require(provider == "default" || provider == "rocksdb",
      s"provider must be default|rocksdb, got $provider")

    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- feed: generated once, reused by the second leg so both
    // providers see byte-identical input
    val feedDir = s"$work/feed"
    if (!new java.io.File(s"$feedDir/_SUCCESS").exists()) {
      spark.range(0L, nKeys)
        .flatMap { id =>
          // two points per key, newest second — the state must keep
          // the max-ts one; course encodes the key for the checksum
          val t1 = BaseMs + (id % 86400L) * 1000L
          Seq((id, new java.sql.Timestamp(t1), false, (id % 360).toDouble),
            (id, new java.sql.Timestamp(t1 + 250L), id % 97 == 0,
              ((id + 7) % 360).toDouble))
        }
        .toDF("entityId", "ts", "isEmergency", "course")
        .repartitionByRange(Files, col("entityId"))
        .write.mode("overwrite").parquet(feedDir)
    }

    // ---- streaming leg: one file per micro-batch; foreachBatch
    // parquet sink (update-mode fMGWS; no driver-side collection)
    val outDir = s"$work/out_$provider"
    val ckpt = s"$work/ckpt_$provider"
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File(outDir))
    rmrf(new java.io.File(ckpt))
    val points = spark.readStream
      .schema("entityId LONG, ts TIMESTAMP, isEmergency BOOLEAN, course DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
      .as[graft.streaming.TrackPoint]
    val tenYearsMs = 10L * 365 * 86400 * 1000
    val q = graft.streaming.TrackStream.latestWithTtl(points, tenYearsMs)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          graft.streaming.DeviceUpdate], _: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .start()
    q.processAllAvailable()
    // provider fingerprint (RocksDbParitySpec's non-vacuity pin): the
    // rocksdb leg must PROVE it ran RocksDB, the default must not
    val sawRocks = q.recentProgress.exists(_.stateOperators.exists(
      _.customMetrics.keySet.toArray.exists(
        _.toString.toLowerCase.contains("rocksdb"))))
    q.stop()
    if ((provider == "rocksdb") != sawRocks) {
      println(s"""{"soak":"state","provider":"$provider","error":"provider fingerprint mismatch (sawRocks=$sawRocks)"}""")
      spark.stop(); sys.exit(1)
    }

    // ---- ground truth: batch max-ts-per-key over the same feed
    // (first arrival wins ties — feed has none), compared exactly
    val feed = spark.read.parquet(feedDir)
    val truth = feed
      .groupBy(col("entityId"))
      .agg(max_by(struct(col("ts"), col("isEmergency"), col("course")),
        col("ts")).as("s"))
      .select(col("entityId"), col("s.ts"), col("s.isEmergency"),
        col("s.course"))
    val out = spark.read.parquet(outDir)
    val evicted = out.filter(col("evicted")).count()
    val emitted = out.filter(!col("evicted"))
      .select(col("entityId"), col("ts"), col("isEmergency"), col("course"))
    val missing = truth.exceptAll(emitted).count()
    val extra = emitted.exceptAll(truth).count()
    val n = emitted.count()
    val ok = missing == 0 && extra == 0 && evicted == 0 && n == nKeys
    println(s"""{"soak":"state","provider":"$provider","keys":$nKeys,"rows_out":$n,"evicted":$evicted,"missing":$missing,"extra":$extra,"match":$ok}""")
    spark.stop()
    sys.exit(if (ok) 0 else 1)
  }
}
