package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.{JsonSources, WebhookReceiver}
import graft.streaming.SubmitSink

/** The deployable runtime: the reference's webhook invocation path
  * (reference `task.ts:97-164` express route + `Dockerfile:1-8`
  * container entry) as ONE long-running spark-submit main —
  * HTTP receiver → spool → micro-batch decode/transform → ordered
  * two-write sink. This is the "execution-model shell" the library
  * mains (Verify/Bench) don't provide: start it, POST track points,
  * read CoT features from the submit directory.
  *
  * ```
  * spark-submit --class graft.Serve graft.jar \
  *   <spoolDir> <checkpointDir> <submitDir> <stateDir> \
  *   [--debug] [--order state-first|submit-first]
  * ```
  *
  * Layout mirrors the reference deployment 1:1:
  *  - [[WebhookReceiver]] is the express route (`task.ts:103`):
  *    schema-gated POST, 200/400/405, DEBUG accept-anything;
  *  - the spool + file-watermark text stream is the Lambda event
  *    queue — push transport adapted to Spark's pull micro-batching;
  *  - [[JsonSources.decodeWebhook]]/[[JsonSources.webhookToCot]] are
  *    V1 + T1–T7 (`task.ts:110,121-143`);
  *  - [[SubmitSink.processBatch]] keeps the webhook path's
  *    state-THEN-submit crash ordering (`task.ts:149,151`:
  *    at-most-once per message identity) — or `--order submit-first`
  *    for the refresh path's at-least-once ordering (`task.ts:235`).
  *
  * Scale shape: the single JVM here is local-mode packaging, not a
  * design limit — N receivers spool N prefixes into the same
  * directory behind one query; every stage after the spool is
  * ordinary distributed Structured Streaming (no driver-side row
  * handling, no collect).
  */
object Serve {

  /** The streaming wiring, factored out so tests can drive it
    * without the process-lifecycle main.
    *
    * Message identity for the sink's replay guard is
    * `id @ event-time`: a crash-replayed or duplicate-POSTed point
    * dedupes (within a batch via dropDuplicates, across batches via
    * the StateFirst processed-log anti-join), while a NEWER point
    * for the same entity is a new key and flows through — the
    * reference's keyed upsert granularity (`task.ts:148`).
    */
  def pipeline(spark: SparkSession, spoolDir: String,
      checkpointDir: String, submitDir: String, stateDir: String,
      order: SubmitSink.Order = SubmitSink.StateFirst): StreamingQuery =
    JsonSources.webhookToCot(
        JsonSources.decodeWebhook(
          spark.readStream.text(spoolDir), "value"))
      .withColumn("msg_key",
        concat_ws("@", col("id"), col("properties").getField("time")))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SubmitSink.processBatch(batch.dropDuplicates("msg_key"),
          "msg_key", order, submitDir, stateDir)
        ()
      }
      .start()

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    require(pos.length == 4,
      "usage: graft.Serve <spoolDir> <checkpointDir> <submitDir> " +
        "<stateDir> [--debug] [--order state-first|submit-first]")
    val Array(spoolDir, checkpointDir, submitDir, stateDir) = pos
    val debug = args.contains("--debug")
    // an unrecognized value must fail fast, not silently fall back to
    // StateFirst — the two orders have OPPOSITE crash semantics
    val order = args.sliding(2).collectFirst {
      case Array("--order", v) => v match {
        case "submit-first" => SubmitSink.SubmitFirst
        case "state-first"  => SubmitSink.StateFirst
        case other => sys.error(
          s"--order must be state-first or submit-first, got '$other'")
      }
    }.getOrElse(SubmitSink.StateFirst)

    val spool = new java.io.File(spoolDir)
    spool.mkdirs()

    // spark-submit provides master/conf; defaults cover bare `java`
    val spark = SparkSession.builder()
      .appName("graft-serve")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // container packaging (docker/entrypoint.sh): GRAFT_HTTP_PORT
    // fixes the port and binds all interfaces so EXPOSE works;
    // unset → loopback + ephemeral, the local/test default
    val fixedPort = sys.env.get("GRAFT_HTTP_PORT").map { raw =>
      val p = scala.util.Try(raw.trim.toInt).getOrElse(
        sys.error(s"GRAFT_HTTP_PORT must be an integer, got '$raw'"))
      require(p > 0 && p < 65536, s"GRAFT_HTTP_PORT out of range: $p")
      p
    }
    val receiver = new WebhookReceiver(spool, debug = debug,
      requestedPort = fixedPort.getOrElse(0),
      bindAll = fixedPort.isDefined)
    val query = pipeline(spark, spoolDir, checkpointDir, submitDir,
      stateDir, order)
    // the driver's only output contract: where to POST
    println(s"""{"serve":"ready","port":${receiver.port},""" +
      s""""spool":"$spoolDir","submit":"$submitDir"}""")

    sys.addShutdownHook {
      receiver.close()
      query.stop()
    }
    query.awaitTermination()
  }
}
