package graft

import graft.sources.WebhookReceiver
import graft.streaming.SubmitSink

/** End-to-end gate for the deployable runtime (`graft.Serve`): a real
  * HTTP POST lands in the submit directory as a CoT feature, exactly
  * once per message identity — the full reference webhook path
  * (receiver → spool → decode → transform → ordered two-write sink)
  * in one process, the same wiring `main` starts under spark-submit.
  */
class ServeSpec extends SparkSpec {

  private def item(eid: Int, t: Long) =
    s"""{"entityId": $eid, "name": "n$eid", "alias": "a$eid",""" +
      s""" "deviceType": "inReach", "deviceId": $eid,""" +
      s""" "trackPoint": {"time": $t, "isEmergency": false,""" +
      s""" "direction": 90.0, "point": {"x": 1.5, "y": 2.5}}}"""

  test("Serve pipeline: POST → submit parquet, dedupe by message identity") {
    val root = java.nio.file.Files.createTempDirectory("serve").toFile
    def dir(n: String) = new java.io.File(root, n).getAbsolutePath
    val spool = new java.io.File(dir("spool")); spool.mkdirs()
    val recv = scala.util.Try(new WebhookReceiver(spool)) match {
      case scala.util.Success(r) => r
      case scala.util.Failure(e) =>
        cancel(s"sandbox forbids loopback sockets: $e")
    }
    val q = Serve.pipeline(spark, spool.getAbsolutePath,
      dir("ckpt"), dir("submit"), dir("state"))
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(body: String) = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:${recv.port}/h1"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())

      assert(post(item(1, 1704844800000L)).statusCode() == 200)
      assert(post(item(1, 1704844800000L)).statusCode() == 200) // dup POST
      assert(post(item(2, 1704844860000L)).statusCode() == 200)
      assert(post("""{"no": "entityId"}""").statusCode() == 400)
      q.processAllAvailable()
      // replay across batches: the duplicate arrives again later —
      // the StateFirst processed-log guard must drop it
      assert(post(item(1, 1704844800000L)).statusCode() == 200)
      // a NEWER point for entity 1 is a new message identity: flows
      assert(post(item(1, 1704844980000L)).statusCode() == 200)
      q.processAllAvailable()

      val out = spark.read.parquet(dir("submit"))
      val rows = out.select("id", "msg_key").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      // 3 distinct message identities: e1@t0, e2@t1, e1@t2 — the two
      // duplicate POSTs (same batch + later batch) are guarded off
      assert(rows.map(_._1) == Seq("inreach-1", "inreach-1", "inreach-2"),
        s"submitted rows wrong: $rows")
      assert(rows.map(_._2).distinct.size == 3, s"dup leaked: $rows")
      // transform really ran (T1–T7): CoT envelope fields present
      val first = out.filter(org.apache.spark.sql.functions
        .col("msg_key").startsWith("inreach-1@2024-01-10T00:00:00"))
      assert(first.count() == 1)
      // the state log carries exactly the processed identities
      assert(spark.read.parquet(dir("state")).distinct().count() == 3)
    } finally {
      q.stop()
      recv.close()
    }
  }
}
