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

  test("N receivers, one stream: distinct spool prefixes merge behind one query") {
    // the documented scale-out shape (Serve.scala scaladoc): N HTTP
    // receivers spool N prefixes into the SAME directory behind one
    // streaming query — no receiver-side coordination. Two live
    // receivers, interleaved POSTs, one pipeline; every message from
    // both must land exactly once.
    val root = java.nio.file.Files.createTempDirectory("serveN").toFile
    def dir(n: String) = new java.io.File(root, n).getAbsolutePath
    val spool = new java.io.File(dir("spool")); spool.mkdirs()
    val (ra, rb) = scala.util.Try((
      new WebhookReceiver(spool, prefix = "a-"),
      new WebhookReceiver(spool, prefix = "b-"))) match {
      case scala.util.Success(p) => p
      case scala.util.Failure(e) =>
        cancel(s"sandbox forbids loopback sockets: $e")
    }
    assert(ra.port != rb.port, "two receivers must bind distinct ports")
    val q = Serve.pipeline(spark, spool.getAbsolutePath,
      dir("ckpt"), dir("submit"), dir("state"))
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(port: Int, body: String) = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$port/h1"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      // interleave across receivers, including the same entity
      // hitting BOTH receivers with distinct event times (load
      // balancer reassignment): all 4 identities are distinct
      assert(post(ra.port, item(1, 1704844800000L)).statusCode() == 200)
      assert(post(rb.port, item(2, 1704844860000L)).statusCode() == 200)
      assert(post(rb.port, item(1, 1704844920000L)).statusCode() == 200)
      assert(post(ra.port, item(3, 1704844980000L)).statusCode() == 200)
      // same identity POSTed to the OTHER receiver: cross-receiver
      // dedup must still hold (identity, not file origin, is the key)
      assert(post(rb.port, item(3, 1704844980000L)).statusCode() == 200)
      q.processAllAvailable()
      val rows = spark.read.parquet(dir("submit"))
        .select("msg_key").collect().map(_.getString(0)).sorted.toSeq
      assert(rows.size == 4, s"expected 4 distinct identities: $rows")
      assert(rows.distinct.size == 4, s"cross-receiver dup leaked: $rows")
      assert(rows.count(_.startsWith("inreach-1@")) == 2 &&
        rows.count(_.startsWith("inreach-3@")) == 1, s"wrong mix: $rows")
      // both prefixes actually contributed spool files
      val names = spool.list().toSeq
      assert(names.exists(_.startsWith("a-")) &&
        names.exists(_.startsWith("b-")), s"spool files: $names")
    } finally {
      q.stop()
      ra.close(); rb.close()
    }
  }
}
