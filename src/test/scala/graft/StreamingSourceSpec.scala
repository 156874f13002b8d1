package graft

import org.apache.spark.sql.functions._
import graft.sources.FileWatermarkOffset

/** The DSv2 track-point source as an unbounded micro-batch stream
  * (graft.sources.TrackPointMicroBatchStream): per-file offset
  * ranges, exactly-once across triggers AND restarts (checkpointed
  * high-watermark), and filter pushdown riding into the streaming
  * reader.
  */
class StreamingSourceSpec extends SparkSpec {

  private def writeFile(dir: java.io.File, name: String,
      rows: Seq[String]): Unit =
    java.nio.file.Files.write(new java.io.File(dir, name).toPath,
      rows.mkString("\n").getBytes("UTF-8"))

  private def row(eid: Long, evid: Long, ts: Long): String =
    s"""{"entity_id": $eid, "event_id": $evid, "name": "u$eid", """ +
      s""""ts": $ts, "lon": 1.0, "lat": 2.0, "emergency": false}"""

  test("offset json roundtrips and rejects junk") {
    assert(FileWatermarkOffset(7).json() == """{"files":7}""")
    assert(FileWatermarkOffset.fromJson("""{"files":7}""") ==
      FileWatermarkOffset(7))
    intercept[IllegalArgumentException](
      FileWatermarkOffset.fromJson("""{"nope":1}"""))
  }

  test("micro-batch source: per-file batches, exactly-once, restart recovery") {
    val dir = java.nio.file.Files.createTempDirectory("tp_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("tp_ckpt").toFile
    writeFile(dir, "part-00000", Seq(row(1, 10, 1000), row(2, 20, 2000)))
    writeFile(dir, "part-00001", Seq(row(3, 30, 3000)))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def start() = spark.readStream
      .format("graft.sources.TrackPointSource")
      .option("path", dir.getAbsolutePath).load()
      .select(col("entity_id"), col("event_id"))
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
        s"initial backlog wrong: $seen")
      // a new file arrives: the next trigger ingests ONLY it
      writeFile(dir, "part-00002", Seq(row(4, 40, 4000), row(5, 50, 5000)))
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L),
        (4L, 40L), (5L, 50L)), s"incremental batch wrong: $seen")
    } finally q.stop()

    // restart against the same checkpoint: only the file that arrived
    // while down is processed — the committed high-watermark holds
    writeFile(dir, "part-00003", Seq(row(6, 60, 6000)))
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.sorted.toSeq == Seq((6L, 60L)),
        s"restart must resume from the committed offset: $seen")
    } finally q2.stop()
  }

  test("S1 live-socket leg: loopback feeder drives ingestion end-to-end") {
    // The reference's S1 is a live push endpoint (`task.ts:97-164`):
    // clients POST JSON over a real socket and the payload flows
    // through the pipeline. This leg runs a loopback ServerSocket
    // "webhook receiver" that spools each connection's payload as an
    // immutable part- file (write-to-hidden-tmp + atomic rename, so
    // the file-count watermark never sees a half-written file), with
    // the DSv2 micro-batch stream draining the spool — ingestion
    // over a live socket, not just offset arithmetic.
    val server = scala.util.Try(new java.net.ServerSocket(
      0, 16, java.net.InetAddress.getLoopbackAddress)) match {
      case scala.util.Success(s) => s
      case scala.util.Failure(e) =>
        cancel(s"sandbox forbids loopback sockets: $e")
    }
    val dir = java.nio.file.Files.createTempDirectory("tp_sock").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("tp_sock_ck").toFile
    val nFiles = new java.util.concurrent.atomic.AtomicInteger(0)
    val acceptor = new Thread(() =>
      try while (!server.isClosed) {
        val c = server.accept()
        try {
          val payload = scala.io.Source
            .fromInputStream(c.getInputStream, "UTF-8").mkString
          if (payload.nonEmpty) {
            val n = nFiles.getAndIncrement()
            val tmp = new java.io.File(dir, f".part-$n%05d.tmp")
            java.nio.file.Files.write(tmp.toPath,
              payload.getBytes("UTF-8"))
            java.nio.file.Files.move(tmp.toPath,
              new java.io.File(dir, f"part-$n%05d").toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        } finally c.close()
      } catch { case _: java.net.SocketException => () }) // closed
    acceptor.setDaemon(true)
    acceptor.start()

    def post(rows: Seq[String]): Unit = {
      val c = new java.net.Socket(
        java.net.InetAddress.getLoopbackAddress, server.getLocalPort)
      try {
        val w = new java.io.OutputStreamWriter(
          c.getOutputStream, "UTF-8")
        w.write(rows.mkString("\n")); w.flush()
      } finally c.close()
    }
    def awaitSpooled(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 10000
      def count = Option(dir.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.startsWith("part-"))
      while (count < n && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(count >= n, s"feeder never spooled file $n")
    }

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream
      .format("graft.sources.TrackPointSource")
      .option("path", dir.getAbsolutePath).load()
      .select(col("entity_id"), col("event_id"))
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .start()
    try {
      post(Seq(row(1, 10, 1000), row(2, 20, 2000)))
      awaitSpooled(1)
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq((1L, 10L), (2L, 20L)),
        s"first live push wrong: $seen")
      // second push while the query is live: only the new payload
      post(Seq(row(3, 30, 3000)))
      awaitSpooled(2)
      q.processAllAvailable()
      assert(seen.sorted.toSeq ==
        Seq((1L, 10L), (2L, 20L), (3L, 30L)),
        s"second live push wrong: $seen")
    } finally {
      q.stop()
      server.close()
    }
  }

  test("S1 HTTP leg: POST round-trip, 200/400/405, streaming drain") {
    // The reference webhook is HTTP, not a raw socket
    // (`task.ts:97-164`): POST body validated against EverywhereItem
    // (400 on failure, `task.ts:110`), 200 + {status, message} on
    // success (`task.ts:156-159`). WebhookReceiver reproduces that
    // contract over JDK com.sun.net.httpserver; this leg drives it
    // with a real HTTP client end-to-end into the streaming decode.
    import graft.sources.{JsonSources, WebhookReceiver}
    val dir = java.nio.file.Files.createTempDirectory("tp_http").toFile
    val recv = scala.util.Try(new WebhookReceiver(dir)) match {
      case scala.util.Success(r) => r
      case scala.util.Failure(e) =>
        cancel(s"sandbox forbids loopback sockets: $e")
    }
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def req(path: String) = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(
          s"http://127.0.0.1:${recv.port}$path"))
      def post(body: String, path: String = "/hook1") =
        client.send(req(path).POST(java.net.http.HttpRequest
            .BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      def item(eid: Int, t: Long, x: Double, y: Double) =
        s"""{"entityId": $eid, "name": "n$eid", "alias": "a$eid",""" +
          s""" "deviceType": "inReach", "deviceId": $eid,""" +
          s""" "trackPoint": {"time": $t, "isEmergency": false,""" +
          s""" "direction": 90.0, "point": {"x": $x, "y": $y}}}"""

      val ok = post(item(1, 1704844800000L, 1.5, 2.5))
      assert(ok.statusCode() == 200, s"valid body: ${ok.body()}")
      assert(ok.body().contains("\"message\":\"Received\""))
      // schema gate: missing entityId / malformed JSON both 400
      assert(post("""{"name": "no entity id"}""").statusCode() == 400)
      assert(post("{not json").statusCode() == 400)
      // TYPED gate: present-but-wrong-typed required fields must 400
      // (PERMISSIVE from_json would null them — a 200 here would
      // acknowledge a record the decoder then silently drops)
      assert(post("""{"entityId": "abc",""" +
        """ "trackPoint": {"time": 1}}""").statusCode() == 400)
      assert(post("""{"entityId": 1,""" +
        """ "trackPoint": {"time": "xx"}}""").statusCode() == 400)
      // trailing garbage after a valid object
      assert(post("""{"entityId": 1,""" +
        """ "trackPoint": {"time": 1}} extra""").statusCode() == 400)
      // wrong method
      assert(client.send(req("/hook1").GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
        .statusCode() == 405)
      assert(post(item(2, 1704844860000L, 3.5, 4.5))
        .statusCode() == 200)
      // CRLF pretty-printed body: accepted AND spooled as ONE line
      // (lone CR is a Hadoop line delimiter — must be flattened)
      assert(post(item(3, 1704844920000L, 5.5, 6.5)
        .replace(", ", ",\r\n ")).statusCode() == 200)
      // only the three VALID bodies spooled
      assert(dir.listFiles().count(_.getName.startsWith("part-")) == 3)

      // drain the spool through the V1 decode + CoT transform
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = graft.sources.JsonSources.webhookToCot(
          JsonSources.decodeWebhook(
            spark.readStream.text(dir.getAbsolutePath), "value"))
        .select(col("id"))
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            got.synchronized {
              got ++= df.collect().map(_.getString(0))
            }
            ()
        }
        .start()
      try {
        q.processAllAvailable()
        assert(got.sorted.toSeq ==
          Seq("inreach-1", "inreach-2", "inreach-3"),
          s"HTTP-ingested records wrong: $got")
      } finally q.stop()
    } finally recv.close()

    // N receivers → N prefixes in one spool dir: no name collision
    val shared =
      java.nio.file.Files.createTempDirectory("tp_http_n").toFile
    val ra = new WebhookReceiver(shared, prefix = "a-")
    val rb = new WebhookReceiver(shared, prefix = "b-")
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def postTo(p: Int) = client.send(
        java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"http://127.0.0.1:$p/h"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"entityId": 9, "trackPoint": {"time": 5}}"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(postTo(ra.port).statusCode() == 200)
      assert(postTo(rb.port).statusCode() == 200)
      val names = shared.listFiles().map(_.getName).sorted.toSeq
      assert(names == Seq("a-000000000", "b-000000000"),
        s"spool: $names")
      // restart resumes AFTER the committed spool, never onto it
      val ra2 = new WebhookReceiver(shared, prefix = "a-")
      try {
        assert(postTo(ra2.port).statusCode() == 200)
        val after = shared.listFiles().map(_.getName).sorted.toSeq
        assert(after == Seq("a-000000000", "a-000000001",
          "b-000000000"), s"restart overwrote the spool: $after")
      } finally ra2.close()
    } finally { ra.close(); rb.close() }

    // DEBUG mode = Type.Any(): any body accepted (task.ts:110)
    val dbgDir =
      java.nio.file.Files.createTempDirectory("tp_http_dbg").toFile
    val dbg = new WebhookReceiver(dbgDir, debug = true)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val r = client.send(java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(
            s"http://127.0.0.1:${dbg.port}/hookd"))
          .POST(java.net.http.HttpRequest.BodyPublishers
            .ofString("anything goes")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      assert(dbgDir.listFiles()
        .count(_.getName.startsWith("part-")) == 1)
    } finally dbg.close()
  }

  test("min_ts option drops rows inside the streaming reader") {
    // Spark's V2 filter pushdown rewrites batch relations only — a
    // micro-batch ScanBuilder never receives pushFilters (verified:
    // the DataFrame filter below leaves PushedFilters empty). The
    // reference's noEarlierThan gate is config-driven, so the
    // streaming source takes it as the min_ts OPTION; the DataFrame
    // filter stays as the correctness backstop.
    val dir = java.nio.file.Files.createTempDirectory("tp_stream_f").toFile
    writeFile(dir, "part-00000",
      Seq(row(1, 10, 1000), row(2, 20, 99000), row(3, 30, 500)))
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("graft.sources.TrackPointSource")
      .option("path", dir.getAbsolutePath)
      .option("min_ts", "1000").load()
      .filter(col("ts") >= 1000L)
      .select(col("entity_id"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.collect().map(_.getLong(0)) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.sorted.toSeq == Seq(1L, 2L), s"filter not applied: $got")
      // the filter must be INSIDE the scan, not a post-filter only:
      // the stream's source description advertises the pushed predicate
      val planStr = q.lastProgress.sources.map(_.description).mkString
      // ts must appear INSIDE the brackets: an empty pushed list
      // still prints "PushedFilters: []" and ReadSchema contains
      // "ts:bigint", so two independent contains() could not fail
      // for the no-pushdown regression
      assert("PushedFilters: \\[[^\\]]*ts".r
          .findFirstIn(planStr).isDefined,
        s"ts filter not pushed into the streaming reader: $planStr")
    } finally q.stop()
  }
}
