package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** S1 HTTP transport — the reference's live webhook endpoint
  * (reference `task.ts:97-164`): `POST /{webhookid}` with an
  * `EverywhereItem` JSON body. JDK-only (`com.sun.net.httpserver`),
  * no servlet container.
  *
  * Behavior reproduced:
  *  - valid body → spooled + `{"status":200,"message":"Received"}`
  *    (`task.ts:156-159`);
  *  - invalid body → HTTP 400 with an error message (the TypeBox
  *    `body: EverywhereItem` schema gate, `task.ts:110`); validity
  *    here is the same required-field rule as
  *    [[JsonSources.decodeWebhook]] — `entityId` and
  *    `trackPoint.time` present — so the transport gate and the
  *    Spark-side V1 validator agree by construction;
  *  - DEBUG → any body accepted (`body: Type.Any()`, `task.ts:110`)
  *    and logged to stderr (`task.ts:116-118`);
  *  - non-POST → 405.
  *
  * Accepted payloads land as immutable `part-` files (write hidden
  * tmp + atomic rename, so a concurrent directory listing never sees
  * a half-written file) in `spoolDir`, which the
  * [[TrackPointSource]] micro-batch stream — or a plain
  * `readStream.text` + [[JsonSources.decodeWebhook]] pipeline —
  * drains with its file-count watermark. The receiver is the
  * transport shim between a push protocol and Spark's pull-based
  * micro-batching; it holds no state beyond the spool counter, so at
  * scale N receivers spool to N prefixes behind one stream.
  */
final class WebhookReceiver(spoolDir: java.io.File,
    debug: Boolean = false,
    prefix: String = "part-",
    // container deployment: fixed port + all-interfaces bind
    // (docker/entrypoint.sh); the 0/loopback default keeps local
    // runs and tests collision-free
    requestedPort: Int = 0,
    bindAll: Boolean = false) extends AutoCloseable {

  // a hidden tmp prefix would make the atomic-rename dance moot
  require(prefix.nonEmpty && !prefix.startsWith("."),
    s"spool prefix must be visible: '$prefix'")

  private val mapper = new ObjectMapper
  // resume AFTER the highest already-spooled index: a restarted
  // receiver starting at 0 would atomically rename ONTO committed
  // part- files — the file-count watermark then sees an unchanged
  // listing, the new body is never ingested, and the old one is gone
  private val nFiles = new java.util.concurrent.atomic.AtomicInteger({
    val existing = Option(spoolDir.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.startsWith(prefix) &&
        n.drop(prefix.length).forall(_.isDigit) &&
        n.length > prefix.length)
      .map(_.drop(prefix.length).toInt)
    if (existing.isEmpty) 0 else existing.max + 1
  })
  private val server = HttpServer.create(
    if (bindAll)
      new java.net.InetSocketAddress(requestedPort)
    else
      new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, requestedPort), 16)

  server.createContext("/", new HttpHandler {
    def handle(ex: HttpExchange): Unit = try {
      if (ex.getRequestMethod != "POST") {
        respond(ex, 405, "Method Not Allowed")
      } else {
        val webhookid = ex.getRequestURI.getPath.stripPrefix("/")
        val body = new String(
          ex.getRequestBody.readAllBytes(), "UTF-8")
        if (debug)
          System.err.println(s"DEBUG Webhook: $webhookid - $body")
        if (debug || isValid(body)) {
          spool(body)
          respond(ex, 200, "Received")
        } else respond(ex, 400, "Invalid webhook body")
      }
    } finally ex.close()
  })
  server.start()

  /** Bound loopback port (requested port 0 = ephemeral). */
  def port: Int = server.getAddress.getPort

  /** The reference 400s any body failing the EverywhereItem schema;
    * this mirrors decodeWebhook's validity rule INCLUDING types:
    * the required fields must be present as integral JSON numbers
    * (PERMISSIVE from_json nulls wrong-typed fields, so accepting a
    * string entityId here would 200 a record the decoder then
    * drops — a silent loss the 400 exists to prevent). Trailing
    * content after the JSON object is rejected for the same reason.
    */
  private def isValid(body: String): Boolean = try {
    val parser = mapper.createParser(body)
    try {
      val n: com.fasterxml.jackson.databind.JsonNode =
        mapper.readTree(parser)
      val clean = parser.nextToken() == null // no trailing garbage
      // range-checked against the decode schema's physical types
      // (entityId IntegerType, time LongType): an integral value the
      // schema can't hold would be nulled by PERMISSIVE from_json —
      // the silent post-200 loss this gate exists to prevent
      clean && n != null && n.isObject &&
        n.path("entityId").isIntegralNumber &&
        n.path("entityId").canConvertToInt &&
        n.path("trackPoint").path("time").isIntegralNumber &&
        n.path("trackPoint").path("time").canConvertToLong
    } finally parser.close()
  } catch { case _: Exception => false }

  private def spool(body: String): Unit = {
    val i = nFiles.getAndIncrement()
    // 9 digits: the listing must stay lexicographically monotone
    // (the offset watermark slices a name-sorted listing by index —
    // a narrower pad would insert file 100000 BEFORE 99999 and shift
    // every committed range)
    val tmp = new java.io.File(spoolDir, f".$prefix$i%09d.tmp")
    // flatten BOTH newline flavors: Hadoop's line reader splits on
    // lone CR too, so a CRLF pretty-printed body would otherwise
    // spool as several malformed JSON fragments after a 200
    java.nio.file.Files.write(tmp.toPath,
      body.replace('\n', ' ').replace('\r', ' ').getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(spoolDir, f"$prefix$i%09d").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def respond(ex: HttpExchange, status: Int,
      message: String): Unit = {
    val out = mapper.createObjectNode
    out.put("status", status)
    out.put("message", message)
    val bytes = mapper.writeValueAsBytes(out)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  override def close(): Unit = server.stop(0)
}
