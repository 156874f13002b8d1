package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed
  * metadata — how image/audio/video columns are modeled at 100 TB
  * (BASELINE.json north star: "multimodal columns").
  */
case class MediaRecord(doc_id: Long, media_type: String,
    payload: Array[Byte])

/** Decoded per-record features. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum_mod: Long,
    feat: Seq[Double])

/** Real decoded image metadata + a cheap content signal. */
case class ImageMeta(doc_id: Long, width: Int, height: Int,
    mean_luma: Double)

/** A re-encoded (resized) image payload. */
case class ResizedImage(doc_id: Long, width: Int, height: Int,
    payload: Array[Byte])

/** Real decoded audio metadata + the loudness content signal. */
case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
    n_samples: Int, rms: Double)

/** One fixed-length audio analysis window (frame-sample step). */
case class AudioWindow(doc_id: Long, window_no: Int,
    start_sample: Int, rms: Double, zero_crossings: Int)

/** Multimodal-column plumbing: binary payloads, typed partition-wise
  * decode, frame sampling.
  *
  * Two decode tiers:
  *
  * 1. [[decodeImages]] / [[resizeImages]] are REAL: the JDK bundles
  *    PNG/JPEG/BMP/GIF codecs in `javax.imageio` (java.desktop,
  *    present in this runtime — no external dependency), so image
  *    payloads decode, measure and resample for real. Likewise
  *    [[decodeWav]] / [[windowAudio]]: `javax.sound.sampled` parses
  *    WAV/AIFF PCM, so audio decodes, measures (RMS) and windows
  *    (RMS + zero-crossings per frame) for real. No DuckDB oracle
  *    can replay a codec, so these are spec-verified
  *    (ImageCodecSpec: synthesized PNGs with known pixels;
  *    AudioCodecSpec: synthesized WAVs with known sine content) —
  *    the same gate tier as streaming state.
  * 2. [[extractFeatures]] remains the deterministic STAND-IN for
  *    codecs the JVM does NOT ship (video): a byte histogram +
  *    checksum with the production shape — binary in, fixed-width
  *    feature vector out — keeping the oracle-checked query family
  *    engine-portable.
  *
  * Shared by both tiers: the `binary` column schema, the typed
  * `mapPartitions` boundary (codec state initialized once per
  * partition, not per row), and the rule that payload bytes never
  * cross a shuffle.
  *
  * Scale notes: `mapPartitions` amortizes codec initialization per
  * partition (not per row); payload bytes never cross a shuffle —
  * features are extracted before any wide op. Frame sampling is a
  * codegen'd HOF over the binary column, so exploding frames happens
  * scan-side too.
  */
object Multimodal {

  /** Model `documents` as a media table: utf-8 payload bytes.
    * (r13: a fanOut here measured SLOWER — the stub codec tier over
    * 5k tiny payloads is cheaper than the exchange, 0.29 → 0.68 s on
    * the frames query. A real binary-payload corpus arrives in many
    * splits anyway, where fanOut is a no-op by construction.)
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode (see object docs): deterministic byte histogram +
    * checksum per payload via typed mapPartitions.
    */
  def extractFeatures(media: Dataset[MediaRecord],
      bins: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // A real decoder would initialize its codec HERE, once per
      // partition, then stream the batch through it. A null payload
      // (null source text) is a corrupt record → dropped, matching
      // the codec tiers — not an NPE that kills the task.
      it.flatMap { m => Option(m.payload).map { bytes =>
        val hist = new Array[Double](bins)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val u = bytes(i) & 0xff
          sum += u
          hist(u * bins / 256) += 1
          i += 1
        }
        val n = bytes.length
        MediaFeatures(m.doc_id, n, sum % 1000000007L,
          (if (n > 0) hist.map(_ / n) else hist).toSeq)
      } }
    }
  }

  /** Average-hash perceptual fingerprint over the byte tier — the
    * pHash-shaped near-dup signature for media payloads: the payload
    * is cut into `bits` equal segments (integer boundaries
    * ⌊i·n/bits⌋), each segment reduces to its byte sum, and bit i
    * sets iff segment i's sum×bits exceeds the payload total
    * (integer cross-multiplication — no FP mean, so the oracle
    * replays it exactly). Same mapPartitions boundary as the codec
    * tiers; a real image pipeline would hash the decoded 8×8 luma
    * raster instead, with identical downstream plumbing.
    */
  def avgHash(media: Dataset[MediaRecord], bits: Int = 64)
      : DataFrame = {
    // one Long of hash: bits > 64 would silently alias via 1L << b
    require(bits >= 1 && bits <= 64,
      s"avgHash bits must be in [1, 64], got $bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // null payload = corrupt record → dropped (codec-tier contract)
      it.flatMap { m => Option(m.payload).map { bytes =>
        val n = bytes.length
        val seg = new Array[Long](bits)
        var i = 0
        var total = 0L
        while (i < n) {
          val s = (i.toLong * bits / n).toInt
          val u = (bytes(i) & 0xff).toLong
          seg(s) += u
          total += u
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < bits) {
          // bit b ⇔ mean(segment) > mean(payload), in integers:
          // seg·bits > total (segments have n/bits bytes up to
          // boundary rounding; the oracle replays the same rule)
          if (seg(b) * bits > total) hash |= (1L << b)
          b += 1
        }
        (m.doc_id, hash)
      } }
    }.toDF("doc_id", "phash")
  }

  /** REAL image decode via the JDK's bundled `javax.imageio` codecs
    * (PNG/JPEG/BMP/GIF). Per record: intrinsic dimensions plus mean
    * luma (ITU-R BT.601 integer weights over the ARGB raster — a
    * cheap deterministic content signal; a real pipeline would hand
    * the raster to an embedding model here). Undecodable payloads
    * are DROPPED — the corrupt-record channel, mirroring the
    * schema-validation error path (reference `task.ts:110` rejects
    * non-conforming input; V1 in SURVEY §2a).
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO scans its reader registry on first use — once per
      // partition here, then each payload reuses the codec.
      it.flatMap { m =>
        // NonFatal, not just IOException: ImageIO.read throws
        // RuntimeExceptions on some corrupt payloads (CMMException
        // on bad ICC profiles, AIOOBE on truncated JPEGs) and the
        // drop-corrupt-records contract must hold for those too
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          var lumaSum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              lumaSum += (299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
              x += 1
            }
            y += 1
          }
          Some(ImageMeta(m.doc_id, img.getWidth, img.getHeight,
            lumaSum.toDouble / (img.getWidth.toLong * img.getHeight)))
        }
      }
    }
  }

  /** REAL image resize: decode, area-scale onto a `targetW`×`targetH`
    * raster (bilinear), re-encode PNG — binary in, smaller binary
    * out, map-side, payload never shuffled. Runs headless
    * (BufferedImage + Graphics2D need no display).
    */
  def resizeImages(media: Dataset[MediaRecord], targetW: Int,
      targetH: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        // NonFatal: same drop-corrupt contract as decodeImages
        val img = try {
          javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(targetW, targetH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
          g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          Some(ResizedImage(m.doc_id, targetW, targetH, buf.toByteArray))
        }
      }
    }
  }

  /** Frame sampling: fixed-size byte windows every `stride` bytes —
    * the audio/video frame-extraction access pattern, expressed as a
    * codegen'd HOF over the binary column (no UDF).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
      stride: Int): DataFrame =
    media.toDF().select(col("doc_id"),
      posexplode(expr(
        s"""transform(
              sequence(0, greatest(cast(floor((octet_length(payload) - $frameBytes) / $stride) as int), 0)),
              i -> substring(payload, i * $stride + 1, $frameBytes))"""))
        .as(Seq("frame_no", "frame")))
      .filter(octet_length(col("frame")) === frameBytes)

  /** REAL audio decode via the JDK's bundled `javax.sound.sampled`
    * WAV/AIFF parsers (java.desktop, same zero-dependency tier as
    * [[decodeImages]]): per record, the format header (sample rate,
    * channels) plus full-signal RMS over the PCM16 samples — the
    * loudness signal an audio-curation pipeline filters on.
    * Undecodable payloads are DROPPED (the corrupt-record channel,
    * like decodeImages). Spec-verified (AudioCodecSpec synthesizes
    * WAVs with known sine content) — no SQL engine replays a codec.
    */
  /** Decode a WAV/AIFF payload to (format, raw PCM bytes), or None
    * for undecodable or non-16-bit payloads — the ONE corrupt-
    * record policy both audio tiers share (previously duplicated in
    * decodeWav and windowAudio, where a fix to one would silently
    * miss the other).
    */
  private def decodePcm16(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] = {
    // NonFatal, not just the two declared exception types: a NULL
    // payload (fromDocuments over a null text row) NPEs inside the
    // provider's header read, and a malformed header can throw any
    // RuntimeException — all of them are corrupt RECORDS, none may
    // kill the task (the decodeImages contract)
    val in = try {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
    if (in == null) None
    else {
      // the data read must sit under the same corrupt-record catch
      // as the header parse: a truncated-but-header-valid payload
      // throws HERE, and an unhandled throw kills the task, not the
      // record; close in finally so the failure path can't leak the
      // stream
      try {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        if (fmt.getSampleSizeInBits != 16) None
        else Some((fmt, bytes))
      } catch {
        case scala.util.control.NonFatal(_) => None
      } finally in.close()
    }
  }

  /** The i-th 16-bit sample in [-1, 1), honoring endianness. */
  private def pcm16Sample(bytes: Array[Byte], be: Boolean,
      i: Int): Double = {
    val lo = bytes(2 * i + (if (be) 1 else 0)) & 0xff
    val hi = bytes(2 * i + (if (be) 0 else 1))
    ((hi << 8) | lo).toShort / 32768.0
  }

  def decodeWav(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // AudioSystem provider lookup happens on first use — once per
      // partition, like the ImageIO registry scan.
      it.flatMap { m =>
        decodePcm16(m.payload).map { case (fmt, bytes) =>
          val be = fmt.isBigEndian
          val n = bytes.length / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val s = pcm16Sample(bytes, be, i)
            sumSq += s * s
            i += 1
          }
          // n_samples reports FRAMES (interleaved count / channels)
          // — "8000 samples of stereo" must not read as 16000; RMS
          // stays over all interleaved samples (total cross-channel
          // energy, channel-count invariant for balanced signals)
          val ch = math.max(fmt.getChannels, 1)
          AudioMeta(m.doc_id, fmt.getSampleRate.toInt,
            fmt.getChannels, n / ch,
            if (n == 0) 0.0 else math.sqrt(sumSq / n))
        }
      }
    }
  }

  /** REAL audio windowing — the frame-sample step for audio: split
    * the decoded PCM16 signal into `windowSamples`-sample windows
    * every `hopSamples` (the STFT/feature-extraction access
    * pattern), emitting per-window RMS and zero-crossing count (the
    * two classic cheap features; a real pipeline hands each window
    * to an FFT/encoder here). Decode and windowing both run inside
    * one mapPartitions — samples never cross a shuffle, windows
    * carry features only.
    */
  def windowAudio(media: Dataset[MediaRecord], windowSamples: Int,
      hopSamples: Int): Dataset[AudioWindow] = {
    require(windowSamples > 0 && hopSamples > 0,
      s"window/hop must be positive: $windowSamples/$hopSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodePcm16(m.payload) match {
          case None => Iterator.empty
          // mono only: windows and zero-crossings are SINGLE-SIGNAL
          // features — on interleaved stereo, "consecutive samples"
          // alternate channels and the crossing count is meaningless
          // (a real pipeline downmixes before windowing); emitting
          // silently-wrong numbers is worse than skipping the record
          case Some((fmt, _)) if fmt.getChannels != 1 => Iterator.empty
          case Some((fmt, bytes)) =>
            val be = fmt.isBigEndian
            val n = bytes.length / 2
            val starts = 0 to math.max(n - windowSamples, 0) by hopSamples
            starts.iterator.filter(_ + windowSamples <= n).zipWithIndex
              .map { case (s0, w) =>
                var sumSq = 0.0
                var zc = 0
                var i = s0
                var prev = 0.0
                while (i < s0 + windowSamples) {
                  val x = pcm16Sample(bytes, be, i)
                  sumSq += x * x
                  if (i > s0 && ((prev < 0 && x >= 0) ||
                      (prev >= 0 && x < 0))) zc += 1
                  prev = x
                  i += 1
                }
                AudioWindow(m.doc_id, w, s0,
                  math.sqrt(sumSq / windowSamples), zc)
              }
        }
      }
    }
  }

  /** STUB resize (the image/audio "downsample to target resolution"
    * step): keep every `factor`-th byte — a deterministic decimation
    * standing in for a real resampler, with the production shape
    * (binary in → smaller binary out, map-side, payload never
    * shuffled). Returns the resized payload plus before/after sizes.
    *
    * ASCII-payload contract (same as the phash oracle's, documented
    * there too): the checksum reads each kept byte through
    * `ascii(cast(b as string))`, which decodes the byte as UTF-8 —
    * exact for payloads whose bytes are all < 0x80 (this tier's
    * domain: `fromDocuments` text), 65533-aliased above it, where
    * DuckDB's blob→varchar cast errors instead. A binary tier for
    * real media bytes belongs in the codec functions
    * ([[decodeImages]] etc.), not this oracle-portable stub.
    */
  def resize(media: Dataset[MediaRecord], factor: Int): DataFrame =
    media.toDF().select(col("doc_id"),
      octet_length(col("payload")).as("orig_bytes"),
      // empty payload: sequence(1, 0, f) throws ("Illegal sequence
      // boundaries") — emit an empty kept-array instead, so a 0-byte
      // record resizes to a 0-byte record rather than killing the job
      expr(
        s"""CASE WHEN octet_length(payload) = 0 THEN array()
            ELSE transform(
              sequence(1, octet_length(payload), $factor),
              i -> substring(payload, i, 1)) END""").as("kept"))
      .select(col("doc_id"), col("orig_bytes"),
        expr("array_size(kept)").cast("int").as("resized_bytes"),
        expr("aggregate(kept, 0L, (acc, b) -> acc + ascii(cast(b as string)))")
          .as("resized_sum"))
}
