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

/** Multimodal-column plumbing: binary payloads, typed partition-wise
  * decode, frame sampling.
  *
  * The decode step is a STUB: the real image/audio codecs are not in
  * this container, so [[extractFeatures]] computes a deterministic
  * fake featurization (byte histogram + checksum) standing in for
  * "decode → embed". Everything around it — the `binary` column
  * schema, the typed `mapPartitions` boundary (where a real codec
  * would be invoked once per partition with batched I/O), the
  * fixed-size feature vector shape — is the real production plumbing
  * and is tested.
  *
  * Scale notes: `mapPartitions` amortizes codec initialization per
  * partition (not per row); payload bytes never cross a shuffle —
  * features are extracted before any wide op. Frame sampling is a
  * codegen'd HOF over the binary column, so exploding frames happens
  * scan-side too.
  */
object Multimodal {

  /** Model `documents` as a media table: utf-8 payload bytes. */
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
      // partition, then stream the batch through it.
      it.map { m =>
        val bytes = m.payload
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

  /** STUB resize (the image/audio "downsample to target resolution"
    * step): keep every `factor`-th byte — a deterministic decimation
    * standing in for a real resampler, with the production shape
    * (binary in → smaller binary out, map-side, payload never
    * shuffled). Returns the resized payload plus before/after sizes.
    */
  def resize(media: Dataset[MediaRecord], factor: Int): DataFrame =
    media.toDF().select(col("doc_id"),
      octet_length(col("payload")).as("orig_bytes"),
      expr(
        s"""transform(
              sequence(1, octet_length(payload), $factor),
              i -> substring(payload, i, 1))""").as("kept"))
      .select(col("doc_id"), col("orig_bytes"),
        expr("array_size(kept)").cast("int").as("resized_bytes"),
        expr("aggregate(kept, 0L, (acc, b) -> acc + ascii(cast(b as string)))")
          .as("resized_sum"))
}
