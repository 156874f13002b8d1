package graft

import graft.operators.{ImageMeta, MediaRecord, Multimodal}

/** REAL image decode/resize through the JDK's bundled javax.imageio
  * codecs (see Multimodal docs): PNGs with known pixel content are
  * synthesized in-test, pushed through the Dataset[MediaRecord]
  * plumbing as binary columns, and the decoded metadata is asserted
  * exactly. This is the gate that the multimodal decode tier is no
  * longer a stub for image payloads.
  */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  /** A w×h PNG whose every pixel is the given RGB. */
  private def flatPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def records: Seq[MediaRecord] = Seq(
    MediaRecord(1L, "image/png", flatPng(8, 4, 0xffffff)),   // white
    MediaRecord(2L, "image/png", flatPng(16, 16, 0x000000)), // black
    MediaRecord(3L, "image/png", flatPng(3, 5, 0xff0000)),   // red
    MediaRecord(4L, "application/octet-stream",
      Array[Byte](1, 2, 3, 4, 5)))                            // corrupt

  test("decodeImages: real dimensions and luma; corrupt rows dropped") {
    val got = Multimodal.decodeImages(records.toDS())
      .collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(1L, 2L, 3L),
      "corrupt payload must be dropped, decodables kept")
    assert(got(0) == ImageMeta(1L, 8, 4, 255.0))
    assert(got(1) == ImageMeta(2L, 16, 16, 0.0))
    // red: (299*255)/1000 integer-divided = 76
    assert(got(2) == ImageMeta(3L, 3, 5, 76.0))
  }

  test("resizeImages: target raster round-trips through a real re-encode") {
    val resized = Multimodal
      .resizeImages(records.toDS(), targetW = 4, targetH = 4)
      .collect().sortBy(_.doc_id)
    assert(resized.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    resized.foreach { r =>
      assert(r.width == 4 && r.height == 4)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(back.getWidth == 4 && back.getHeight == 4,
        s"re-decoded dims wrong for doc ${r.doc_id}")
    }
    // flat images stay flat under bilinear resampling: every pixel of
    // the resized white image is still white, red still red
    val backWhite = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).payload))
    assert((backWhite.getRGB(2, 2) & 0xffffff) == 0xffffff)
    val backRed = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(2).payload))
    assert((backRed.getRGB(1, 1) & 0xffffff) == 0xff0000)
  }

  test("decode composes with the binary-column pipeline on documents") {
    // mixed corpus: real PNGs + text payloads through the SAME
    // MediaRecord plumbing — only images survive the decode stage
    val docsAsMedia = Multimodal
      .fromDocuments(Tables(spark, sf("0.001"), "documents").limit(50))
    val mixed = docsAsMedia.union(records.toDS())
    val metas = Multimodal.decodeImages(mixed).collect()
    assert(metas.map(_.doc_id).sorted.toSeq == Seq(1L, 2L, 3L),
      "text payloads must fall out of the image decode path")
  }

  test("resize handles a zero-length payload (no sequence crash)") {
    val empty = MediaRecord(99L, "text", Array.emptyByteArray)
    val out = Multimodal.resize(Seq(empty).toDS(), factor = 4)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("orig_bytes") == 0)
    assert(out.head.getAs[Int]("resized_bytes") == 0)
  }
}
