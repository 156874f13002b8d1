package graft

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: deterministic stub decode and
  * frame sampling (SURVEY.md north-star extension; the decode itself
  * is a documented stub — the schema/partitioning/batch shape are
  * what's under test).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.fromDocuments(Tables(spark, sf(), "documents"))

  test("payload bytes round-trip the source text") {
    val (text, payload) = Tables(spark, sf(), "documents")
      .select("text").as[String].head() ->
      media.head().payload
    assert(new String(payload, "UTF-8") == text)
  }

  test("corpus contract: documents.text is ASCII (phash oracle)") {
    // the q_multimodal_phash / q_multimodal_decode oracles hash
    // CODEPOINTS while avgHash hashes UTF-8 BYTES — equal only for
    // ASCII. Pin the contract so a non-ASCII corpus fails loudly
    // here instead of as a silent oracle divergence.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables(spark, sf(), "documents")
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii non-ASCII documents break the byte==codepoint " +
        "contract the phash oracle relies on")
  }

  test("null payloads are dropped by every byte tier, not task-fatal") {
    import graft.operators.MediaRecord
    // fromDocuments over a null text row yields payload = null
    // (encode(null) is null) — one corrupt record must not kill a
    // 100 TB pass in any tier
    val recs = Seq(
      MediaRecord(1L, "text/plain", "hello world".getBytes("UTF-8")),
      MediaRecord(2L, "text/plain", null)).toDS()
    assert(Multimodal.extractFeatures(recs).collect()
      .map(_.doc_id).toSeq == Seq(1L))
    assert(Multimodal.avgHash(recs).select($"doc_id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(Multimodal.decodeWav(recs).collect().map(_.doc_id).isEmpty)
    assert(Multimodal.windowAudio(recs, 4, 2).collect().isEmpty)
  }

  test("feature extraction is deterministic and shape-stable") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.feat.size == 16))
    // histogram is a distribution over byte buckets
    assert(f1.forall(f => math.abs(f.feat.sum - 1.0) < 1e-9))
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("frame sampling yields fixed-size overlapping windows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 32)
    val byDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val lens = Tables(spark, sf(), "documents")
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS n")
      .as[(Long, Int)].collect().toMap
    // every doc long enough for one frame MUST appear — iterating
    // only over byDoc would let silent per-doc dropout pass
    assert(byDoc.keySet == lens.filter(_._2 >= 64).keySet,
      s"docs dropped or invented by the sampler: " +
        s"${byDoc.keySet.diff(lens.keySet)} / " +
        s"${lens.filter(_._2 >= 64).keySet.diff(byDoc.keySet)}")
    byDoc.foreach { case (id, n) =>
      assert(n == (lens(id) - 64) / 32 + 1, s"doc $id")
    }
    // every frame is exactly frameBytes long
    val distinctLens = frames.selectExpr("octet_length(frame)")
      .distinct().as[Int].collect().toSeq
    assert(distinctLens == Seq(64))
  }

  test("resize keeps every factor-th byte") {
    val media = Multimodal.fromDocuments(
      Tables(spark, sf(), "documents").limit(20))
    val resized = Multimodal.resize(media, factor = 4)
      .as[(Long, Int, Int, Long)].collect()
    val texts = Tables(spark, sf(), "documents").limit(20)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    assert(resized.nonEmpty)
    resized.foreach { case (id, orig, kept, sum) =>
      val t = texts(id)
      val expected = t.indices.collect { case i if i % 4 == 0 => t(i) }
      assert(orig == t.length)
      assert(kept == expected.size, s"doc $id")
      assert(sum == expected.map(_.toLong).sum, s"doc $id")
    }
  }

  test("q_multimodal_phash: planted copies surface at hamming 0") {
    val rows = SparkEntry.queries("q_multimodal_phash")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("hamming") <= 3)
    }
    // every planted exact copy (id < 20 duplicated at id+offset,
    // offset = max(doc_id)+1 in-plan) must be found with hamming 0 —
    // identical bytes, identical hash
    val found = rows.filter(r => r.getAs[Long]("hamming") == 0L)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val off = Tables(spark, sf(), "documents")
      .agg(org.apache.spark.sql.functions
        .max(org.apache.spark.sql.functions.col("doc_id")))
      .head().getLong(0) + 1
    val planted = Tables(spark, sf(), "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(found.contains((id, id + off)),
        s"planted copy pair ($id, ${id + off}) missed")
    }
  }
}
