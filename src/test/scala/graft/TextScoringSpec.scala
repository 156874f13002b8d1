package graft

/** Semantic gates for the per-source readability audit and the
  * fixed-weight logistic quality classifier (oracle row-hashes check
  * values; these check the invariants the hashes don't state).
  */
class TextScoringSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_text_readability: bounds and aggregate consistency") {
    val rows = q("q_text_readability").collect()
    assert(rows.nonEmpty)
    val nDocs = Tables(spark, sf(), "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "sources must partition the corpus")
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_flesch")
      val lo = r.getAs[Double]("min_flesch")
      val hi = r.getAs[Double]("max_flesch")
      assert(lo <= hi, s"min > max: $r")
      // the mean sits within the per-source range (± rounding ulp)
      assert(avg >= lo - 5e-5 && avg <= hi + 5e-5,
        s"avg outside [min,max]: $r")
    }
  }

  test("q_text_zipf_fit: negative slope, R² in range") {
    val r = q("q_text_zipf_fit").collect().head
    // capped at 100; the sf0.001 synthetic vocabulary is smaller
    assert(r.getAs[Long]("n_ranks") >= 10 &&
      r.getAs[Long]("n_ranks") <= 100)
    assert(r.getAs[Double]("zipf_slope") < 0,
      "rank-frequency slope must be negative")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0 && r2 <= 1.0 + 1e-9)
  }

  test("q_text_hapax: hapax bounded by vocabulary") {
    val rows = q("q_text_hapax").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val types = r.getAs[Long]("n_types")
      val hapax = r.getAs[Long]("n_hapax")
      assert(hapax <= types)
      assert(r.getAs[Long]("n_tokens") >= types,
        "token count can't be below type count")
      val ratio = r.getAs[Double]("hapax_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // non-degeneracy: every bound above holds by construction of any
    // (source, word) rollup. The synthetic corpus has a small
    // vocabulary where every word repeats (zero hapaxes is the
    // CORRECT answer), so pin the repeat side: a tokenizer
    // regression that makes tokens unique (offsets/punctuation glued
    // on) turns every type into a hapax and n_tokens == n_types —
    // both must fail (values themselves are pinned by the oracle)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") < r.getAs[Long]("n_types"),
        s"every type a hapax — tokenizer degenerate: $r")
      assert(r.getAs[Long]("n_tokens") > r.getAs[Long]("n_types"),
        s"no repeated token anywhere — tokenizer degenerate: $r")
    }
  }

  test("q_quality_logistic: sigmoid bounds, keep-count consistency") {
    val rows = q("q_quality_logistic").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val keep = r.getAs[Long]("n_keep")
      val rate = r.getAs[Double]("keep_rate")
      val score = r.getAs[Double]("avg_score")
      assert(keep >= 0 && keep <= n)
      assert(math.abs(rate - keep.toDouble / n) < 5e-5,
        s"keep_rate inconsistent with counts: $r")
      assert(score > 0.0 && score < 1.0,
        s"mean sigmoid must stay strictly inside (0,1): $r")
    }
    // non-degeneracy: the gate must actually separate the corpus —
    // a threshold or weight regression that keeps everything (or
    // nothing) passes every bound above (exact scores are pinned by
    // the DuckDB oracle)
    val keeps = rows.map(_.getAs[Long]("n_keep")).sum
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(keeps > 0 && keeps < docs,
      s"keep gate degenerate: $keeps of $docs kept")
  }
}
