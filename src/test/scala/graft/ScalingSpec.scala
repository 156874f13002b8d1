package graft

import graft.operators.Dedup

/** Empirical scaling evidence across REAL scale factors (sf0.01 →
  * sf0.1, a 10× corpus): the 100 TB dedup path (MinHash-LSH —
  * constant sketch per doc, band-key join) must shuffle ~linearly in
  * the corpus, while the exact inverted-index join's match stream
  * grows with the sum of squared shingle document-frequencies —
  * fine at moderate scale, the reason LSH exists beyond it. Both
  * measured from task metrics, not argued.
  */
class ScalingSpec extends SparkSpec {

  test("minhash-LSH shuffle grows ~linearly over a 10× corpus; exact jaccard superlinearly") {
    def minhash(d: String): Long = shuffledRecords(
      Dedup.minhashLshPairs(Tables(spark, sf(d), "documents"),
        "doc_id", "text", 3, 128, 32, 0.5).count())
    def jaccard(d: String): Long = shuffledRecords(
      Dedup.jaccardShinglePairs(Tables(spark, sf(d), "documents"),
        "doc_id", "text", 3, 0.5).count())
    val (mhSmall, mhBig) = (minhash("0.01"), minhash("0.1"))
    val (jcSmall, jcBig) = (jaccard("0.01"), jaccard("0.1"))
    val mhGrowth = mhBig.toDouble / mhSmall
    val jcGrowth = jcBig.toDouble / jcSmall
    info(f"10× corpus: minhash shuffle ×$mhGrowth%.1f " +
      f"($mhSmall → $mhBig rows), jaccard ×$jcGrowth%.1f " +
      f"($jcSmall → $jcBig rows)")
    assert(mhSmall > 0 && jcSmall > 0)
    // linear ±3×: band keys per doc are constant
    assert(mhGrowth < 30, f"minhash shuffle superlinear: ×$mhGrowth%.1f")
    // the exact path's quadratic term must be visible in comparison
    assert(jcGrowth > mhGrowth,
      f"expected jaccard (×$jcGrowth%.1f) to outgrow minhash (×$mhGrowth%.1f)")
  }
}
