package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Sampling operators: reproducibility and statistical sanity (no
  * SQL oracle — RNG streams are engine-specific; the hash split is a
  * pure function so its gate is exactness + completeness).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("0.01"), "documents")

  test("seeded sampling is reproducible run-to-run") {
    def ids(seed: Long) = Sampling.uniform(docs, 0.3, seed)
      .select("doc_id").as[Long].collect().toSet
    assert(ids(42) == ids(42))
    assert(ids(42) != ids(43), "different seeds should differ")
  }

  test("stratified sample hits per-stratum fractions within tolerance") {
    val fractions = Map("en" -> 0.8, "es" -> 0.2, "de" -> 0.5,
      "fr" -> 0.5, "zh" -> 0.5)
    val totals = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sampled = Sampling.stratified(docs, "lang", fractions, 42L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    fractions.foreach { case (lang, f) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - f) < 0.2, f"$lang: got $got%.2f want $f")
    }
  }

  test("hash split is exhaustive, disjoint, deterministic, ~80/10/10") {
    val split = Sampling.hashSplit(docs, "doc_id", 80, 10)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = docs.count()
    assert(counts.values.sum == total)
    // all THREE shares: checking train alone let a split that empties
    // the valid bucket (e.g. a dropped trainPct offset sending every
    // non-train row to test) pass as "~80/10/10"
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.1)
    assert(math.abs(counts.getOrElse("valid", 0L).toDouble / total
      - 0.1) < 0.07, s"valid share off: $counts")
    assert(math.abs(counts.getOrElse("test", 0L).toDouble / total
      - 0.1) < 0.07, s"test share off: $counts")
    // same doc always lands in the same split
    val a = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    val b = Sampling.hashSplit(docs, "doc_id", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
