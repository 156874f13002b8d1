package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Similarity-search operators: the two exact formulations must agree
  * row-for-row; the LSH ANN is gated on measured recall against the
  * brute-force truth (it has no SQL oracle).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf(), "embeddings")
  private lazy val qs = emb.filter($"vec_id" < 5)

  private def asTriples(df: org.apache.spark.sql.DataFrame) =
    df.select($"q_id", $"rank", $"id").as[(Long, Int, Long)]
      .collect().toSet

  test("topKAggregated produces exactly the brute-force result") {
    val brute = asTriples(
      Similarity.topKBruteForce(emb, qs, "vec_id", "embedding", 5))
    val agged = asTriples(
      Similarity.topKAggregated(emb, qs, "vec_id", "embedding", 5))
    assert(brute.nonEmpty)
    assert(agged == brute)
  }

  test("LSH ANN: exact precision on returned pairs, useful recall") {
    val k = 5
    val brute = Similarity
      .topKBruteForce(emb, qs, "vec_id", "embedding", k)
      .select($"q_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = Similarity
      .annLsh(emb, qs, "vec_id", "embedding", k)
      .select($"q_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      (ann.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"ANN recall@$k = $mean%.2f over ${recalls.size} queries")
    // random 64-d gaussian-ish corpus: neighbors sit near 60-75° so
    // per-table collision is weak; 8 tables x 4 bits keeps recall
    // usable while pruning most of the corpus
    assert(mean >= 0.4, f"recall collapsed: $mean%.2f")
  }

  test("IVF ANN: exact precision, useful recall, sub-linear candidates") {
    val k = 5
    val brute = Similarity
      .topKBruteForce(emb, qs, "vec_id", "embedding", k)
      .select($"q_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity
      .annIvf(emb, qs, "vec_id", "embedding", k, nCells = 16, nProbe = 4)
      .select($"q_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.map { case (q, truth) =>
      (ivf.getOrElse(q, Set.empty) & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF recall@$k = $mean%.2f over ${recalls.size} queries")
    assert(mean >= 0.35, f"recall collapsed: $mean%.2f")
    // candidate space: nProbe/nCells of the corpus per query (±skew)
    val n = emb.count() - 1
    val scored = Similarity
      .annIvf(emb, qs, "vec_id", "embedding", Int.MaxValue,
        nCells = 16, nProbe = 4).count()
    assert(scored < 5 * n,
      s"IVF scored $scored pairs — no better than brute force")
  }

  test("IVF assigns every vector to exactly one cell") {
    // probing ALL cells must return every non-self vector exactly once
    val all = Similarity
      .annIvf(emb, qs, "vec_id", "embedding", Int.MaxValue,
        nCells = 16, nProbe = 16)
      .groupBy($"q_id").count().as[(Long, Long)].collect().toMap
    val n = emb.count() - 1
    assert(all.values.forall(_ == n), s"expected $n candidates/query: $all")
  }

  test("LSH ANN actually prunes the candidate space") {
    // bucket join must score fewer pairs than brute force would
    val n = emb.count() - 1
    val scoredPairs = Similarity
      .annLsh(emb, qs, "vec_id", "embedding", 500, tables = 8,
        bitsPerTable = 4)
      .count() // rank<=500 ≈ all candidates kept
    assert(scoredPairs < 5 * n,
      s"LSH scored $scoredPairs pairs — no better than brute force")
  }
}
