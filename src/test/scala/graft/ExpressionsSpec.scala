package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.plans.{CosineSimExpr, Sketches}

/** Native Catalyst expressions vs their HOF reference formulations. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf(), "embeddings")
  private lazy val docs = Tables(spark, sf(), "documents")

  test("native cosine is bit-identical to the HOF reference (and the oracle)") {
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(
        CosineSimExpr.cosine_native(col("a.embedding"), col("b.embedding"))
          .as("native"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding"))
          .as("hof"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("native cosine participates in whole-stage codegen") {
    val p = withoutAqe {
      emb.as("a").join(emb.as("b"),
          col("a.vec_id") + 1 === col("b.vec_id"))
        .select(CosineSimExpr.cosine_native(col("a.embedding"),
          col("b.embedding")).as("c"))
        .queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
    }
    // the generated code must contain our fused loop (not a
    // CodegenFallback reflective call)
    assert(p.contains("WholeStageCodegen"), p.take(500))
    assert(p.contains("Math.sqrt"), s"fused loop not generated:\n${p.take(800)}")
  }

  test("sketch expressions are deterministic across evaluations") {
    def sketchRun(): Map[Long, (Long, Seq[Long])] =
      docs.select($"doc_id",
        Sketches.simhash64(TextFunctions.wordShingles($"text", 3)).as("sh"),
        Sketches.minhashSignature(
          TextFunctions.wordShingles($"text", 3), 16).as("mh"))
        .as[(Long, Long, Seq[Long])].collect()
        .map { case (id, sh, mh) => id -> (sh, mh) }.toMap
    val r1 = sketchRun()
    val r2 = sketchRun()
    assert(r1 == r2)
    assert(r1.nonEmpty)
    // signatures vary across docs (the hash family isn't degenerate)
    assert(r1.values.map(_._1).toSet.size > r1.size / 2)
  }

  test("native shingles == HOF reference shingles on the corpus") {
    val cmp = docs.select(
      TextFunctions.wordShingles($"text", 3).as("native"),
      TextFunctions.wordShinglesHof($"text", 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    assert(cmp.nonEmpty)
    cmp.foreach { case (n, h) => assert(n == h) }
    // short-input edge: fewer than n tokens → empty
    val edge = Seq("a b", "", "one two three").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 3).as("s"),
        TextFunctions.wordShinglesHof(col("text"), 3).as("h"))
      .as[(Seq[String], Seq[String])].collect()
    edge.foreach { case (n, h) => assert(n == h) }
    assert(edge(2)._1 == Seq("one two three"))
  }

  test("minhash signature slot count and empty-input behavior") {
    val sig = Seq(("a b", 0)).toDF("text", "pad")
      .select(Sketches.minhashSignature(
        TextFunctions.wordShingles(col("text"), 3), 8).as("sig"))
      .as[Seq[Long]].head()
    // "a b" has <3 tokens → empty shingle set → MaxValue slots
    assert(sig == Seq.fill(8)(Long.MaxValue))
  }
}
