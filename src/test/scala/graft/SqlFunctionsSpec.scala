package graft

import graft.plans.Sketches

/** The native expressions registered into the SQL front-end
  * (SparkSessionExtensions-style function injection, done at runtime
  * via the function registry).
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim / simhash64 / minhash_sig callable from spark.sql") {
    Sketches.registerSql(spark)
    Tables.registerViews(spark, sf())
    val cos = spark.sql("""
      SELECT cosine_sim(a.embedding, b.embedding) AS c
      FROM embeddings a JOIN embeddings b
        ON a.vec_id = 1 AND b.vec_id = 2""").as[Double].head()
    assert(cos > -1.0 && cos < 1.0 && !cos.isNaN)
    val (sh, mh) = spark.sql("""
      SELECT simhash64(split(text, ' ')) AS sh,
             minhash_sig(split(text, ' '), 4) AS mh
      FROM documents WHERE doc_id = 0""")
      .as[(Long, Seq[Long])].head()
    assert(mh.size == 4)
    assert(sh != 0L)
    // SQL results agree with the Column API
    import org.apache.spark.sql.functions._
    val viaApi = Tables(spark, sf(), "documents")
      .filter(col("doc_id") === 0)
      .select(Sketches.simhash64(split(col("text"), " ")))
      .as[Long].head()
    assert(sh == viaApi)
  }
}
