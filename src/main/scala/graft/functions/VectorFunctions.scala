package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, expressed as
  * codegen'd higher-order functions (no UDF). Floats are widened to
  * double and accumulated sequentially left→right, so results are
  * bit-deterministic and engine-reproducible (the DuckDB oracles use
  * the literally identical formula — DuckDB's builtin
  * `list_cosine_similarity` accumulates in float32 and does NOT
  * match; see TextQueries oracle SQL).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column = dot(a, a)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity — parenthesized as dot / sqrt(na*nb); keep
    * this exact shape in any oracle SQL for bit-identical results.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)
}
