package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines: seeded, reproducible,
  * executor-deterministic (Bernoulli per row keyed on seed +
  * partition — the same rows are chosen on every rerun over the same
  * layout, with no shuffle and no driver-side state).
  */
object Sampling {

  /** Uniform Bernoulli sample. */
  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Stratified sample: per-stratum fractions (e.g. downsample the
    * dominant language, keep all of the rare ones).
    */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic hash split — train/validation/test assignment that
    * is stable across reruns AND across engines (pure function of the
    * id, no RNG): bucket = pmod(hash(id), 100).
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int, validPct: Int): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol)), lit(100))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test"))
  }
}
