package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** md5-derived bucket in [0, buckets): the first 8 hex chars parsed
    * as an unsigned 32-bit value, mod buckets. md5 is bit-identical in
    * every engine (unlike xxhash64/murmur seeds), so assignments can
    * be recomputed in SQL anywhere — the property a training pipeline
    * needs for dataset versioning.
    */
  def md5Bucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic hash split — train/validation/test assignment that
    * is stable across reruns AND across engines (pure function of the
    * id, no RNG): bucket = md5Bucket(id, 100).
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int, validPct: Int): DataFrame = {
    val bucket = md5Bucket(col(idCol), 100)
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic stratified sample: per-stratum keep-fractions with
    * an md5 Bernoulli trial per row — same survivors on every rerun
    * and every engine (the RNG [[stratified]] can't promise either).
    * Rows whose stratum has no entry are dropped.
    */
  def hashStratified(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val bucket = md5Bucket(col(idCol), 10000)
    val thresh = fractions.foldLeft(lit(-1): Column) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * 10000).toInt)).otherwise(acc)
    }
    df.filter(bucket < thresh)
  }
}
