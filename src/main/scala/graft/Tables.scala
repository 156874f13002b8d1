package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Scale note: `spark.read.parquet` is a DataSource V2 scan — Catalyst
  * pushes filters (`PushedFilters`) and prunes columns (`ReadSchema`)
  * into the parquet reader automatically, so every query below only
  * pays for the columns/row-groups it touches. At 100 TB the same call
  * works unchanged over a partitioned directory layout; partition
  * pruning composes with the same mechanism.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Some driver generations write events.ts as parquet
    // TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp;
    // with nanosAsLong=true it arrives as raw int64 nanos, which we
    // truncate to micros (identical to DuckDB's ns→µs handling).
    // Newer generations write TIMESTAMP(MICROS) directly — then the
    // column is already a timestamp and passes through untouched.
    // Handling both keeps the loader immune to the testdata's
    // timestamp flavor; production data would store µs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so queries can also be
    * expressed via `spark.sql` (exercised by the GROUPING SETS query).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
