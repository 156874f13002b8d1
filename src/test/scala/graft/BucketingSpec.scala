package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Co-located joins via bucketing: both sides bucketed by the join
  * key join WITHOUT a shuffle — the repeated-fact-join strategy at
  * 100 TB (pay the partitioning once at write time, every subsequent
  * join is exchange-free).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans no hash-partitioning exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables(spark, sf("0.001"), "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    Tables(spark, sf("0.001"), "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("b_customer")
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withoutAqe {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // specifically a shuffle-class equi-join (the old
      // `|| contains("Join")` disjunct was satisfied by any join
      // node, including a degenerate nested-loop)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      // the downstream groupBy(c_mktsegment) legitimately shuffles;
      // the JOIN KEYS must not — bucketing satisfies the join's
      // distribution requirement directly
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join should not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // and it still computes the right thing
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n == Tables(spark, sf("0.001"), "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("q_join_bucketed: zero exchange and zero sort on both join sides") {
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // since Spark 3.1 the scan only reports the in-bucket sort order
    // (one sorted file per bucket) behind this flag — without it the
    // join stays exchange-free but re-sorts each bucket
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    try withoutAqe {
      val df = graft.queries.JoinExtQueries
        .defs("q_join_bucketed")(spark, sf("0.001"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      // neither join input shuffles: the 8-bucket layout satisfies
      // the sort-merge join's distribution requirement from storage
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and with ONE sorted file per bucket the scan satisfies the
      // ordering requirement too: no per-side SortExec below the join
      val joinSorts = "Sort \\[[lo]_orderkey".r.findAllIn(plan).size
      assert(joinSorts == 0, s"expected sort-free bucketed join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf
        .unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("stored LSH index: ingest matches with zero corpus-side shuffle, flat in corpus size") {
    // The storage half of Dedup.minhashLshIncremental's 100 TB claim:
    // the corpus's band-key index, written ONCE bucketed by a 64-bit
    // key of (band, band_key), is matched by each new batch with no
    // exchange on the index side — only the (small) batch shuffles.
    // Measured: the ingest's shuffle volume must not grow when the
    // indexed corpus grows 10×.
    // the stored form narrows (band, band_key) to one 64-bit key:
    // candidate generation tolerates the ~2^-64 cross-bucket
    // collision rate (exact-Jaccard verification follows), and an
    // 8-byte key beats a 4-slot array in storage and shuffle width
    def bandRows(docs: org.apache.spark.sql.DataFrame) =
      Dedup.lshBandKeys(docs, "doc_id", "text", 3, 128, 32)
        .select(col("id"), xxhash64(col("band"), col("band_key")).as("bk"))
    def disjoint(copies: Int) = {
      val base = Tables(spark, sf("0.01"), "documents")
        .select(col("doc_id"), col("text"))
      (0 until copies).map { c =>
        base.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
          concat(lit(s"${c}y"),
            regexp_replace(col("text"), " ", s" ${c}y")).as("text"))
      }.reduce(_ union _)
    }
    // batch vocabulary is disjoint from every salted corpus copy, so
    // candidates ≈ 0 and the measurement isolates the ingest shuffle
    val batch = bandRows(Tables(spark, sf("0.01"), "documents"))
      .withColumnRenamed("id", "b_id")
    def candidates(table: String) =
      spark.table(table).join(batch, "bk")
        .select(col("b_id").as("new_id"), col("id").as("corpus_id"))
        .distinct()
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq(1 -> "d_lsh_idx1", 10 -> "d_lsh_idx10").foreach { case (c, t) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        bandRows(disjoint(c)).write.mode("overwrite")
          .bucketBy(8, "bk").sortBy("bk").saveAsTable(t)
      }
      val plan = withoutAqe {
        candidates("d_lsh_idx10").queryExecution.executedPlan.toString
      }
      assert(plan.contains("Bucketed: true"), plan)
      // exactly one hash exchange feeding the join: the batch side;
      // the bucketed index satisfies the distribution from storage
      val joinExchanges = "Exchange hashpartitioning\\(bk".r
        .findAllIn(plan).size
      assert(joinExchanges == 1,
        s"expected only the batch side to shuffle on bk:\n$plan")
      val small = shuffledRecords { candidates("d_lsh_idx1").count() }
      val big = shuffledRecords { candidates("d_lsh_idx10").count() }
      info(f"ingest shuffle: $small rows vs 1× corpus, $big vs 10×")
      assert(big <= small * 1.5 + 100,
        s"ingest shuffle grew with corpus size: $small → $big")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS d_lsh_idx1")
      spark.sql("DROP TABLE IF EXISTS d_lsh_idx10")
    }
  }
}
