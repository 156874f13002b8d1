package graft

import org.apache.spark.sql.functions._

/** Gates for the data-quality family (QualityQueries) and the
  * chunking operator: plan shapes that make them scale (single scan
  * for the profile, equi-join — never cartesian — for linkage) and
  * the semantic invariants an oracle row-hash alone doesn't state
  * (chunk coverage/overlap, planted-corruption recovery, z-score
  * windows need full history).
  */
class QualitySpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_profile_columns: five columns profiled in ONE table scan") {
    val p = withoutAqe(q("q_profile_columns")
      .queryExecution.executedPlan.toString)
    val scans = p.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$p")
    assert(p.contains("Expand"),
      s"multi-distinct should plan via Expand (one pass):\n$p")
  }

  test("q_profile_columns: totals are consistent per column") {
    val rows = q("q_profile_columns").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val nulls = r.getAs[Long]("n_nulls")
      val nd = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nd >= 1 && nd <= n - nulls,
        s"inconsistent profile row: $r")
      assert(r.getAs[String]("min_val") <= r.getAs[String]("max_val"))
    }
  }

  test("q_chunk_sliding: chunks cover every token exactly once per stride") {
    // Reassembling chunk 0 + the tail (size−stride = last 16 dropped)
    // of every later chunk must reproduce the document verbatim —
    // the coverage/overlap contract of a stride-48/size-64 chunker.
    val docs = graft.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val piece = when(col("chunk_id") === 0, col("chunk_text"))
      .otherwise(array_join(
        slice(split(col("chunk_text"), " "), 17, 10000), " "))
    val re = q("q_chunk_sliding")
      .select(col("doc_id"), struct(col("chunk_id"), piece.as("p"))
        .as("cp"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(col("cp"))),
        x => x.getField("p")), " ").as("rebuilt"))
    val bad = re.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(bad == 0, s"$bad docs fail chunk-reassembly")
  }

  test("q_chunk_sliding: every chunk is at most 64 tokens and non-empty") {
    val agg = q("q_chunk_sliding")
      .agg(max(col("chunk_tokens")).as("mx"), min(col("chunk_tokens")).as("mn"),
        max(when(col("chunk_id") === 0, col("chunk_tokens"))).as("c0mx"))
      .head()
    assert(agg.getAs[Int]("mx") <= 64 && agg.getAs[Int]("mn") >= 1)
    assert(agg.getAs[Int]("c0mx") <= 64)
  }

  test("q_entity_resolution: plan is a blocked equi-join, no cartesian") {
    val p = withoutAqe(q("q_entity_resolution")
      .queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"),
      s"linkage fell back to all-pairs:\n$p")
    // the candidate-pair join must be HASH on the blocking key; the
    // only nested-loop joins allowed are the one-row variant-offset
    // broadcasts (they carry the `off` column, never a p_name pair)
    assert(p.contains("HashJoin [block"),
      s"pair join is not a hash join on block:\n$p")
    val nlj = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nlj.forall(_.contains("off")),
      s"unexpected nested-loop join beyond the offset attach:\n$p")
  }

  test("q_entity_resolution: recovers every planted corruption at dist 1") {
    val part = graft.Tables(spark, sf(), "part")
    val nNames = part.select("p_name").distinct().count()
    // Same in-plan derivation as the query: next multiple of 10^6
    // above the max dictionary id (min p_partkey per name).
    val off = (part.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("id"))
      .agg(max("id")).head().getLong(0) / 1000000L + 1L) * 1000000L
    val rows = q("q_entity_resolution")
      .filter(col("id_a") === col("id_b") - off)
      .collect()
    assert(rows.length.toLong == nNames,
      s"expected $nNames planted matches (one per distinct name), " +
        s"got ${rows.length}")
    assert(rows.forall(_.getAs[Int]("dist") == 1))
  }

  test("q_drift_psi: PSI is non-negative; period totals partition the table") {
    // each term (p−q)·ln(p/q) is individually ≥ 0 (p, q > 0 and the
    // factors share sign), so any negative PSI means the arithmetic
    // broke; the two period totals must partition each type's rows
    val rows = q("q_drift_psi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0, s"${r.getString(0)}: negative PSI $psi")
      // rule of thumb the audit exists for: flag only real drift
      assert(psi < 25, s"${r.getString(0)}: PSI $psi out of any range")
    }
    val totals = graft.Tables(spark, sf(), "events")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")
        == totals(r.getString(0)),
        s"${r.getString(0)}: periods do not partition the rows")
    }
  }

  test("q_cdc_apply: keys whose last change is a delete leave the snapshot") {
    import org.apache.spark.sql.expressions.Window
    val log = graft.Tables(spark, sf(), "events")
    val lastOp = log
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        (col("event_type") === "error").as("deleted"))
    val deleted = lastOp.filter(col("deleted"))
      .select("user_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(deleted.nonEmpty, "fixture should delete at least one key")
    val snapshot = q("q_cdc_apply")
      .select("user_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(snapshot.intersect(deleted).isEmpty,
      "deleted keys leaked into the snapshot")
    val live = lastOp.filter(!col("deleted")).count()
    assert(snapshot.size.toLong == live,
      s"snapshot ${snapshot.size} != live keys $live")
  }

  test("q_cdc_apply: plan aggregates via max_by, not a window sort") {
    val p = withoutAqe(q("q_cdc_apply")
      .queryExecution.executedPlan.toString)
    assert(p.contains("max_by"), s"expected max_by aggregate:\n$p")
    assert(!p.toLowerCase.contains("window"),
      s"snapshot should not pay a window sort:\n$p")
  }

  test("q_k_anonymity: risk accounting is internally consistent") {
    val rows = q("q_k_anonymity").collect()
    assert(rows.nonEmpty)
    val totalAtRisk = rows.map(_.getAs[Long]("n_rows_at_risk")).sum
    val totalRows = graft.Tables(spark, sf(), "events").count()
    assert(totalAtRisk <= totalRows)
    rows.foreach { r =>
      val ng = r.getAs[Long]("n_groups")
      val ns = r.getAs[Long]("n_small_groups")
      val risk = r.getAs[Double]("risk_frac")
      assert(ns <= ng && risk >= 0.0 && risk <= 1.0, s"inconsistent: $r")
      // a small group holds at most k-1=4 rows
      assert(r.getAs[Long]("n_rows_at_risk") <= ns * 4, s"overcounted: $r")
    }
  }

  test("q_dq_expectations: every rule checks its full table") {
    val rows = q("q_dq_expectations").collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("passed"))).toMap
    assert(rows.size == 4)
    val expected = Map(
      "fk_orders_customer" -> graft.Tables(spark, sf(), "orders").count(),
      "range_lineitem_quantity" ->
        graft.Tables(spark, sf(), "lineitem").count(),
      "nonneg_events_value" -> graft.Tables(spark, sf(), "events").count(),
      "notnull_customer_name" ->
        graft.Tables(spark, sf(), "customer").count())
    expected.foreach { case (rule, n) =>
      val (checked, viol, passed) = rows(rule)
      assert(checked == n, s"$rule checked $checked of $n rows")
      assert(passed == (viol == 0L), s"$rule passed flag inconsistent")
    }
  }

  test("q_anomaly_zscore: only full-history rows are scored") {
    val r = q("q_anomaly_zscore").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_events")
      val scored = row.getAs[Long]("n_scored")
      val anom = row.getAs[Long]("n_anomalies")
      // at most n−20 rows can have 20 predecessors
      assert(scored <= math.max(0, n - 20), s"over-scored: $row")
      assert(anom <= scored, s"more anomalies than scored rows: $row")
    }
    // non-vacuity floor: a regression that nulls every z (variance
    // floor, count predicate) zeroes n_scored everywhere and every
    // bound above still holds — the fixture has types with far more
    // than 20 events, so something must be scored
    assert(r.map(_.getAs[Long]("n_scored")).sum > 0,
      "no rows scored anywhere — the gates above are vacuous")
  }

  test("q_dedup_survivorship: format-valid record wins every cluster") {
    val rows = SparkEntry.queries("q_dedup_survivorship")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2,
        s"singleton cluster leaked into the merge: $r")
      val survivor = r.getAs[String]("survivor_name")
      assert(!survivor.endsWith("#"),
        s"corrupted variant won survivorship: $r")
      assert(r.getAs[Long]("survivor_id") ==
        r.getAs[Long]("cluster"),
        "clean record (lowest id) should anchor its cluster")
      assert(r.getAs[Long]("n_name_variants") >= 2)
    }
  }

  test("q_dq_rowcount_anomaly: only historied days scored; flags match z") {
    val rows = SparkEntry.queries("q_dq_rowcount_anomaly")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    // pin the title's invariant structurally: the scored days must
    // be EXACTLY each type's calendar days with >= 3 predecessors
    // (the old test never compared against the calendar, so a
    // weakened history predicate went green)
    val calendar = Tables(spark, sf(), "events")
      .select(col("event_type"), to_date(col("ts")).cast("string")
        .as("day"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (et, ds) =>
        et -> ds.map(_._2).sorted.drop(3).toSet
      }
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (et, rs) =>
        // the first 3 calendar days per type can never be scored
        val allDays = rs.map(_.getAs[String]("day")).sorted
        assert(allDays.toSet == calendar(et),
          s"$et: scored days ${allDays.toSet} != expected " +
            s"${calendar(et)}")
        assert(rs.forall(_.getAs[Long]("row_count") > 0), et)
        rs.foreach { r =>
          assert(r.getAs[Double]("trailing_mean") > 0, s"$et $r")
          val z = r.getAs[Double]("z_score")
          if (math.abs(math.abs(z) - 3.0) > 1e-3)
            assert(r.getAs[Boolean]("anomaly") == (math.abs(z) > 3.0),
              s"$et: anomaly flag inconsistent with z: $r")
        }
        assert(allDays.distinct.length == allDays.length,
          s"$et: duplicate scored days")
    }
  }
}
