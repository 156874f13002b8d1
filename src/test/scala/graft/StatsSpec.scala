package graft

/** Gates for the experimentation / robust-stats family
  * (StatsQueries): plan shapes that keep them linear at scale (one
  * scan for the A/B readout, broadcast-only joins for the multi-pass
  * quantile queries, top-k via TakeOrderedAndProject for the skew
  * audit) plus the semantic invariants the oracle row-hash doesn't
  * state (arms partition the rows, clip fractions bounded by the
  * quantile definition, outlier count consistent with the max score).
  */
class StatsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_ab_ttest: one scan, no join — conditional aggs do both arms") {
    val p = withoutAqe(q("q_ab_ttest")
      .queryExecution.executedPlan.toString)
    val scans = p.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans == 1, s"expected exactly 1 scan, got $scans:\n$p")
    assert(!p.contains("Join"), s"A/B readout must not join:\n$p")
  }

  test("q_ab_ttest: arms partition every event; stats are finite") {
    val rows = q("q_ab_ttest").collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      r.getAs[Long]("n_c") + r.getAs[Long]("n_t")).sum
    val nEvents = Tables(spark, sf(), "events").count()
    assert(total == nEvents, s"arms must partition rows: $total != $nEvents")
    rows.foreach { r =>
      assert(!r.getAs[Double]("t_stat").isNaN)
      assert(r.getAs[Double]("welch_df") > 0)
    }
  }

  test("q_outlier_mad / q_winsorize: broadcast-only joins (stats rows never shuffle the fact table)") {
    Seq("q_outlier_mad", "q_winsorize").foreach { name =>
      val p = withoutAqe(q(name).queryExecution.executedPlan.toString)
      assert(p.contains("BroadcastHashJoin"),
        s"$name: per-type stats should broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$name: no shuffle join expected:\n$p")
    }
  }

  test("q_outlier_mad: outlier count consistent with the max score") {
    q("q_outlier_mad").collect().foreach { r =>
      val n = r.getAs[Long]("n")
      val out = r.getAs[Long]("n_outliers")
      val maxZ = r.getAs[Double]("max_robust_z")
      assert(r.getAs[Double]("mad") >= 0)
      assert(out >= 0 && out <= n)
      // n_outliers counts z > 3.5 BEFORE rounding; max_robust_z is
      // rounded to 4 decimals, so the edge is ambiguous in BOTH
      // directions (a true 3.49998 rounds UP to 3.5000) — skip the
      // half-ulp band around the threshold entirely instead of
      // shifting it one way
      if (math.abs(maxZ - 3.5) > 5e-5)
        assert((out > 0) == (maxZ > 3.5),
          s"count/max disagree: n_outliers=$out max_robust_z=$maxZ")
    }
  }

  test("q_winsorize: clip fractions bounded by the 5% quantile definition") {
    q("q_winsorize").collect().foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(r.getAs[Long]("n_clip_lo") <= 0.05 * n + 1)
      assert(r.getAs[Long]("n_clip_hi") <= 0.05 * n + 1)
      assert(r.getAs[Double]("mean_winsor") <= r.getAs[Double]("mean_raw")
        + 3 * r.getAs[Double]("sd_winsor") + 1e-9)
    }
  }

  test("q_theil_sen: pair count bounded by the fixed sample; WindowGroupLimit prunes map-side") {
    val df = q("q_theil_sen")
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    assert(p.contains("WindowGroupLimit"),
      s"sample rank must prune map-side:\n$p")
    df.collect().foreach { r =>
      // ≤ C(48,2) pairs per type, regardless of the type's row count
      assert(r.getAs[Long]("n_pairs") <= 48L * 47 / 2,
        s"pair stage outgrew the sample bound: $r")
      assert(!r.getAs[Double]("median_slope_per_hour").isNaN)
    }
  }

  test("q_skew_audit: top-k plans as TakeOrderedAndProject, shares sum ≤ 1") {
    val df = q("q_skew_audit")
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$p")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-9)
    // descending by count — the audit surfaces the heaviest keys
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q_benford_audit: digit domain, shares sum to 1, chi2 total consistent") {
    val rows = q("q_benford_audit").collect()
    val digits = rows.map(_.getAs[Int]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9), digits.mkString(","))
    assert(digits.distinct.length == digits.length)
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0)
      < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("benford_share")).sum
      - 1.0) < 1e-4)
    // every row carries the same total; it equals the term sum
    val totals = rows.map(_.getAs[Double]("chi2_total")).distinct
    assert(totals.length == 1)
    val termSum = rows.map(_.getAs[Double]("chi2_term")).sum
    assert(math.abs(totals.head - termSum) < 1e-2,
      s"chi2_total=${totals.head} vs term sum $termSum")
  }

  test("q_gini_concentration: gini in [0,1); customer counts conserved") {
    val rows = q("q_gini_concentration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    val n = rows.map(_.getAs[Long]("n_customers")).sum
    val expected = Tables(spark, sf(), "orders")
      .join(Tables(spark, sf(), "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_custkey").distinct.count()
    assert(n == expected, s"customers with orders: $n != $expected")
  }

  test("q_ab_cuped: adjustment preserves the pooled mean; broadcast-only plan") {
    val df = q("q_ab_cuped")
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    assert(!p.contains("SortMergeJoin"),
      s"theta row must broadcast, never shuffle the user table:\n$p")
    val rows = df.collect()
    assert(rows.length == 2) // control + treatment
    // Σ(x−x̄)=0 over ALL users ⇒ the user-weighted pooled mean of the
    // adjusted metric equals the raw pooled mean (rounding at 4dp).
    val nTot = rows.map(_.getAs[Long]("n_users")).sum.toDouble
    val pooledRaw = rows.map(r =>
      r.getAs[Long]("n_users") * r.getAs[Double]("mean_y")).sum / nTot
    val pooledAdj = rows.map(r =>
      r.getAs[Long]("n_users") * r.getAs[Double]("mean_y_cuped"))
      .sum / nTot
    assert(math.abs(pooledRaw - pooledAdj) < 1e-3,
      s"CUPED shifted the pooled mean: $pooledRaw vs $pooledAdj")
  }

  test("q_mannwhitney: U bounded by n_c·n_t; ranks ride the block aggregate") {
    val df = q("q_mannwhitney")
    // the midrank window must consume the (type,value) aggregate, not
    // fact rows: a HashAggregate sits below the Window in the plan
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0 && p.indexOf("HashAggregate", wIdx) >= 0,
      s"expected aggregate below the midrank window:\n$p")
    df.collect().foreach { r =>
      val nC = r.getAs[Long]("n_c"); val nT = r.getAs[Long]("n_t")
      val u = r.getAs[Double]("u_stat")
      assert(u >= 0.0 && u <= nC.toDouble * nT,
        s"U out of [0, n_c*n_t]: $r")
      assert(!r.getAs[Double]("z_stat").isNaN)
    }
  }

  test("q_l_moments: L-ratio bounds |t3|,|t4| < 1, positive L-scale") {
    val rows = q("q_l_moments").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("l_scale") > 0, s"L-scale must be >0: $r")
      assert(math.abs(r.getAs[Double]("l_skew")) < 1.0,
        s"|t3| must be < 1: $r")
      assert(math.abs(r.getAs[Double]("l_kurt")) < 1.0,
        s"|t4| must be < 1: $r")
      // λ4 ≥ (5·t3²−1)/4 · λ2 — the feasibility bound; loose check
      val t3 = r.getAs[Double]("l_skew"); val t4 = r.getAs[Double]("l_kurt")
      assert(t4 >= (5 * t3 * t3 - 1) / 4 - 1e-4,
        s"(t3,t4) outside the feasible L-moment region: $r")
    }
  }

  test("q_fdr_bh: significant set is a prefix of the p-value order") {
    val rows = q("q_fdr_bh").collect().sortBy(_.getAs[Long]("p_rank"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p > 0.0 && p <= 1.0, s"p out of range: $r")
    }
    // p ascending with rank, crit strictly increasing
    val ps = rows.map(_.getAs[Double]("p_value"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    val crits = rows.map(_.getAs[Double]("bh_crit"))
    assert(crits.zip(crits.tail).forall { case (a, b) => a < b })
    // BH rejects a prefix: once not significant, never significant
    val sig = rows.map(_.getAs[Boolean]("significant"))
    assert(!sig.zip(sig.tail).exists { case (a, b) => !a && b },
      s"significance not a prefix: ${sig.mkString(",")}")
  }

  test("q_chi_square: single row, df matches dims, V in [0,1]") {
    val rows = q("q_chi_square").collect()
    assert(rows.length == 1)
    val r = rows.head
    val nEvents = Tables(spark, sf(), "events").count()
    assert(r.getAs[Long]("n") == nEvents,
      "contingency cells must partition every event")
    assert(r.getAs[Long]("df") > 0)
    assert(r.getAs[Double]("chi2") >= 0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"Cramér's V out of range: $v")
  }

  test("q_chi_square: marginals re-aggregate cells — broadcast joins only") {
    val p = withoutAqe(q("q_chi_square")
      .queryExecution.executedPlan.toString)
    assert(!p.contains("SortMergeJoin"),
      s"marginal joins must broadcast (cells are r×c-bounded):\n$p")
  }

  test("q_ks_test: D in [0,1], crit positive, reject consistent") {
    val rows = q("q_ks_test").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("ks_stat")
      val crit = r.getAs[Double]("ks_crit")
      assert(d >= 0.0 && d <= 1.0, s"D out of range: $r")
      assert(crit > 0.0)
      assert(r.getAs[Long]("n_c") > 0 && r.getAs[Long]("n_t") > 0)
      // reject computed on unrounded D; compare against the
      // half-ulp edge of the rounded columns
      if (math.abs(d - crit) > 1e-5)
        assert(r.getAs[Boolean]("reject_05") == (d > crit),
          s"reject flag disagrees with D vs crit: $r")
    }
  }

  test("q_funnel_by_variant: ladders shrink down-funnel in both arms") {
    val rows = q("q_funnel_by_variant").collect()
    assert(rows.length == 2, "exactly control + treatment rows")
    rows.foreach { r =>
      val s = r.getAs[Long]("n_signup")
      val c = r.getAs[Long]("n_click")
      val p = r.getAs[Long]("n_purchase")
      assert(s >= c && c >= p, s"funnel must shrink: $r")
      assert(r.getAs[Double]("cr_click") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("cr_purchase") <=
        r.getAs[Double]("cr_click") + 1e-9)
    }
  }

  test("q_user_overlap_jaccard: all type pairs, Jaccard within bounds") {
    val rows = q("q_user_overlap_jaccard").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val na = r.getAs[Long]("na")
      val nb = r.getAs[Long]("nb")
      val both = r.getAs[Long]("n_both")
      assert(both <= math.min(na, nb),
        s"intersection exceeds a set size: $r")
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
    }
    // 5 event types -> C(5,2) = 10 canonical pairs
    assert(rows.length == 10, s"expected 10 pairs, got ${rows.length}")
  }

  test("q_ab_srm_check: counts partition events; z consistent with shares") {
    val rows = q("q_ab_srm_check").collect()
    assert(rows.nonEmpty)
    val total = rows.map(r =>
      r.getAs[Long]("n_c") + r.getAs[Long]("n_t")).sum
    assert(total == Tables(spark, sf(), "events").count())
    rows.foreach { r =>
      val share = r.getAs[Double]("share_control")
      assert(share > 0 && share < 1)
      assert(r.getAs[Double]("srm_chi2") >= 0)
      // md5 split should not alarm on this corpus
      val z = r.getAs[Double]("z_imbalance")
      assert(r.getAs[Boolean]("srm_alarm") == (math.abs(z) > 3.0 -
        1e-9) || math.abs(math.abs(z) - 3.0) < 1e-3,
        s"alarm flag inconsistent with z: $r")
    }
  }

  test("q_price_elasticity: R² bounded; brand coverage complete") {
    val rows = q("q_price_elasticity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9,
        s"R² outside [0,1]: $r")
      assert(r.getAs[Long]("n") > 2)
      assert(!r.getAs[Double]("elasticity").isNaN)
    }
  }

  test("q_uplift_two_model: rates bounded, uplift consistent") {
    val rows = q("q_uplift_two_model").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pc = r.getAs[Double]("rate_control")
      val pt = r.getAs[Double]("rate_treatment")
      assert(pc >= 0 && pc <= 1 && pt >= 0 && pt <= 1)
      assert(math.abs(r.getAs[Double]("uplift") - (pt - pc)) < 5e-4,
        s"uplift inconsistent with rates: $r")
      assert(r.getAs[Double]("se_uplift") >= 0)
    }
  }

  test("q_bootstrap_ci: band brackets the full-sample mean") {
    val rows = q("q_bootstrap_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_boot") == 32L)
      val lo = r.getAs[Double]("ci_lo")
      val hi = r.getAs[Double]("ci_hi")
      val m = r.getAs[Double]("mean_full")
      assert(lo <= hi, s"CI inverted: $r")
      // Poisson-bootstrap band should bracket the point estimate
      assert(lo <= m + 1e-9 && m <= hi + 1e-9,
        s"mean outside its own bootstrap CI: $r")
    }
  }

  test("q_ks_test: identical arms would give D=0 — sanity on split arms") {
    // The md5 split halves each type, so D should be small but the
    // ECDFs are real: 0 <= D < 0.5 on this synthetic data.
    val rows = q("q_ks_test").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("ks_stat") < 0.5,
        s"suspiciously large D for a random split: $r")
    }
  }
}
