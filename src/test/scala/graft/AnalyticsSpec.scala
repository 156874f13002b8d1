package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the product-analytics family
  * (AnalyticsQueries): funnel stages partition the user base from a
  * single-shuffle fold (no joins, no window), retention never
  * exceeds cohort size, and the count-min sketch never
  * underestimates.
  */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_funnel_steps: stage counts partition the distinct-user base") {
    val rows = q("q_funnel_steps").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val users = Tables(spark, sf(), "events")
      .select("user_id").distinct().count()
    assert(rows.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(rows.values.sum == users,
      s"stages ${rows.values.sum} != users $users")
    assert(rows.getOrElse(3, 0L) > 0, "fixture should complete the funnel")
  }

  test("q_funnel_steps: fold plan — no join, no window, one user shuffle") {
    val p = withoutAqe(q("q_funnel_steps")
      .queryExecution.executedPlan.toString)
    assert(!p.contains("Join"), s"funnel should not self-join:\n$p")
    assert(!p.contains("Window"), s"funnel should not window-sort:\n$p")
  }

  test("q_cohort_retention: week-0 is the cohort maximum") {
    val rows = q("q_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val week0 = rows.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    rows.foreach { case (cohort, _, n) =>
      assert(n <= week0(cohort),
        s"cohort $cohort retains more users than it started with")
    }
    assert(rows.exists(_._2 > 0L), "fixture should span multiple weeks")
  }

  test("q_agg_quantile_sketch: rank error within the k=256 sampling bound") {
    val events = Tables(spark, sf(), "events")
    q("q_agg_quantile_sketch").collect().foreach { r =>
      val et = r.getAs[String]("event_type")
      val grp = events.filter(col("event_type") === et)
      val n = grp.count().toDouble
      for ((q0, cname) <- Seq(0.5 -> "est_p50", 0.9 -> "est_p90")) {
        val est = r.getAs[Double](cname)
        val rank = grp.filter(col("value") <= est).count() / n
        // ±3σ for a k=256 uniform sample ≈ ±0.094 around the target
        assert(math.abs(rank - q0) < 0.1,
          s"$et $cname: rank $rank too far from $q0")
      }
    }
  }

  test("q_agg_quantile_sketch: sample rank filter prunes map-side") {
    val p = withoutAqe(q("q_agg_quantile_sketch")
      .queryExecution.executedPlan.toString)
    assert(p.contains("WindowGroupLimit"),
      s"sample selection should prune via WindowGroupLimit:\n$p")
  }

  test("q_pit_features: both feature windows share one entity exchange") {
    val p = withoutAqe(SparkEntry.queries("q_pit_features")(spark, sf())
      .queryExecution.executedPlan.toString)
    // one hash exchange on user_id feeds BOTH window specs (lag and
    // the trailing-hour range frame); the only other exchange is the
    // deterministic final orderBy. A join-based assembly would add
    // one per feature.
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"feature windows should share the entity exchange:\n$p")
    assert(!p.contains("Join"), s"PIT assembly should not join:\n$p")
  }

  test("q_equidepth_bins: every bin holds roughly a quarter of its group") {
    val rows = q("q_equidepth_bins").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("bin"),
        r.getAs[Long]("n")))
    rows.groupBy(_._1).foreach { case (et, bins) =>
      assert(bins.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3),
        s"$et missing bins: $bins")
      val total = bins.map(_._3).sum.toDouble
      bins.foreach { case (_, b, n) =>
        val frac = n / total
        assert(frac > 0.10 && frac < 0.45,
          s"$et bin $b holds $frac of the group — boundaries off")
      }
    }
  }

  test("q_hybrid_rrf: fused scores are rank-consistent and bounded") {
    val rows = SparkEntry.queries("q_hybrid_rrf")(spark, sf()).collect()
    assert(rows.length == 10)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val rrf = r.getAs[Double]("rrf")
      val rs = Option(r.getAs[Integer]("rank_s"))
      val rd = Option(r.getAs[Integer]("rank_d"))
      assert(rs.nonEmpty || rd.nonEmpty, s"doc in neither leg: $r")
      assert(rrf > 0 && rrf <= 2.0 / 61 + 1e-9, s"rrf out of range: $r")
      assert(rrf <= prev, s"results not rrf-descending: $r")
      prev = rrf
    }
    // a doc present in both legs must outrank a same-rank single-leg doc
    val both = rows.filter(r => !r.isNullAt(2) && !r.isNullAt(3))
    assert(both.nonEmpty, "fixture should fuse at least one doc")
  }

  test("q_agg_heavy_hitters_cms: estimates never undercount") {
    val rows = q("q_agg_heavy_hitters_cms").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est"); val exact = r.getAs[Long]("exact")
      assert(est >= exact, s"CMS undercounted: $r")
    }
  }

  test("q_acf: correlations bounded, every type carries lags 1–7") {
    val rows = q("q_acf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      // |Σ dx_t dx_{t+k}| ≤ Σ dx² by Cauchy–Schwarz on the sub-series
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9,
        s"acf out of [-1,1]: $r")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (et, rs) =>
        assert(rs.map(_.getAs[Int]("lag")).sorted.sameElements(1 to 7),
          s"$et missing lags")
    }
  }

  test("q_funnel_time_to_convert: durations positive, cohort sizes shrink down-funnel") {
    val rows = q("q_funnel_time_to_convert").collect()
      .map(r => r.getAs[String]("transition") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("median_hours"),
          r.getAs[Double]("p90_hours"))).toMap
    assert(rows.keySet ==
      Set("signup_to_click", "click_to_purchase"))
    rows.values.foreach { case (n, med, p90) =>
      assert(n > 0)
      assert(med > 0 && p90 >= med,
        s"quantile order violated: median=$med p90=$p90")
    }
    // strictly-after semantics: each stage's cohort is a subset
    assert(rows("click_to_purchase")._1 <= rows("signup_to_click")._1,
      "purchase cohort outgrew click cohort")
  }

  test("q_share_shift: each period's shares sum to 1; deltas sum to 0") {
    val rows = q("q_share_shift").collect()
    val s1 = rows.map(_.getAs[Double]("share_p1")).sum
    val s2 = rows.map(_.getAs[Double]("share_p2")).sum
    val dd = rows.map(_.getAs[Double]("share_delta")).sum
    assert(math.abs(s1 - 1.0) < 1e-4, s"period-1 shares sum to $s1")
    assert(math.abs(s2 - 1.0) < 1e-4, s"period-2 shares sum to $s2")
    assert(math.abs(dd) < 1e-4, s"share deltas sum to $dd")
  }

  test("q_return_rate_ci: Wilson interval brackets the rate and stays in [0,1]") {
    q("q_return_rate_ci").collect().foreach { r =>
      val rate = r.getAs[Double]("rate")
      val lo = r.getAs[Double]("wilson_lo")
      val hi = r.getAs[Double]("wilson_hi")
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9,
        s"interval must bracket the rate: $r")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9,
        s"Wilson bounds must stay in [0,1]: $r")
      // the interval is strictly informative (non-degenerate)
      assert(hi > lo, s"degenerate interval: $r")
    }
  }

  test("q_pareto_abc: classes conserve revenue; A is few-parts-much-revenue") {
    val rows = q("q_pareto_abc").collect()
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"),
          r.getAs[Double]("class_revenue")))
      .toMap
    val totalRev = rows.values.map(_._2).sum
    val aShare = rows("A")._2 / totalRev
    assert(aShare >= 0.75 && aShare <= 0.85,
      s"A class should hold ~80% of revenue, got $aShare")
    // concentration direction: per-part revenue density decreases A→C
    val density = Seq("A", "B", "C").flatMap(c =>
      rows.get(c).map { case (n, r) => r / n })
    assert(density.zip(density.tail).forall { case (x, y) => x > y },
      s"per-part revenue must fall A→C: $density")
  }

  test("q_anomaly_iqr: fences bracket the quartiles, counts bounded") {
    q("q_anomaly_iqr").collect().foreach { r =>
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
      val flagged = r.getAs[Long]("n_below") + r.getAs[Long]("n_above")
      // Tukey fences can flag at most half the data by construction
      assert(flagged < r.getAs[Long]("n") / 2, s"implausible flags: $r")
    }
  }

  test("engagement family: conservation and ratio bounds") {
    // heatmap: ≤ 168 cells, counts conserve the event total
    val hm = q("q_activity_heatmap").collect()
    assert(hm.length <= 168)
    assert(hm.map(_.getAs[Long]("n_events")).sum ==
      Tables(spark, sf(), "events").count())
    // new+returning per day == distinct active users that day
    val nvr = q("q_new_vs_returning").collect()
    val dau = Tables(spark, sf(), "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("d"))
      .distinct().groupBy("d").count().collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        r.getAs[Long]("count")).toMap
    nvr.foreach { r =>
      val tot = r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")
      assert(tot == dau(r.getAs[java.sql.Date]("d").toString),
        s"new+returning != DAU on $r")
    }
    // every user is new exactly once
    assert(nvr.map(_.getAs[Long]("n_new")).sum ==
      Tables(spark, sf(), "events").select("user_id").distinct().count())
    // stickiness is a ratio in (0, 1]
    q("q_stickiness").collect().foreach { r =>
      val st = r.getAs[Double]("stickiness")
      assert(st > 0 && st <= 1.0 + 1e-9, s"stickiness out of range: $r")
    }
  }

  test("q_funnel_constrained: deadline only ever shrinks the cohort") {
    val free = q("q_funnel_time_to_convert").collect()
      .map(r => r.getAs[String]("transition") -> r.getAs[Long]("n_users"))
      .toMap
    val tight = q("q_funnel_constrained").collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("n"))
      .toMap
    assert(tight("click_72h") <= free("signup_to_click"),
      "72h click cohort exceeds the unconstrained one")
    assert(tight.values.forall(_ > 0))
    // ladder is monotone
    assert(tight("purchase_72h") <= tight("click_72h"))
    assert(tight("click_72h") <= tight("signup"))
  }

  test("q_quantile_normalize: reference curve monotone over bins") {
    val rows = q("q_quantile_normalize").collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") > 0)
      assert(r.getAs[Double]("spread") >= 0)
    }
    val ref = rows.map(_.getAs[Double]("ref_value"))
    assert(ref.zip(ref.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"mean-of-quantiles must be non-decreasing: ${ref.mkString(",")}")
  }

  test("q_survival_km: survival and risk-set monotone within segment") {
    val rows = q("q_survival_km").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach {
      case (seg, rs) =>
        val byT = rs.sortBy(_.getAs[Long]("t_days"))
        val surv = byT.map(_.getAs[Double]("survival"))
        assert(surv.forall(sv => sv >= 0.0 && sv <= 1.0), seg)
        assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
          s"$seg survival not non-increasing: ${surv.mkString(",")}")
        val risk = byT.map(_.getAs[Long]("n_risk"))
        assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
          s"$seg risk set must strictly shrink over event times")
    }
  }

  test("q_gap_fill: dense hourly spine per type, LOCF never null") {
    val rows = q("q_gap_fill").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (et, rs) =>
        val hs = rs.map(_.getAs[Long]("h_us")).sorted
        // spine is dense: consecutive hours differ by exactly 1h
        assert(hs.zip(hs.tail).forall { case (a, b) =>
          b - a == 3600L * 1000000L },
          s"$et spine not dense hourly")
        rs.foreach { r =>
          assert(!r.isNullAt(r.fieldIndex("rev_filled")),
            s"LOCF must never leave null after the first obs: $r")
        }
        // first and last hour must be observed (span endpoints)
        val byH = rs.sortBy(_.getAs[Long]("h_us"))
        assert(!byH.head.getAs[Boolean]("is_gap"))
        assert(!byH.last.getAs[Boolean]("is_gap"))
    }
  }

  test("q_gap_fill: LOCF carries the previous observed value across gaps") {
    val rows = q("q_gap_fill").collect()
      .filter(_.getAs[String]("event_type") == "click")
      .sortBy(_.getAs[Long]("h_us"))
    // LOCF copies the SAME decimal then rounds identically, so the
    // carried double is bit-equal to its source row's
    var lastObserved: Option[Double] = None
    rows.foreach { r =>
      if (!r.getAs[Boolean]("is_gap"))
        lastObserved = Some(r.getAs[Double]("rev_filled"))
      else lastObserved.foreach { lo =>
        assert(r.getAs[Double]("rev_filled") == lo,
          s"gap row must carry last observation: $r")
      }
    }
  }

  test("q_fulfillment_latency: lag order statistics are coherent") {
    val rows = q("q_fulfillment_latency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getAs[Double]("median_days")
      val p90 = r.getAs[Double]("p90_days")
      val mx = r.getAs[Long]("max_days")
      assert(med <= p90 + 1e-9 && p90 <= mx + 1e-9,
        s"median ≤ p90 ≤ max violated: $r")
      assert(r.getAs[Double]("avg_days") >= 0)
    }
  }

  test("q_demand_variability: classes partition parts; cv bands hold") {
    val rows = q("q_demand_variability").collect()
    assert(rows.nonEmpty)
    val classes = rows.map(_.getAs[String]("xyz_class"))
    assert(classes.forall(Set("X", "Y", "Z")))
    rows.foreach { r =>
      val lo = r.getAs[Double]("min_cv")
      val hi = r.getAs[Double]("max_cv")
      val avg = r.getAs[Double]("avg_cv")
      assert(lo <= avg + 5e-5 && avg <= hi + 5e-5,
        s"avg cv outside [min,max]: $r")
      r.getAs[String]("xyz_class") match {
        case "X" => assert(hi < 0.5 + 5e-5)
        case "Y" => assert(lo >= 0.5 - 5e-5 && hi < 1.0 + 5e-5)
        case "Z" => assert(lo >= 1.0 - 5e-5)
      }
    }
  }

  test("q_post_stratification: Kish n_eff bounded by the sample size") {
    val r = q("q_post_stratification").collect().head
    val n = r.getAs[Long]("n")
    val k = r.getAs[Long]("k_strata")
    val neff = r.getAs[Double]("kish_neff")
    assert(k > 0 && n >= k)
    // design-effect bound: n_eff ≤ n, with equality iff equal strata
    assert(neff <= n + 1e-6, s"n_eff $neff exceeds n $n")
    assert(neff > 0)
  }

  test("q_rolling_distinct_users: rolling count dominates the hourly count") {
    val rows = q("q_rolling_distinct_users").collect()
    assert(rows.nonEmpty)
    // compute the per-hour distinct directly and compare: the
    // 24h rolling window can never be smaller at the same anchor
    val hourly = Tables(spark, sf(), "events")
      .selectExpr("event_type",
        "unix_micros(date_trunc('hour', ts)) as h_us", "user_id")
      .distinct()
      .groupBy("event_type", "h_us").count()
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("h_us")) -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("h_us"))
      val rolling = r.getAs[Long]("rolling_24h_users")
      assert(hourly.contains(key), s"anchor not an observed hour: $r")
      assert(rolling >= hourly(key),
        s"rolling window smaller than its own hour: $r")
    }
    assert(rows.length == hourly.size,
      "every observed (type, hour) must be scored exactly once")
  }

  test("q_cohort_ltv: LTV curves are non-decreasing per cohort") {
    val rows = q("q_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_wk")).foreach {
      case (cw, rs) =>
        val byOff = rs.sortBy(_.getAs[Long]("wk_offset"))
        val ltv = byOff.map(_.getAs[Double]("ltv_per_user"))
        assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
          s"cohort $cw LTV not cumulative: ${ltv.mkString(",")}")
        assert(byOff.head.getAs[Long]("wk_offset") == 0,
          s"cohort $cw must earn in its own week 0")
        assert(rs.forall(_.getAs[Long]("cohort_size") > 0))
    }
  }

  test("q_seasonal_index: indices average to ~1 weighted by days") {
    val rows = q("q_seasonal_index").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach {
      case (et, rs) =>
        rs.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0,
          s"$et: $r"))
        // day-weighted mean of (dow_mean/overall_mean) is exactly 1
        val days = rs.map(_.getAs[Long]("n_days")).sum.toDouble
        val wmean = rs.map(r => r.getAs[Double]("seasonal_index") *
          r.getAs[Long]("n_days")).sum / days
        assert(math.abs(wmean - 1.0) < 1e-3,
          s"$et: weighted index mean $wmean != 1")
    }
  }

  test("q_basket_entropy: entropy bounded by ln(brand count)") {
    val rows = q("q_basket_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avgH = r.getAs[Double]("avg_entropy")
      val maxH = r.getAs[Double]("max_entropy")
      val avgB = r.getAs[Double]("avg_brands")
      assert(avgH >= 0 && maxH >= avgH - 1e-9)
      assert(avgB >= 1.0)
      // H ≤ ln(#brands in the order); 25 brands is the domain cap
      assert(maxH <= math.log(25.0) + 1e-6,
        s"entropy exceeds the brand-domain bound: $r")
    }
  }

  test("q_segment_migration: matrix covers every active customer once") {
    val rows = q("q_segment_migration").collect()
    assert(rows.nonEmpty)
    val segs = Set("low", "mid", "high", "none")
    rows.foreach { r =>
      assert(segs(r.getAs[String]("seg_p1")))
      assert(segs(r.getAs[String]("seg_p2")))
      assert(!(r.getAs[String]("seg_p1") == "none" &&
        r.getAs[String]("seg_p2") == "none"),
        "a customer can't be absent from both periods")
    }
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val active = Tables(spark, sf(), "orders")
      .select("o_custkey").distinct().count()
    assert(total == active,
      s"matrix total $total != active customers $active")
  }

  test("q_lorenz_deciles: cumulative shares monotone, end at 1") {
    val rows = q("q_lorenz_deciles").collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty)
    val pop = rows.map(_.getAs[Double]("cum_pop_share"))
    val rev = rows.map(_.getAs[Double]("cum_rev_share"))
    assert(pop.zip(pop.tail).forall { case (a, b) => b >= a })
    assert(rev.zip(rev.tail).forall { case (a, b) => b >= a })
    assert(math.abs(pop.last - 1.0) < 1e-9)
    assert(math.abs(rev.last - 1.0) < 1e-9)
    // Lorenz curve sits below the diagonal (rich deciles at the top)
    rows.init.foreach { r =>
      assert(r.getAs[Double]("cum_rev_share") <=
        r.getAs[Double]("cum_pop_share") + 1e-4,
        s"Lorenz curve above the diagonal: $r")
    }
  }

  test("q_retention_halflife: single closed-form fit row") {
    val rows = q("q_retention_halflife").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_weeks") >= 2,
      "need at least 2 curve points to fit")
    assert(!r.getAs[Double]("slope_ln").isNaN)
    assert(!r.getAs[Double]("intercept_ln").isNaN)
  }

  test("q_percentile_weighted: weighted quantiles ordered and attained") {
    val rows = q("q_percentile_weighted").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getAs[Double]("w_median_price")
      val p90 = r.getAs[Double]("w_p90_price")
      assert(med <= p90 + 1e-9, s"weighted median > p90: $r")
      assert(r.getAs[Double]("total_qty") > 0.0)
      assert(r.getAs[Long]("n_price_points") > 0)
    }
  }

  test("q_seasonality_strength: variance decomposition is coherent") {
    val rows = q("q_seasonality_strength").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("seasonality_strength")
      assert(s >= 0.0 && s <= 1.0, s"strength out of [0,1]: $r")
      assert(r.getAs[Double]("var_resid") <=
        r.getAs[Double]("var_total") + 1e-6,
        s"residual variance exceeds total: $r")
    }
  }

  test("q_forecast_backtest: metrics well-formed, WAPE consistent") {
    val rows = q("q_forecast_backtest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") > 0)
      val mae = r.getAs[Double]("mae")
      val rmse = r.getAs[Double]("rmse")
      assert(mae >= 0 && rmse >= 0)
      assert(rmse >= mae - 1e-9,
        s"RMSE must dominate MAE: $r")
      assert(r.getAs[Double]("wape") >= 0)
    }
  }
}
