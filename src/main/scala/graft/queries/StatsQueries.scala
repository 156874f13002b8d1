package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Experimentation / robust-statistics operators — the audit queries
  * a data platform runs on top of the event stream: A/B test readout
  * (Welch's t), MAD-based robust outlier detection, winsorized
  * feature moments, and a hot-key skew audit.
  *
  * Scale designs:
  *  - the A/B readout is ONE hash aggregate with conditional
  *    sub-aggregates (count/avg/var_samp over CASE columns) — no
  *    per-variant scan, no join; variant assignment is the same
  *    engine-portable md5-bucket idiom as q_hash_split, so the
  *    experiment split is reproducible anywhere;
  *  - MAD and winsorization need exact per-group quantiles of a
  *    DERIVED column, which is inherently multi-pass (the deviation
  *    column doesn't exist until the median is known). Each pass is
  *    a full hash aggregate over the fact table joined to a
  *    broadcast per-type stats row (≤ |event_type| rows) — scans
  *    scale linearly, nothing shuffles the fact table beyond the
  *    group key, and no window ships a whole type to one task;
  *  - the skew audit aggregates to per-key counts (map-side
  *    partials), then takes top-k via sort+limit
  *    (TakeOrderedAndProject: each partition forwards only its own
  *    top-k) against one-row broadcast totals. This is the query you
  *    run BEFORE picking a salting factor — it measures the skew the
  *    salted-agg operator (q_salted_agg) is the cure for.
  */
object StatsQueries {

  /** Deterministic 2-arm experiment assignment: md5-bucket of the
    * user id, same idiom (and therefore same split) as
    * Sampling.hashSplit. Portable: DuckDB replays it bit-for-bit.
    */
  private def variantOf(c: Column): Column =
    when(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long") % 2 === 0, "control").otherwise("treatment")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Welch's unequal-variance t-test per event_type: users are
    // hash-assigned to control/treatment, the metric is the event
    // value. One aggregate computes n/mean/var for both arms via
    // CASE columns (var_samp ignores the NULLs of the other arm),
    // then the t statistic and Welch–Satterthwaite df are derived
    // per group. Rounding to 4 decimals is the cross-engine
    // stability contract used repo-wide for double-reduction
    // results.
    "q_ab_ttest" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .withColumn("variant", variantOf(col("user_id")))
      val vc = when(col("variant") === "control", col("value"))
      val vt = when(col("variant") === "treatment", col("value"))
      val g = ev.groupBy(col("event_type")).agg(
        count(vc).as("n_c"), count(vt).as("n_t"),
        avg(vc).as("m_c"), avg(vt).as("m_t"),
        var_samp(vc).as("s2_c"), var_samp(vt).as("s2_t"))
      val seC = col("s2_c") / col("n_c")
      val seT = col("s2_t") / col("n_t")
      g.select(
        col("event_type"), col("n_c"), col("n_t"),
        round(col("m_c"), 4).as("mean_control"),
        round(col("m_t"), 4).as("mean_treatment"),
        round((col("m_t") - col("m_c")) / sqrt(seC + seT), 4)
          .as("t_stat"),
        round(pow(seC + seT, 2) /
          (pow(seC, 2) / (col("n_c") - 1) +
            pow(seT, 2) / (col("n_t") - 1)), 2).as("welch_df"))
        .orderBy(col("event_type"))
    },

    // Robust outliers: per event_type median and MAD (median
    // absolute deviation), then the modified z-score
    // 0.6745·|x−med|/MAD with the standard 3.5 cutoff. Three linear
    // passes over events (median → MAD → count), each joining a
    // broadcast per-type stats row — the multi-pass shape is forced
    // by exact order statistics of a derived column; swap
    // percentile→approx_percentile to fuse passes when ±1% suffices.
    "q_outlier_mad" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      val z = lit(0.6745) * abs(col("value") - col("med")) / col("mad")
      ev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(first(round(col("med"), 4)).as("median"),
          first(round(col("mad"), 4)).as("mad"),
          count(lit(1)).as("n"),
          sum(when(z > 3.5, 1L).otherwise(0L)).as("n_outliers"),
          round(max(z), 4).as("max_robust_z"))
        .orderBy(col("event_type"))
    },

    // Winsorized moments: clip value at the exact per-type p05/p95,
    // then report the clipped mean/stddev next to the raw mean —
    // the standard heavy-tail-robust feature transform before model
    // training. Two passes (quantiles, then clip+aggregate), the
    // quantile row broadcast.
    "q_winsorize" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      // round(6) pins the thresholds across engines: DuckDB's
      // quantile_cont computes (1-f)*lo + f*hi and is ~1 ulp off even
      // when lo == hi (sf1 soak: 2.5200000000000005 vs Spark's exact
      // 2.52), which flips the strict-inequality clip counts by the
      // full tie multiplicity. True percentiles of this data sit on a
      // ~1e-4 grid, so 6dp rounding collapses the ulp without ever
      // landing on its own half-tie. Same pattern as q_agg_percentiles.
      val qs = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.05)"), 6).as("p05"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))
      val clipped = greatest(least(col("value"), col("p95")), col("p05"))
      ev.join(broadcast(qs), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 4).as("mean_raw"),
          round(avg(clipped), 4).as("mean_winsor"),
          round(stddev_samp(clipped), 4).as("sd_winsor"),
          sum(when(col("value") < col("p05"), 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("value") > col("p95"), 1L).otherwise(0L))
            .as("n_clip_hi"))
        .orderBy(col("event_type"))
    },

    // Per-user exponentially-weighted trend feature: the EWMA of the
    // last 10 event values at each user's final event, weights
    // (1−α)^age with α = 0.3, normalized over the observed window.
    // One window shuffle on user_id does both the bounded 10-row
    // frame collect AND the last-row selection; the weighted fold is
    // an index-aware transform over the ≤10-element array (bounded
    // state — this is the whale-safe alternative to collecting a
    // user's full history). Weighted sums run over ≤10 doubles in
    // frame order in both engines, then round(4) pins the quotient.
    "q_ewma" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = seq.rowsBetween(-9, 0)
      val ev = Tables(s, dir, "events")
        .withColumn("vals", collect_list(col("value")).over(frame))
        .withColumn("rn", row_number().over(seq))
        .withColumn("n_user",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .where(col("rn") === col("n_user"))
      val n = size(col("vals"))
      val w = transform(sequence(lit(1), n),
        i => pow(lit(0.7), (n - i).cast("double")))
      val num = aggregate(
        zip_with(col("vals"), w, (v, wt) => v * wt),
        lit(0.0), (acc, x) => acc + x)
      val den = aggregate(w, lit(0.0), (acc, x) => acc + x)
      ev.select(col("user_id"), col("n_user").as("n_events"),
          round(element_at(col("vals"), -1), 4).as("last_value"),
          round(num / den, 4).as("ewma"))
        .orderBy(col("user_id"))
    },

    // Theil–Sen robust trend per event_type: the median of pairwise
    // slopes (value per hour) over a FIXED deterministic k=48
    // md5-rank sample per group — the estimator is 29%-breakdown
    // robust and the sample bound makes the O(k²) pair stage
    // constant per group no matter how many events the type has
    // (the same fixed-k discipline as the quantile sketch; the
    // sample window is WindowGroupLimit-pruned map-side). Every
    // slope is per-row IEEE arithmetic and the sample is
    // hash-pinned, so the DuckDB oracle replays the estimate
    // exactly.
    "q_theil_sen" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val k = 48
      val h = Portable.h60(col("event_id"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("h"), col("event_id"))
      val sample = Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("us"), col("value"), h.as("h"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= k)
        .select(col("event_type"), col("event_id"), col("us"),
          col("value"))
      val a = sample.select(col("event_type"),
        col("event_id").as("id_a"), col("us").as("us_a"),
        col("value").as("v_a"))
      val b = sample.select(col("event_type"),
        col("event_id").as("id_b"), col("us").as("us_b"),
        col("value").as("v_b"))
      a.join(b, Seq("event_type"))
        .where(col("id_a") < col("id_b") && col("us_a") =!= col("us_b"))
        .select(col("event_type"),
          ((col("v_b") - col("v_a")) /
            ((col("us_b") - col("us_a")) / lit(3.6e9))).as("slope"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 6)
            .as("median_slope_per_hour"))
        .orderBy(col("event_type"))
    },

    // Hot-key skew audit: the top-10 user_ids by event count, each
    // with its share of all rows and its ratio versus a uniform key
    // distribution — the measurement that decides whether a
    // downstream groupBy(user_id) needs salting. Per-key counts take
    // map-side partials; totals are a one-row broadcast; the top-10
    // is sort+limit (TakeOrderedAndProject — only per-partition
    // winners reach the final task).
    "q_skew_audit" -> { (s, dir) =>
      val counts = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum(col("n")).as("total_rows"),
        count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(totals))
        .select(col("user_id"), col("n"),
          round(col("n") / col("total_rows"), 6).as("share"),
          round(col("n") * col("n_keys") / col("total_rows"), 4)
            .as("x_uniform"))
        .orderBy(col("n").desc, col("user_id")).limit(10)
    },

    // Benford first-significant-digit audit on order totals — the
    // classic fraud/data-fabrication screen. One hash aggregate over
    // the digit domain (9 rows by construction), a one-row broadcast
    // total, and the chi-square statistic against the Benford
    // expectation log10(1+1/d). The closing window that sums the
    // per-digit chi-square terms runs over the 9-row digit domain —
    // bounded no matter the fact-table size. Digit extraction is
    // per-row IEEE arithmetic (pow/log10 on the same doubles), so
    // the oracle replays it exactly.
    "q_benford_audit" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "orders")
        .where(col("o_totalprice") > 0)
        .select(floor(col("o_totalprice") /
          pow(lit(10.0), floor(log10(col("o_totalprice")))))
          .cast("int").as("digit"))
      val counts = d.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val total = counts.agg(sum(col("n_obs")).as("n_total"))
      val benford = log10(lit(1.0) + lit(1.0) / col("digit"))
      val expected = col("n_total") * benford
      val chi = pow(col("n_obs") - expected, 2) / expected
      counts.crossJoin(broadcast(total))
        .withColumn("chi2_term", chi)
        .select(col("digit"), col("n_obs"),
          round(col("n_obs") / col("n_total"), 6).as("obs_share"),
          round(benford, 6).as("benford_share"),
          round(col("chi2_term"), 4).as("chi2_term"),
          // global window over the 9-row digit domain — bounded
          round(sum(col("chi2_term")).over(
            Window.partitionBy(lit(1))), 4).as("chi2_total"))
        .orderBy(col("digit"))
    },

    // Gini concentration of customer revenue per market segment —
    // the inequality audit behind "what share of revenue do the top
    // customers hold". Uses the rank formulation
    // G = 2·Σ r·x / (n·Σ x) − (n+1)/n with r = row_number ordered by
    // (revenue, custkey); Σ r·x is invariant to tie ordering (equal
    // x across a tied rank block), so the statistic is deterministic.
    // Per-customer revenue and the rank-weighted sum are exact
    // DECIMAL, divided once in double at the end. The per-segment
    // window sorts only the aggregated per-customer rows (|customers|
    // ≪ |orders|); at 100× the same segment-partitioned sort holds
    // because the window input is the aggregate, never the fact table.
    "q_gini_concentration" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val rev = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("rev"), col("c_custkey"))
      // total_revenue is a CORPUS-scale sum (per-segment ~1/5 of all
      // order revenue): (28,6) headroom + plain decimal→double cast,
      // no round — at sf10 the segment total (~6e11) has ulp above
      // the 1e-6 grain, the r10 soak's double-rounding class (gini
      // itself is O(1), its round stays)
      rev.withColumn("r", row_number().over(w))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev")).cast("decimal(28,6)").as("total_revenue"),
          // Σ r·x ≈ n·total grows SF² (~1.8e17 at sf10): (38,6)
          sum((col("r").cast("decimal(10,0)") * col("rev"))
            .cast("decimal(38,6)")).cast("decimal(38,6)").as("s_rx"))
        .select(col("c_mktsegment"), col("n_customers"),
          col("total_revenue").cast("double").as("total_revenue"),
          round(lit(2.0) * col("s_rx").cast("double") /
            (col("n_customers") * col("total_revenue").cast("double")) -
            (col("n_customers") + lit(1.0)) / col("n_customers"), 6)
            .as("gini"))
        .orderBy(col("c_mktsegment"))
    },

    // CUPED variance-reduced A/B readout: per-user pre-period sum is
    // the covariate X, post-period sum the metric Y; θ = cov(X,Y)/
    // var(X) fitted on ALL users (the standard pooled fit), then the
    // adjusted metric Y − θ(X − X̄) is compared per variant with the
    // achieved variance reduction. Shape: one per-user hash
    // aggregate, a one-row broadcast (X̄, θ), one per-variant
    // aggregate — three linear passes, nothing wider than the user
    // key ever shuffles. Per-user sums are exact DECIMAL before the
    // double-valued moment pass (round-4 contract, as q_ab_ttest).
    "q_ab_cuped" -> { (s, dir) =>
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      val u = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < cutoff, col("value")).otherwise(lit(0.0))
            .cast("decimal(18,6)")).cast("decimal(18,6)").as("xd"),
          sum(when(col("ts") >= cutoff, col("value")).otherwise(lit(0.0))
            .cast("decimal(18,6)")).cast("decimal(18,6)").as("yd"))
        .select(variantOf(col("user_id")).as("variant"),
          col("xd").cast("double").as("x"),
          col("yd").cast("double").as("y"))
      val g = u.agg(avg(col("x")).as("xbar"),
        (covar_samp(col("x"), col("y")) / var_samp(col("x")))
          .as("theta"))
      u.crossJoin(broadcast(g))
        .withColumn("y_adj",
          col("y") - col("theta") * (col("x") - col("xbar")))
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          round(avg(col("y")), 4).as("mean_y"),
          round(avg(col("y_adj")), 4).as("mean_y_cuped"),
          round(lit(1.0) - var_samp(col("y_adj")) / var_samp(col("y")),
            4).as("var_reduction"))
        .orderBy(col("variant"))
    },

    // Mann–Whitney U (rank-sum) per event_type, control vs treatment
    // arms — the non-parametric complement to q_ab_ttest. Ranks are
    // computed on the DISTINCT-(type,value) block domain: one hash
    // aggregate to (cnt, cnt_treatment) per block, then a cumulative
    // count over blocks gives every block its midrank
    // cum − (cnt−1)/2 without ever ranking a fact row — the window
    // input is the aggregate (the gini/skyline discipline), so the
    // per-type sort is over distinct values only. Midranks are
    // multiples of ½ below 2⁵², so the rank-sum is EXACT double
    // arithmetic (association-free) and the tie-corrected normal
    // z follows in one more aggregate.
    "q_mannwhitney" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .withColumn("variant", variantOf(col("user_id")))
      val blocks = ev.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("variant") === "treatment", 1L).otherwise(0L))
            .as("cnt_t"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = blocks
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("avg_rank",
          col("cum") - (col("cnt") - lit(1.0)) / lit(2.0))
      val g = ranked.groupBy(col("event_type")).agg(
        sum(col("cnt")).as("n"),
        sum(col("cnt_t")).as("n_t"),
        sum(col("cnt_t") * col("avg_rank")).as("r_t"),
        // cnt³ in DECIMAL: a tie block past ~2.1e6 rows wraps the
        // 64-bit cube (values sit on a bounded 2-decimal grid, so
        // blocks grow linearly with the corpus) — the cast must land
        // BEFORE the multiplies (casting the Long product would wrap
        // first and widen the wreckage); DECIMAL keeps the tie
        // correction exact and matches DuckDB's HUGEINT sum
        sum({
          val c = col("cnt").cast("decimal(38,0)")
          c * c * c - c
        }).as("tie_sum"))
      val nC = col("n") - col("n_t")
      val u = col("r_t") - col("n_t") * (col("n_t") + lit(1)) / lit(2.0)
      val mu = nC * col("n_t") / lit(2.0)
      val sig2 = nC * col("n_t") / lit(12.0) *
        ((col("n") + lit(1)) -
          col("tie_sum") / (col("n") * (col("n") - lit(1.0))))
      g.select(col("event_type"), nC.as("n_c"), col("n_t"),
          u.as("u_stat"), round((u - mu) / sqrt(sig2), 4).as("z_stat"))
        .orderBy(col("event_type"))
    },

    // Benjamini–Hochberg FDR control over the per-event-type Welch
    // tests — the multiple-comparisons step every experiment platform
    // runs after q_ab_ttest. p-values come from a portable logistic
    // normal-CDF approximation (Bowling 2009: Φ(x) ≈ 1/(1+e^(−1.5976x
    // (1+0.04417x²)))) — pure per-row IEEE math both engines replay
    // bit-for-bit. The BH step sorts the m test rows (|event_type|,
    // bounded by the type domain, never the fact table), finds
    // k = max{i : p_i ≤ i·q/m}, and flags i ≤ k at q = 0.10.
    "q_fdr_bh" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val q = 0.10
      val ev = Tables(s, dir, "events")
        .withColumn("variant", variantOf(col("user_id")))
      val vc = when(col("variant") === "control", col("value"))
      val vt = when(col("variant") === "treatment", col("value"))
      val g = ev.groupBy(col("event_type")).agg(
        count(vc).as("n_c"), count(vt).as("n_t"),
        avg(vc).as("m_c"), avg(vt).as("m_t"),
        var_samp(vc).as("s2_c"), var_samp(vt).as("s2_t"))
      val t = (col("m_t") - col("m_c")) /
        sqrt(col("s2_c") / col("n_c") + col("s2_t") / col("n_t"))
      val tests = g.select(col("event_type"), t.as("t_stat"))
        .withColumn("p_value", lit(2.0) /
          (lit(1.0) + exp(lit(1.5976) * abs(col("t_stat")) *
            (lit(1.0) + lit(0.04417) * col("t_stat") * col("t_stat")))))
      // global windows over the per-event-type TEST table (one row
      // per type, 5 at any SF) — the BH ladder needs the total order
      val wOrd = Window.partitionBy(lit(1))
        .orderBy(col("p_value"), col("event_type"))
      val wAll = Window.partitionBy(lit(1))
      val ranked = tests
        .withColumn("i", row_number().over(wOrd))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("crit", col("i") * lit(q) / col("m"))
      ranked
        .withColumn("k", max(when(col("p_value") <= col("crit"),
          col("i"))).over(wAll))
        .select(col("event_type"), round(col("t_stat"), 4).as("t_stat"),
          round(col("p_value"), 6).as("p_value"),
          col("i").cast("long").as("p_rank"),
          round(col("crit"), 6).as("bh_crit"),
          (col("i") <= coalesce(col("k"), lit(0L)))
            .as("significant"))
        .orderBy(col("p_rank"))
    },

    // Sample L-moments per event_type — the order-statistics-based
    // distribution summary (L-scale, L-skewness t₃, L-kurtosis t₄)
    // hydrology and robust-stats pipelines prefer over classical
    // moments (finite for heavy tails, bounded |t₃|,|t₄| < 1).
    // Estimated via probability-weighted moments over the TIE-BLOCK
    // aggregate (the mannwhitney/ks discipline): the fact table
    // collapses to (type, distinct value, cnt) first, a cumulative
    // count window assigns each block its rank interval [s+1, s+c],
    // and the integer-weighted sums Σ x·(r−1)…(r−k) come from the
    // hockey-stick closed form Σ_{m=s}^{e−1} m^(k) =
    // (e^(k+1) − s^(k+1))/(k+1) — EXACT decimal arithmetic, and
    // tie-invariant by construction. A row_number over every fact
    // row (the earlier shape) sorts the whole type partition through
    // one task; the block form sorts only the distinct-value domain.
    // Only the final b-to-λ algebra runs in doubles, round(4).
    "q_l_moments" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val blocks = Tables(s, dir, "events")
        .select(col("event_type"),
          col("value").cast("decimal(18,6)").as("x"))
        .groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = blocks.withColumn("cum", sum(col("cnt")).over(w))
      // block rank interval: m = r−1 runs over [st, e−1]
      val e = col("cum").cast("decimal(38,0)")
      val st = (col("cum") - col("cnt")).cast("decimal(38,0)")
      def ff(a: org.apache.spark.sql.Column, k: Int) =
        (0 until k).map(i => a - lit(i)).reduce(_ * _)
      val sum1 = ((ff(e, 2) - ff(st, 2)) / 2).cast("decimal(38,0)")
      val sum2 = ((ff(e, 3) - ff(st, 3)) / 3).cast("decimal(38,0)")
      val sum3 = ((ff(e, 4) - ff(st, 4)) / 4).cast("decimal(38,0)")
      val g = cum.groupBy(col("event_type")).agg(
        sum(col("cnt")).as("n"),
        // full-width (38,6) intermediates: the old (30,6) narrowing
        // cast nulled any block term past ~1e24 (x·sum3 gets there
        // around 5e5 rows per type) and sum() then silently DROPPED
        // those blocks — (38,6) is the product's natural type, so
        // the cast only documents it; overflow now surfaces as an
        // explicit null result, not a quietly wrong statistic
        sum((col("x") * col("cnt")).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("s0"),
        sum((col("x") * sum1).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("s1"),
        sum((col("x") * sum2).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("s2"),
        sum((col("x") * sum3).cast("decimal(38,6)"))
          .cast("decimal(38,6)").as("s3"))
      val n = col("n")
      // denominators in DOUBLE, not long: n^(4) overflows int64 once
      // a type's count passes ~55k (hit at the sf1 soak, ANSI
      // ARITHMETIC_OVERFLOW). Each factor is exact in double
      // (n < 2^53) and the left-assoc product rounds identically in
      // both engines, so the b-values stay bit-identical to the
      // oracle's n::DOUBLE formulation at any scale.
      val nd = col("n").cast("double")
      val b0 = col("s0").cast("double") / nd
      val b1 = col("s1").cast("double") / (nd * (nd - lit(1.0)))
      val b2 = col("s2").cast("double") /
        (nd * (nd - lit(1.0)) * (nd - lit(2.0)))
      val b3 = col("s3").cast("double") /
        (nd * (nd - lit(1.0)) * (nd - lit(2.0)) * (nd - lit(3.0)))
      val l1 = b0
      val l2 = lit(2.0) * b1 - b0
      val l3 = lit(6.0) * b2 - lit(6.0) * b1 + b0
      val l4 = lit(20.0) * b3 - lit(30.0) * b2 + lit(12.0) * b1 - b0
      g.select(col("event_type"), n,
          round(l1, 4).as("l_mean"),
          round(l2, 4).as("l_scale"),
          round(l3 / l2, 4).as("l_skew"),
          round(l4 / l2, 4).as("l_kurt"))
        .orderBy(col("event_type"))
    },

    // Chi-square test of independence (event_type × day-of-week) +
    // Cramér's V effect size — the categorical-association audit
    // behind "does activity mix shift by weekday". One hash
    // aggregate collapses the fact table to the r×c contingency
    // cells (≤ |types|·7 rows); marginals re-aggregate the CELLS,
    // never the facts, and join back broadcast. Per-cell (O−E)²/E
    // is IEEE-identical in both engines; the cross-cell sum is
    // DECIMAL(28,10)-quantized (the repo-wide association-free
    // reduction idiom), so χ² matches bit-for-bit.
    "q_chi_square" -> { (s, dir) =>
      val cells = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          (dayofweek(col("ts")) - 1).as("dow"))
        .agg(count(lit(1)).as("o"))
      val rowt = cells.groupBy(col("event_type"))
        .agg(sum(col("o")).as("rt"))
      val colt = cells.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
      val tot = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("event_type")).as("r"),
        countDistinct(col("dow")).as("c"))
      val e = col("rt") * col("ct") / col("n").cast("double")
      cells.join(broadcast(rowt), "event_type")
        .join(broadcast(colt), "dow")
        .crossJoin(broadcast(tot))
        .select(col("n"), col("r"), col("c"),
          ((col("o") - e) * (col("o") - e) / e)
            .cast("decimal(28,10)").as("cell"))
        .groupBy(col("n"), col("r"), col("c"))
        .agg(sum(col("cell")).cast("decimal(28,10)").as("chi2d"))
        .select(col("n"),
          ((col("r") - 1) * (col("c") - 1)).as("df"),
          round(col("chi2d").cast("double"), 4).as("chi2"),
          round(sqrt(col("chi2d").cast("double") /
            (col("n") * least(col("r") - 1, col("c") - 1))), 4)
            .as("cramers_v"))
    },

    // Two-sample Kolmogorov–Smirnov per event_type (control vs
    // treatment arms, same md5 split as q_ab_ttest): D = max over
    // the value domain of |ECDF_c − ECDF_t|. Like Mann–Whitney, the
    // ECDFs live on the DISTINCT-(type,value) block aggregate — one
    // hash aggregate to per-block (cnt_c, cnt_t), a cumulative sum
    // over blocks, then a max. Every per-block step is IEEE division
    // of exact integer counts and max is association-free, so no
    // quantization is needed anywhere — the statistic is bit-exact
    // by construction. The 5% rejection uses the asymptotic
    // c(α)√((n₁+n₂)/n₁n₂) with c(0.05)=1.358, computed on the
    // UNROUNDED D so both engines agree at the boundary.
    "q_ks_test" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .withColumn("variant", variantOf(col("user_id")))
      val blocks = ev.groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("variant") === "control", 1L)
          .otherwise(0L)).as("bc"),
          sum(when(col("variant") === "treatment", 1L)
            .otherwise(0L)).as("bt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      val cum = blocks
        .withColumn("cc", sum(col("bc")).over(w))
        .withColumn("ct", sum(col("bt")).over(w))
        .withColumn("nc", sum(col("bc")).over(wAll))
        .withColumn("nt", sum(col("bt")).over(wAll))
      val d = abs(col("cc") / col("nc").cast("double") -
        col("ct") / col("nt").cast("double"))
      cum.groupBy(col("event_type"))
        .agg(first(col("nc")).as("n_c"), first(col("nt")).as("n_t"),
          max(d).as("d_raw"))
        .select(col("event_type"), col("n_c"), col("n_t"),
          round(col("d_raw"), 6).as("ks_stat"),
          round(lit(1.358) * sqrt((col("n_c") + col("n_t")) /
            (col("n_c") * col("n_t").cast("double"))), 6)
            .as("ks_crit"),
          (col("d_raw") > lit(1.358) *
            sqrt((col("n_c") + col("n_t")) /
              (col("n_c") * col("n_t").cast("double"))))
            .as("reject_05"))
        .orderBy(col("event_type"))
    },

    // Poisson bootstrap CI for the per-type mean — THE scalable
    // bootstrap: instead of drawing B full resamples (impossible
    // distributed — a true multinomial needs global coordination),
    // each row draws an independent Poisson(1) replication count per
    // replicate b, which converges to the multinomial bootstrap and
    // needs only ONE pass over B×n expanded rows (b is just another
    // grouping key). Replication counts come from the md5-uniform
    // inverse CDF (portable, deterministic); replicate means are
    // DECIMAL-quantized before the percentile step, so the 2.5/97.5
    // band is engine-exact. B=32 here; at 100 TB the same plan runs
    // with B as a literal and the expansion fused into the scan.
    "q_bootstrap_ci" -> { (s, dir) =>
      val B = 32
      // inverse CDF of Poisson(1) at the md5-uniform u
      val u = Portable.h60(concat(col("event_id").cast("string"),
        lit("_"), col("b").cast("string"))) / lit(Portable.two60)
      val w = when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4).otherwise(5)
      val boots = Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          col("value").cast("decimal(18,6)").as("v"))
        .withColumn("b", explode(expr(s"sequence(1, $B)")))
        .withColumn("w", w)
        .groupBy(col("event_type"), col("b"))
        .agg(sum((col("v") * col("w")).cast("decimal(28,6)"))
          .cast("decimal(28,6)").as("sv"),
          sum(col("w")).as("nw"))
        .select(col("event_type"),
          (col("sv").cast("double") / col("nw"))
            .cast("decimal(18,8)").as("bm"))
      val full = Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)").as("sv"))
      boots.groupBy(col("event_type"))
        .agg(expr("percentile(cast(bm as double), 0.025)").as("lo"),
          expr("percentile(cast(bm as double), 0.975)").as("hi"),
          count(lit(1)).as("n_boot"))
        .join(broadcast(full), "event_type")
        .select(col("event_type"), col("n"), col("n_boot"),
          round(col("sv").cast("double") / col("n"), 4)
            .as("mean_full"),
          round(col("lo"), 4).as("ci_lo"),
          round(col("hi"), 4).as("ci_hi"))
        .orderBy(col("event_type"))
    },

    // Two-model uplift readout — the incrementality table an
    // experimentation platform reports per segment: response rate
    // (value above the in-plan global median) in treatment vs
    // control, the uplift difference, and its Wald standard error.
    // One conditional aggregate per segment against a one-row
    // broadcast median — the q_ab_ttest shape with a binary
    // response; rates are exact integer ratios, the SE per-row IEEE.
    "q_uplift_two_model" -> { (s, dir) =>
      val med = Tables(s, dir, "events")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val ev = Tables(s, dir, "events").crossJoin(broadcast(med))
        .withColumn("variant", variantOf(col("user_id")))
        .withColumn("resp",
          when(col("value") > col("med"), 1L).otherwise(0L))
      val g = ev.groupBy(col("event_type")).agg(
        sum(when(col("variant") === "control", 1L).otherwise(0L))
          .as("n_c"),
        sum(when(col("variant") === "treatment", 1L).otherwise(0L))
          .as("n_t"),
        sum(when(col("variant") === "control", col("resp"))
          .otherwise(0L)).as("r_c"),
        sum(when(col("variant") === "treatment", col("resp"))
          .otherwise(0L)).as("r_t"))
      val pc = col("r_c") / col("n_c").cast("double")
      val pt = col("r_t") / col("n_t").cast("double")
      g.select(col("event_type"), col("n_c"), col("n_t"),
          round(pc, 4).as("rate_control"),
          round(pt, 4).as("rate_treatment"),
          round(pt - pc, 4).as("uplift"),
          round(sqrt(pc * (lit(1.0) - pc) / col("n_c") +
            pt * (lit(1.0) - pt) / col("n_t")), 6).as("se_uplift"))
        .orderBy(col("event_type"))
    },

    // Sample-ratio-mismatch check — the experiment-platform health
    // gate that runs BEFORE any readout is trusted: does the
    // md5-bucket arm split actually land 50/50 per segment? One
    // conditional aggregate, then the one-df χ² against the equal
    // split and the |z| > 3 alarm — exact integer counts, per-row
    // IEEE algebra, nothing but the |types| readout rows shuffle.
    "q_ab_srm_check" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .withColumn("variant", variantOf(col("user_id")))
      val g = ev.groupBy(col("event_type")).agg(
        sum(when(col("variant") === "control", 1L).otherwise(0L))
          .as("n_c"),
        sum(when(col("variant") === "treatment", 1L).otherwise(0L))
          .as("n_t"))
      val n = col("n_c") + col("n_t")
      val e = n / lit(2.0)
      val chi2 = (col("n_c") - e) * (col("n_c") - e) / e +
        (col("n_t") - e) * (col("n_t") - e) / e
      val z = (col("n_c") - e) / sqrt(n / lit(4.0))
      g.select(col("event_type"), col("n_c"), col("n_t"),
          round(col("n_c") / n.cast("double"), 4).as("share_control"),
          round(chi2, 4).as("srm_chi2"),
          round(z, 4).as("z_imbalance"),
          (abs(z) > 3.0).as("srm_alarm"))
        .orderBy(col("event_type"))
    },

    // Log-log price elasticity per brand — demand-curve OLS as a
    // closed-form aggregate: regress ln(quantity) on ln(price) over
    // line items, slope = elasticity, with R² from the same five
    // DECIMAL-quantized sums (Σx, Σy, Σxy, Σx², Σy²). The
    // retention-half-life fitting idiom applied per group: every
    // cross-row reduction exact, only the final algebra in doubles.
    "q_price_elasticity" -> { (s, dir) =>
      val pts = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          log(col("l_extendedprice")).cast("decimal(18,8)").as("x"),
          log(col("l_quantity")).cast("decimal(18,8)").as("y"))
      val g = pts.groupBy(col("p_brand")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(28,8)").as("sx"),
        sum(col("y")).cast("decimal(28,8)").as("sy"),
        // (18,8)×(18,8) products carry scale 16 exactly — no
        // intermediate cast, so nothing rounds before the sum
        sum(col("x") * col("y")).cast("decimal(38,16)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(38,16)").as("sx2"),
        sum(col("y") * col("y")).cast("decimal(38,16)").as("sy2"))
      val covn = col("n") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val varx = col("n") * col("sx2").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val vary = col("n") * col("sy2").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      g.select(col("p_brand"), col("n"),
          round(covn / varx, 4).as("elasticity"),
          round(covn * covn / (varx * vary), 4).as("r2"))
        .orderBy(col("p_brand"))
    },

    // Funnel by experiment arm — the table that actually decides a
    // launch: the signup→click→purchase ladder split by the md5
    // assignment, with per-stage conversion and the
    // treatment-vs-control delta at the final stage. Same bounded
    // min-aggregate stage chain as q_funnel_steps (one timestamp of
    // state per user per stage), the arm is just another grouping
    // key — no extra scan, no join beyond the stage chain.
    "q_funnel_by_variant" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("u"),
          col("event_type").as("et"))
        .withColumn("variant", variantOf(col("user_id")))
      val t1 = ev.filter(col("et") === "signup")
        .groupBy(col("variant"), col("user_id"))
        .agg(min(col("u")).as("t1"))
      val t2 = ev.filter(col("et") === "click")
        .join(t1, Seq("variant", "user_id"))
        .where(col("u") > col("t1"))
        .groupBy(col("variant"), col("user_id"))
        .agg(min(col("u")).as("t2"))
      val t3 = ev.filter(col("et") === "purchase")
        .join(t2, Seq("variant", "user_id"))
        .where(col("u") > col("t2"))
        .groupBy(col("variant"), col("user_id"))
        .agg(min(col("u")).as("t3"))
      // t1/t2/t3 are already one row per (variant, user): plain
      // count — a countDistinct here would plan an extra Expand +
      // distinct-aggregate shuffle for identical values
      val s1 = t1.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_signup"))
      val s2 = t2.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_click"))
      val s3 = t3.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_purchase"))
      s1.join(s2, Seq("variant"), "left")
        .join(s3, Seq("variant"), "left")
        .select(col("variant"), col("n_signup"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
          round(coalesce(col("n_click"), lit(0L)) /
            col("n_signup").cast("double"), 4).as("cr_click"),
          round(coalesce(col("n_purchase"), lit(0L)) /
            col("n_signup").cast("double"), 4).as("cr_purchase"))
        .orderBy(col("variant"))
    },

    // Audience overlap matrix — pairwise Jaccard of the user sets
    // behind each event type ("how much do clickers and buyers
    // overlap"): distinct (type, user) rows self-join on the USER
    // key (per-user fan-out ≤ |types|², never |users|²),
    // intersections aggregate map-side, unions come from the
    // broadcast per-type distinct counts by inclusion–exclusion.
    "q_user_overlap_jaccard" -> { (s, dir) =>
      val tu = Tables(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id"))
        .distinct()
      val sizes = tu.groupBy(col("t"))
        .agg(countDistinct(col("user_id")).as("n"))
      val inter = tu.select(col("t").as("ta"), col("user_id"))
        .join(tu.select(col("t").as("tb"), col("user_id")),
          Seq("user_id"))
        .where(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(broadcast(sizes.select(col("t").as("ta"),
          col("n").as("na"))), Seq("ta"))
        .join(broadcast(sizes.select(col("t").as("tb"),
          col("n").as("nb"))), Seq("tb"))
        .select(col("ta"), col("tb"), col("na"), col("nb"),
          col("n_both"),
          round(col("n_both") /
            (col("na") + col("nb") - col("n_both")).cast("double"),
            4).as("jaccard"))
        .orderBy(col("ta"), col("tb"))
    })

  val oracles: Map[String, String] = Map(

    "q_ab_ttest" ->
      """WITH ev AS (
           SELECT event_type, value,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         g AS (
           SELECT event_type,
             count(CASE WHEN variant = 'control' THEN value END) AS n_c,
             count(CASE WHEN variant = 'treatment' THEN value END) AS n_t,
             avg(CASE WHEN variant = 'control' THEN value END) AS m_c,
             avg(CASE WHEN variant = 'treatment' THEN value END) AS m_t,
             var_samp(CASE WHEN variant = 'control' THEN value END) AS s2_c,
             var_samp(CASE WHEN variant = 'treatment' THEN value END) AS s2_t
           FROM ev GROUP BY event_type)
         SELECT event_type, n_c, n_t,
           round(m_c, 4) AS mean_control,
           round(m_t, 4) AS mean_treatment,
           round((m_t - m_c) / sqrt(s2_c / n_c + s2_t / n_t), 4) AS t_stat,
           round(pow(s2_c / n_c + s2_t / n_t, 2) /
             (pow(s2_c / n_c, 2) / (n_c - 1) +
              pow(s2_t / n_t, 2) / (n_t - 1)), 2) AS welch_df
         FROM g ORDER BY event_type""",

    "q_outlier_mad" ->
      """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
         mad AS (
           SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
           FROM events e JOIN med m USING (event_type)
           GROUP BY e.event_type, m.med)
         SELECT e.event_type,
           round(any_value(m.med), 4) AS median,
           round(any_value(m.mad), 4) AS mad,
           count(*) AS n,
           CAST(sum(CASE WHEN 0.6745 * abs(e.value - m.med) / m.mad > 3.5
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(0.6745 * abs(e.value - m.med) / m.mad), 4)
             AS max_robust_z
         FROM events e JOIN mad m USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",

    "q_winsorize" ->
      """WITH qs AS (
           SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS p05,
             round(quantile_cont(value, 0.95), 6) AS p95
           FROM events GROUP BY event_type)
         SELECT e.event_type, count(*) AS n,
           round(avg(e.value), 4) AS mean_raw,
           round(avg(greatest(least(e.value, q.p95), q.p05)), 4)
             AS mean_winsor,
           round(stddev_samp(greatest(least(e.value, q.p95), q.p05)), 4)
             AS sd_winsor,
           CAST(sum(CASE WHEN e.value < q.p05 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN e.value > q.p95 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_hi
         FROM events e JOIN qs q USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",

    "q_theil_sen" ->
      """WITH s AS (
           SELECT event_type, event_id, epoch_us(ts) AS us, value
           FROM (
             SELECT *, ('0x' || substring(md5(CAST(event_id AS VARCHAR))
                 , 1, 15))::BIGINT AS h,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY ('0x' || substring(md5(CAST(event_id AS VARCHAR))
                   , 1, 15))::BIGINT, event_id) AS rn
             FROM events) WHERE rn <= 48),
         pairs AS (
           SELECT a.event_type,
             (b.value - a.value) / ((b.us - a.us) / 3600000000.0)
               AS slope
           FROM s a JOIN s b
             ON a.event_type = b.event_type
             AND a.event_id < b.event_id AND a.us <> b.us)
         SELECT event_type, count(*) AS n_pairs,
           round(quantile_cont(slope, 0.5), 6)
             AS median_slope_per_hour
         FROM pairs GROUP BY event_type ORDER BY event_type""",

    "q_ewma" ->
      """WITH seq AS (
           SELECT user_id,
             array_agg(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_user
           FROM events)
         SELECT user_id, n_user AS n_events,
           round(vals[len(vals)], 4) AS last_value,
           round(
             list_sum(list_transform(generate_series(1, len(vals)),
               i -> vals[i] * pow(0.7, len(vals) - i))) /
             list_sum(list_transform(generate_series(1, len(vals)),
               i -> pow(0.7, len(vals) - i))), 4) AS ewma
         FROM seq WHERE rn = n_user ORDER BY user_id""",

    "q_skew_audit" ->
      """WITH c AS (
           SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
         t AS (SELECT sum(n) AS total_rows, count(*) AS n_keys FROM c)
         SELECT c.user_id, c.n,
           round(c.n / t.total_rows, 6) AS share,
           round(c.n * t.n_keys / t.total_rows, 4) AS x_uniform
         FROM c, t ORDER BY c.n DESC, c.user_id LIMIT 10""",

    "q_benford_audit" ->
      """WITH d AS (
           SELECT CAST(floor(o_totalprice /
             pow(10.0, floor(log10(o_totalprice)))) AS INT) AS digit
           FROM orders WHERE o_totalprice > 0),
         c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
         t AS (SELECT sum(n_obs) AS n_total FROM c),
         x AS (
           SELECT digit, n_obs,
             n_obs / n_total AS obs_share,
             log10(1.0 + 1.0 / digit) AS benford_share,
             pow(n_obs - n_total * log10(1.0 + 1.0 / digit), 2) /
               (n_total * log10(1.0 + 1.0 / digit)) AS chi2_term
           FROM c, t)
         SELECT digit, n_obs,
           round(obs_share, 6) AS obs_share,
           round(benford_share, 6) AS benford_share,
           round(chi2_term, 4) AS chi2_term,
           round(sum(chi2_term) OVER (), 4) AS chi2_total
         FROM x ORDER BY digit""",

    "q_gini_concentration" ->
      """WITH rev AS (
           SELECT c_mktsegment, c_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS DECIMAL(18,6)) AS rev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         rk AS (
           SELECT c_mktsegment, rev,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY rev, c_custkey) AS r
           FROM rev),
         g AS (
           SELECT c_mktsegment, count(*) AS n_customers,
             CAST(sum(rev) AS DECIMAL(28,6)) AS total_revenue,
             -- DECIMAL(28) operand casts keep the r*rev product on
             -- DuckDB's int128 path (int64 overflows at sf10)
             CAST(sum(CAST(CAST(r AS DECIMAL(28,0))
               * CAST(rev AS DECIMAL(28,6))
               AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS s_rx
           FROM rk GROUP BY 1)
         SELECT c_mktsegment, n_customers,
           CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE)
             AS total_revenue,
           round(2.0 * s_rx::DOUBLE /
             (n_customers * total_revenue::DOUBLE) -
             (n_customers + 1.0) / n_customers, 6) AS gini
         FROM g ORDER BY c_mktsegment""",

    "q_ab_cuped" ->
      """WITH u AS (
           SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             CAST(sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16'
                 THEN value ELSE 0.0 END AS DECIMAL(18,6)))
               AS DECIMAL(18,6))::DOUBLE AS x,
             CAST(sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                 THEN value ELSE 0.0 END AS DECIMAL(18,6)))
               AS DECIMAL(18,6))::DOUBLE AS y
           FROM events GROUP BY user_id),
         g AS (SELECT avg(x) AS xbar,
             covar_samp(x, y) / var_samp(x) AS theta FROM u),
         a AS (
           SELECT variant, y, y - g.theta * (x - g.xbar) AS y_adj
           FROM u, g)
         SELECT variant, count(*) AS n_users,
           round(avg(y), 4) AS mean_y,
           round(avg(y_adj), 4) AS mean_y_cuped,
           round(1.0 - var_samp(y_adj) / var_samp(y), 4)
             AS var_reduction
         FROM a GROUP BY variant ORDER BY variant""",

    "q_mannwhitney" ->
      """WITH ev AS (
           SELECT event_type, value,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         b AS (
           SELECT event_type, value, count(*) AS cnt,
             CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
               AS BIGINT) AS cnt_t
           FROM ev GROUP BY 1, 2),
         r AS (
           SELECT event_type, cnt, cnt_t,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM b),
         g AS (
           SELECT event_type,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt_t) AS BIGINT) AS n_t,
             sum(cnt_t * (cum - (cnt - 1.0) / 2.0)) AS r_t,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
           FROM r GROUP BY 1)
         SELECT event_type,
           CAST(n - n_t AS BIGINT) AS n_c, n_t,
           r_t - n_t * (n_t + 1) / 2.0 AS u_stat,
           round((r_t - n_t * (n_t + 1) / 2.0 - (n - n_t) * n_t / 2.0) /
             sqrt((n - n_t) * n_t / 12.0 *
               ((n + 1) - tie_sum / (n * (n - 1.0)))), 4) AS z_stat
         FROM g ORDER BY event_type""",

    "q_fdr_bh" ->
      """WITH ev AS (
           SELECT event_type, value,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         g AS (
           SELECT event_type,
             count(CASE WHEN variant = 'control' THEN value END) AS n_c,
             count(CASE WHEN variant = 'treatment' THEN value END) AS n_t,
             avg(CASE WHEN variant = 'control' THEN value END) AS m_c,
             avg(CASE WHEN variant = 'treatment' THEN value END) AS m_t,
             var_samp(CASE WHEN variant = 'control' THEN value END) AS s2_c,
             var_samp(CASE WHEN variant = 'treatment' THEN value END) AS s2_t
           FROM ev GROUP BY event_type),
         t AS (
           SELECT event_type,
             (m_t - m_c) / sqrt(s2_c / n_c + s2_t / n_t) AS t_stat
           FROM g),
         p AS (
           SELECT event_type, t_stat,
             2.0 / (1.0 + exp(1.5976 * abs(t_stat) *
               (1.0 + 0.04417 * t_stat * t_stat))) AS p_value
           FROM t),
         r AS (
           SELECT event_type, t_stat, p_value,
             row_number() OVER (ORDER BY p_value, event_type) AS i,
             count(*) OVER () AS m
           FROM p),
         k AS (
           SELECT *, CAST(i AS DOUBLE) * 0.10 / m AS crit FROM r),
         f AS (
           SELECT *, max(CASE WHEN p_value <= crit THEN i END)
             OVER () AS kmax
           FROM k)
         SELECT event_type, round(t_stat, 4) AS t_stat,
           round(p_value, 6) AS p_value,
           i AS p_rank, round(crit, 6) AS bh_crit,
           i <= coalesce(kmax, 0) AS significant
         FROM f ORDER BY p_rank""",

    "q_l_moments" ->
      """WITH rk AS (
           SELECT event_type,
             CAST(value AS DECIMAL(18,6)) AS x,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(value AS DECIMAL(18,6)), event_id)
               AS BIGINT) AS r
           FROM events),
         g AS (
           SELECT event_type,
             count(*) AS n,
             CAST(sum(x) AS DECIMAL(38,6)) AS s0,
             CAST(sum(CAST(x * (r - 1) AS DECIMAL(30,6)))
               AS DECIMAL(38,6)) AS s1,
             CAST(sum(CAST(x * ((r - 1) * (r - 2)) AS DECIMAL(30,6)))
               AS DECIMAL(38,6)) AS s2,
             CAST(sum(CAST(x * ((r - 1) * (r - 2) * (r - 3))
               AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS s3
           FROM rk GROUP BY 1),
         b AS (
           -- double denominators (n::DOUBLE first makes the whole
           -- left-assoc product double): the BIGINT n^(4) overflows
           -- int64 past n ~55k — the sf1 soak cliff; mirrors the
           -- Spark side's nd formulation bit-for-bit
           SELECT event_type, n,
             s0::DOUBLE / n AS b0,
             s1::DOUBLE / (n::DOUBLE * (n - 1)) AS b1,
             s2::DOUBLE / (n::DOUBLE * (n - 1) * (n - 2)) AS b2,
             s3::DOUBLE / (n::DOUBLE * (n - 1) * (n - 2) * (n - 3))
               AS b3
           FROM g)
         SELECT event_type, n,
           round(b0, 4) AS l_mean,
           round(2.0 * b1 - b0, 4) AS l_scale,
           round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0), 4)
             AS l_skew,
           round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0) /
             (2.0 * b1 - b0), 4) AS l_kurt
         FROM b ORDER BY event_type""",

    "q_chi_square" ->
      """WITH cells AS (
           SELECT event_type, CAST(extract(dow FROM ts) AS INT) AS dow,
             count(*) AS o
           FROM events GROUP BY 1, 2),
         rowt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
         colt AS (SELECT dow, sum(o) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             count(DISTINCT event_type) AS r,
             count(DISTINCT dow) AS c FROM cells),
         s AS (
           SELECT any_value(t.n) AS n, any_value(t.r) AS r,
             any_value(t.c) AS c,
             CAST(sum(CAST((cl.o - rw.rt * co.ct / t.n::DOUBLE)
               * (cl.o - rw.rt * co.ct / t.n::DOUBLE)
               / (rw.rt * co.ct / t.n::DOUBLE) AS DECIMAL(28,10)))
               AS DECIMAL(28,10)) AS chi2d
           FROM cells cl
           JOIN rowt rw USING (event_type)
           JOIN colt co USING (dow)
           CROSS JOIN tot t)
         SELECT n, (r - 1) * (c - 1) AS df,
           round(chi2d::DOUBLE, 4) AS chi2,
           round(sqrt(chi2d::DOUBLE / (n * least(r - 1, c - 1))), 4)
             AS cramers_v
         FROM s""",

    "q_ks_test" ->
      """WITH ev AS (
           SELECT event_type, value,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         blocks AS (
           SELECT event_type, value,
             sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END) AS bc,
             sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END) AS bt
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT event_type,
             sum(bc) OVER (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(bt) OVER (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
             sum(bc) OVER (PARTITION BY event_type) AS nc,
             sum(bt) OVER (PARTITION BY event_type) AS nt
           FROM blocks),
         g AS (
           SELECT event_type,
             CAST(any_value(nc) AS BIGINT) AS n_c,
             CAST(any_value(nt) AS BIGINT) AS n_t,
             max(abs(cc / nc::DOUBLE - ct / nt::DOUBLE)) AS d_raw
           FROM cum GROUP BY 1)
         SELECT event_type, n_c, n_t,
           round(d_raw, 6) AS ks_stat,
           round(1.358 * sqrt((n_c + n_t) / (n_c * n_t::DOUBLE)), 6)
             AS ks_crit,
           d_raw > 1.358 * sqrt((n_c + n_t) / (n_c * n_t::DOUBLE))
             AS reject_05
         FROM g ORDER BY event_type""",

    "q_bootstrap_ci" ->
      """WITH ex AS (
           SELECT event_type, event_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             unnest(generate_series(1, 32)) AS b
           FROM events),
         ww AS (
           SELECT event_type, b, v,
             CASE
               WHEN u < 0.36787944117144233 THEN 0
               WHEN u < 0.7357588823428847 THEN 1
               WHEN u < 0.9196986029286058 THEN 2
               WHEN u < 0.9810118431238462 THEN 3
               WHEN u < 0.9963401531726563 THEN 4
               ELSE 5 END AS w
           FROM (
             SELECT *,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_' ||
                 CAST(b AS VARCHAR)), 1, 15))::BIGINT
                 / 1152921504606846976.0 AS u
             FROM ex)),
         boots AS (
           SELECT event_type, b,
             CAST(CAST(sum(CAST(v * w AS DECIMAL(28,6)))
                 AS DECIMAL(28,6))::DOUBLE / sum(w)
               AS DECIMAL(18,8)) AS bm
           FROM ww GROUP BY 1, 2),
         fullm AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6)))
               AS DECIMAL(28,6)) AS sv
           FROM events GROUP BY 1),
         ci AS (
           SELECT event_type,
             quantile_cont(bm::DOUBLE, 0.025) AS lo,
             quantile_cont(bm::DOUBLE, 0.975) AS hi,
             count(*) AS n_boot
           FROM boots GROUP BY 1)
         SELECT f.event_type, f.n, c.n_boot,
           round(f.sv::DOUBLE / f.n, 4) AS mean_full,
           round(c.lo, 4) AS ci_lo,
           round(c.hi, 4) AS ci_hi
         FROM ci c JOIN fullm f USING (event_type)
         ORDER BY f.event_type""",

    "q_uplift_two_model" ->
      """WITH med AS (
           SELECT quantile_cont(value, 0.5) AS med FROM events),
         ev AS (
           SELECT event_type,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             CASE WHEN value > m.med THEN 1 ELSE 0 END AS resp
           FROM events, med m),
         g AS (
           SELECT event_type,
             CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN variant = 'control' THEN resp ELSE 0 END)
               AS BIGINT) AS r_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN resp ELSE 0 END)
               AS BIGINT) AS r_t
           FROM ev GROUP BY 1)
         SELECT event_type, n_c, n_t,
           round(r_c / n_c::DOUBLE, 4) AS rate_control,
           round(r_t / n_t::DOUBLE, 4) AS rate_treatment,
           round(r_t / n_t::DOUBLE - r_c / n_c::DOUBLE, 4) AS uplift,
           round(sqrt((r_c / n_c::DOUBLE) * (1.0 - r_c / n_c::DOUBLE)
               / n_c
             + (r_t / n_t::DOUBLE) * (1.0 - r_t / n_t::DOUBLE)
               / n_t), 6) AS se_uplift
         FROM g ORDER BY event_type""",

    "q_ab_srm_check" ->
      """WITH ev AS (
           SELECT event_type,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         g AS (
           SELECT event_type,
             CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_t
           FROM ev GROUP BY 1)
         SELECT event_type, n_c, n_t,
           round(n_c / (n_c + n_t)::DOUBLE, 4) AS share_control,
           round((n_c - (n_c + n_t) / 2.0) * (n_c - (n_c + n_t) / 2.0)
               / ((n_c + n_t) / 2.0)
             + (n_t - (n_c + n_t) / 2.0) * (n_t - (n_c + n_t) / 2.0)
               / ((n_c + n_t) / 2.0), 4) AS srm_chi2,
           round((n_c - (n_c + n_t) / 2.0)
             / sqrt((n_c + n_t) / 4.0), 4) AS z_imbalance,
           abs((n_c - (n_c + n_t) / 2.0)
             / sqrt((n_c + n_t) / 4.0)) > 3.0 AS srm_alarm
         FROM g ORDER BY event_type""",

    "q_price_elasticity" ->
      """WITH pts AS (
           -- (19,8): DuckDB needs the wider type so the scale-16
           -- product stays inside DECIMAL(38,16) int128 arithmetic
           -- (18×18 would overflow its int64 multiply path); the
           -- VALUES equal Spark's (18,8) exactly
           SELECT p.p_brand,
             CAST(ln(l.l_extendedprice) AS DECIMAL(19,8)) AS x,
             CAST(ln(l.l_quantity) AS DECIMAL(19,8)) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         g AS (
           SELECT p_brand, count(*) AS n,
             CAST(sum(x) AS DECIMAL(28,8)) AS sx,
             CAST(sum(y) AS DECIMAL(28,8)) AS sy,
             CAST(sum(x * y) AS DECIMAL(38,16)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(38,16)) AS sx2,
             CAST(sum(y * y) AS DECIMAL(38,16)) AS sy2
           FROM pts GROUP BY 1)
         SELECT p_brand, n,
           round((n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE), 4)
             AS elasticity,
           round((n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             * (n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / ((n * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
               * (n * sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4)
             AS r2
         FROM g ORDER BY p_brand""",

    "q_funnel_by_variant" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS u, event_type AS et,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         t1 AS (
           SELECT variant, user_id, min(u) AS t1 FROM ev
           WHERE et = 'signup' GROUP BY 1, 2),
         t2 AS (
           SELECT e.variant, e.user_id, min(e.u) AS t2
           FROM ev e JOIN t1 ON e.variant = t1.variant
             AND e.user_id = t1.user_id
           WHERE e.et = 'click' AND e.u > t1.t1 GROUP BY 1, 2),
         t3 AS (
           SELECT e.variant, e.user_id, min(e.u) AS t3
           FROM ev e JOIN t2 ON e.variant = t2.variant
             AND e.user_id = t2.user_id
           WHERE e.et = 'purchase' AND e.u > t2.t2 GROUP BY 1, 2),
         s1 AS (SELECT variant, count(DISTINCT user_id) AS n_signup
           FROM t1 GROUP BY 1),
         s2 AS (SELECT variant, count(DISTINCT user_id) AS n_click
           FROM t2 GROUP BY 1),
         s3 AS (SELECT variant, count(DISTINCT user_id) AS n_purchase
           FROM t3 GROUP BY 1)
         SELECT s1.variant, s1.n_signup,
           CAST(coalesce(s2.n_click, 0) AS BIGINT) AS n_click,
           CAST(coalesce(s3.n_purchase, 0) AS BIGINT) AS n_purchase,
           round(coalesce(s2.n_click, 0) / s1.n_signup::DOUBLE, 4)
             AS cr_click,
           round(coalesce(s3.n_purchase, 0) / s1.n_signup::DOUBLE, 4)
             AS cr_purchase
         FROM s1
         LEFT JOIN s2 ON s1.variant = s2.variant
         LEFT JOIN s3 ON s1.variant = s3.variant
         ORDER BY s1.variant""",

    "q_user_overlap_jaccard" ->
      """WITH tu AS (
           SELECT DISTINCT event_type AS t, user_id FROM events),
         sizes AS (
           SELECT t, count(DISTINCT user_id) AS n FROM tu GROUP BY 1),
         inter AS (
           SELECT a.t AS ta, b.t AS tb, count(*) AS n_both
           FROM tu a JOIN tu b ON a.user_id = b.user_id
             AND a.t < b.t
           GROUP BY 1, 2)
         SELECT i.ta, i.tb, sa.n AS na, sb.n AS nb, i.n_both,
           round(i.n_both / (sa.n + sb.n - i.n_both)::DOUBLE, 4)
             AS jaccard
         FROM inter i
         JOIN sizes sa ON i.ta = sa.t
         JOIN sizes sb ON i.tb = sb.t
         ORDER BY i.ta, i.tb""")
}
