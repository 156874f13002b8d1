package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics operators over the event stream — ordered
  * funnels, cohort retention, and a count-min frequency sketch —
  * the workloads an events table exists for.
  *
  * Scale designs:
  *  - the funnel folds each user's sorted event array with a
  *    higher-order `aggregate` — ONE shuffle on user_id, no window,
  *    no per-step self-join (the DuckDB oracle uses the textbook
  *    3-stage join chain, which is provably the same greedy
  *    earliest-step semantics — a deliberate two-formulation check);
  *  - cohort retention is integer epoch-week arithmetic and three
  *    hash aggregates — no calendar table, no window;
  *  - the count-min sketch is FIXED d×w state (4×256 counters)
  *    regardless of input size, built with map-side partial
  *    aggregation — the bounded-memory answer to per-key counting
  *    when |keys| itself is the scale problem; estimates are
  *    oracle-exact because the bucket hash is the engine-portable
  *    md5 idiom shared with the dedup/sampling families.
  */
object AnalyticsQueries {

  private val cmsDepth = 4
  private val cmsWidth = 256

  /** All d bucket positions from ONE md5 digest per row,
    * Kirsch–Mitzenmacher style: bucket_j = (h1 + j·h2) mod w with h1
    * and h2 the digest's first two 32-bit hex windows — the same
    * one-digest lesson the bloom-filter expressions encode (d
    * independent digests per row quadruple the hash cost for no
    * statistical gain). The digest is extracted in a PROJECTION
    * (whole-stage codegen + runtime subexpression elimination → one
    * md5 per row); only the j-arithmetic sits inside the transform
    * lambda, because higher-order-function lambdas evaluate
    * interpreted PER ELEMENT — a first cut that put the digest
    * inside the lambda paid 8 interpreted digests per row and was
    * SLOWER than four independent ones. Portable: DuckDB replays the
    * identical arithmetic bit-for-bit.
    */
  private[graft] def withDigestHalves(df: DataFrame, key: Column): DataFrame = {
    val h = md5(key.cast("string"))
    df.select(df.columns.map(col) :+
      conv(substring(h, 1, 8), 16, 10).cast("long").as("h1") :+
      conv(substring(h, 9, 8), 16, 10).cast("long").as("h2"): _*)
  }

  private[graft] def cmsCells: Column =
    transform(sequence(lit(0), lit(cmsDepth - 1)),
      j => (col("h1") + j * col("h2")) % cmsWidth)

  /** The deterministic k=256 per-group sample: the k rows with the
    * smallest md5(event_id), sorted values collected per group.
    * Shared by the quantile sketch and equi-depth binning; `est(q)`
    * reads the q-quantile from the sorted sample.
    */
  private def sampleSorted(s: SparkSession, dir: String,
      k: Int = 256): DataFrame = {
    val h = Portable.h60(col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"),
        h.as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("sv"),
        count(lit(1)).as("n_sample"))
  }

  private def est(q: Double): Column = round(element_at(col("sv"),
    greatest(lit(1), ceil(lit(q) * col("n_sample")).cast("int"))), 4)

  /** Per-user funnel stage (0–3) — the single-shuffle HOF fold; also
    * the batch side of the stream-parity gate (FunnelStreamSpec).
    */
  private[graft] def userStages(s: SparkSession, dir: String): DataFrame =
    userStagesFold(Tables(s, dir, "events"))

  /** The collect_list + HOF-fold formulation: ONE shuffle, but the
    * whole per-user event array materializes in a single task — fine
    * until a whale user (bot, load tester) concentrates millions of
    * events on one key. Gated by [[funnelStages]]; the fold stays the
    * default because at healthy per-key cardinality it is the faster
    * plan (single exchange, codegen'd walk).
    */
  private[graft] def userStagesFold(ev: DataFrame): DataFrame = {
    val stage = aggregate(col("evs"),
      struct(lit(0).as("st"), lit(-1L).as("t")),
      (acc, e) => {
        val st = acc.getField("st"); val t = acc.getField("t")
        val u = e.getField("u"); val et = e.getField("et")
        when(st === 0 && et === "signup",
            struct(lit(1).as("st"), u.as("t")))
          .when(st === 1 && et === "click" && u > t,
            struct(lit(2).as("st"), u.as("t")))
          .when(st === 2 && et === "purchase" && u > t,
            struct(lit(3).as("st"), u.as("t")))
          .otherwise(acc)
      }).getField("st")
    ev
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("u"),
          col("event_type").as("et")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"), stage.as("stage"))
  }

  /** Whale-safe funnel: the same greedy-earliest semantics as the
    * fold, re-expressed as three conditional-min aggregates whose
    * per-key state is ONE long each — no task ever materializes a
    * user's event list, so a 100M-event bot key costs exactly what a
    * 10-event key costs per row. The stage recurrence
    * `t1 = min(signup); t2 = min(click > t1); t3 = min(purchase >
    * t2)` is the fold's fixed point (greedy earliest is optimal for
    * funnel reachability, so min at each step IS the greedy choice;
    * strict `>` preserves the fold's same-µs tie rule). Cost: three
    * aggregates over event subsets plus |users|-sized joins — more
    * shuffles than the fold, each with O(1) per-key state. This is
    * the 100×-scale path; [[funnelStages]] picks it when a measured
    * per-key count says the fold's array would be a memory risk.
    */
  private[graft] def userStagesBounded(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"),
      unix_micros(col("ts")).as("u"), col("event_type").as("et"))
    val t1 = ev.filter(col("et") === "signup")
      .groupBy(col("user_id")).agg(min(col("u")).as("t1"))
    val t2 = ev.filter(col("et") === "click")
      .join(t1, "user_id")
      .filter(col("u") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("u")).as("t2"))
    val t3 = ev.filter(col("et") === "purchase")
      .join(t2, "user_id")
      .filter(col("u") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("u")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(t1.select(col("user_id"), lit(1).as("s1")),
        Seq("user_id"), "left")
      .join(t2.select(col("user_id"), lit(2).as("s2")),
        Seq("user_id"), "left")
      .join(t3.select(col("user_id"), lit(3).as("s3")),
        Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("s3"), col("s2"), col("s1"), lit(0)).as("stage"))
  }

  /** Funnel front door: measure max events-per-key first (one
    * map-side-partial count aggregate — the operator's one eager
    * action, same sizing discipline as
    * [[graft.operators.Dedup.connectedComponents]]'s
    * `driverMaxEdges`), then run the fold when every key's array is
    * comfortably bounded, the O(1)-state formulation when any key is
    * a whale. FunnelGateSpec pins both paths row-identical and the
    * gate's flip point.
    */
  private[graft] def funnelStages(ev: DataFrame,
      foldMaxPerUser: Long = 1L << 16): DataFrame = {
    val maxPerKey = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("c")).agg(max(col("c")))
      .head().getLong(0)
    if (maxPerKey <= foldMaxPerUser) userStagesFold(ev)
    else userStagesBounded(ev)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization: a 6-hour silence starts a new
    // session; session ids are the running count of session starts
    // (lag + cumulative sum in ONE user-key window), then per-session
    // stats. The follow-up groupBy(user, session) reuses the
    // window's hash partitioning on user_id (a prefix of the group
    // key), so the whole query is a SINGLE shuffle — the plan gate
    // in AnalyticsSpec pins that. Durations are exact integer
    // microsecond arithmetic, no doubles anywhere.
    "q_sessionize" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val us = expr("unix_micros(ts)")
      val gapUs = 21600L * 1000000L
      val isNew = when(
        us - lag(us, 1).over(seq) > gapUs || lag(us, 1).over(seq).isNull,
        1L).otherwise(0L)
      Tables(s, dir, "events")
        .withColumn("session_seq",
          sum(isNew).over(seq.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          ((max(us) - min(us)) / lit(1000L)).cast("long")
            .as("duration_ms"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // Ordered funnel signup → click → purchase per user: the stage
    // counter advances on the EARLIEST event of the next step
    // strictly after the previous step's time (greedy earliest is
    // optimal for funnel reachability). Each user's events collect
    // into one sorted array and a codegen'd HOF fold walks it once
    // (userStages — shared with the streaming-parity spec). The
    // funnelStages gate swaps in the O(1)-per-key-state formulation
    // when a measured per-key count finds a whale user.
    "q_funnel_steps" -> { (s, dir) =>
      funnelStages(Tables(s, dir, "events"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("stage"))
    },

    // Cohort retention: users cohort by first-active epoch-week
    // (integer floor-div of epoch-µs — no calendar arithmetic to
    // disagree on), and each later active week counts them under
    // (cohort_wk, weeks-since-cohort). act is distinct(user, week),
    // so the final count(*) is already distinct users.
    "q_cohort_retention" -> { (s, dir) =>
      val act = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .distinct()
      val cohorts = act.groupBy(col("user_id"))
        .agg(min(col("wk")).as("c0"))
      act.join(cohorts, "user_id")
        .groupBy(col("c0").as("cohort_wk"),
          (col("wk") - col("c0")).as("wk_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_wk"), col("wk_offset"))
    },

    // Count-min sketch frequency estimates for part keys in the
    // lineitem fact: d=4 hash rows × w=256 counters, built in one
    // pass (each row explodes to its 4 (row, bucket) cells; the
    // groupBy partial-aggregates map-side down to ≤1024 cells), then
    // 50 probe keys read min-over-rows. `est >= exact` always
    // (collisions only inflate) — both columns are emitted and the
    // inequality is spec-gated; the estimates are oracle-exact
    // because the bucket hash replays in DuckDB.
    "q_agg_heavy_hitters_cms" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(col("l_partkey"))
      // r13 note: a count-per-key pre-aggregation before the md5
      // (30x less digest work at sf0.1) was tried and REVERTED — it
      // swaps the sketch-sized exchange (≤ d·w live cells per map
      // partition, input-invariant) for a per-key exchange that
      // grows with the key domain, which is exactly the discipline
      // ScalingSpec's CMS decade gate pins for 100 TB. What stays:
      // the cell index j is exploded as a plain codegen column
      // instead of a per-element INTERPRETED transform lambda (the
      // old posexplode(cmsCells)) — same (j, bucket) values, same
      // shuffle, ~2x less per-row CPU in the scan stage.
      val sketch = withDigestHalves(li, col("l_partkey"))
        .select(col("h1"), col("h2"),
          explode(sequence(lit(0), lit(cmsDepth - 1))).as("j"))
        .select(col("j"),
          ((col("h1") + col("j") * col("h2")) % cmsWidth).as("bucket"))
        .groupBy(col("j"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val probes = li.filter(col("l_partkey") < 50)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact"))
      val probeCells = withDigestHalves(probes, col("l_partkey"))
        .select(col("l_partkey"), col("exact"),
          posexplode(cmsCells).as(Seq("j", "bucket")))
      probeCells.join(sketch, Seq("j", "bucket"))
        .groupBy(col("l_partkey"), col("exact"))
        .agg(min(col("cnt")).as("est"))
        .select(col("l_partkey"), col("est"), col("exact"))
        .orderBy(col("l_partkey"))
    },
    // Bounded-memory quantile estimation — the percentile analogue
    // of the HLL/KMV/CMS sketches: a FIXED k=256 sample per group,
    // chosen as the k smallest md5(event_id) values (hash order ≈
    // uniform random, and deterministic — so DuckDB draws the SAME
    // sample and the estimates are oracle-exact, not
    // contract-bounded). The rank filter is the WindowGroupLimit
    // pattern (plan-pinned for q_topk_per_group): each map task
    // forwards at most k rows per group, so the shuffle is k·groups
    // where exact percentile sorts the world. Estimates sit beside
    // the exact quantiles; expected rank error is ~1/√k
    // (AnalyticsSpec gates it).
    "q_agg_quantile_sketch" -> { (s, dir) =>
      val samp = sampleSorted(s, dir)
      val exact = Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(percentile(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
      samp.join(exact, "event_type")
        .select(col("event_type"), col("n_sample"),
          est(0.5).as("est_p50"), est(0.9).as("est_p90"),
          est(0.99).as("est_p99"),
          round(element_at(col("p"), 1), 6).as("exact_p50"),
          round(element_at(col("p"), 2), 6).as("exact_p90"),
          round(element_at(col("p"), 3), 6).as("exact_p99"))
        .orderBy(col("event_type"))
    },
    // Equi-depth (quantile-boundary) binning — the complement of the
    // equal-WIDTH histogram (q_agg_histogram): bin edges are the
    // sample quartiles, so each bin holds ~25% of its group. The
    // classic formulation (global ntile) sorts the world; here the
    // boundaries come from the fixed deterministic sample (a tiny
    // 5-row broadcast) and bin assignment is a map-side CASE — the
    // fact table never shuffles before the final per-bin rollup.
    // Quantization: boundaries are the sample values rounded to 4
    // places, identical in the oracle, so bin membership is
    // bit-deterministic.
    "q_equidepth_bins" -> { (s, dir) =>
      val bounds = sampleSorted(s, dir)
        .select(col("event_type"), est(0.25).as("b1"),
          est(0.5).as("b2"), est(0.75).as("b3"))
      Tables(s, dir, "events")
        .join(broadcast(bounds), "event_type")
        .withColumn("bin",
          when(col("value") <= col("b1"), 0)
            .when(col("value") <= col("b2"), 1)
            .when(col("value") <= col("b3"), 2)
            .otherwise(3))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
        .orderBy(col("event_type"), col("bin"))
    },

    // Point-in-time-correct feature assembly — the feature-store
    // training-set pattern: every purchase event becomes a training
    // row whose features see ONLY strictly-earlier data (lag = last
    // prior event; a trailing-hour RANGE frame ending at −1 µs =
    // recent activity), so there is no label leakage by
    // construction. Both features ride ONE shuffle on the entity key
    // — two window specs over the same partitioning share the
    // exchange — where a join-based formulation would shuffle the
    // events table once per feature. The trailing sum is an exact
    // decimal window sum (portability, like the anomaly scorer).
    "q_pit_features" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val wHour = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, -1L)
      val dv = col("value").cast("decimal(18,6)")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"),
          lag(col("value"), 1).over(wLag).as("prev_value"),
          (col("us") - lag(col("us"), 1).over(wLag)).as("stale_us"),
          count(lit(1)).over(wHour).as("cnt_1h"),
          round(sum(dv).over(wHour).cast("double"), 4).as("sum_1h"))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("value").as("target_value"), col("prev_value"),
          col("stale_us"), col("cnt_1h"), col("sum_1h"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Incremental materialized-aggregate maintenance — the 100 TB
    // warehouse pattern where nightly rollups NEVER rescan history:
    // keep per-group mergeable partials (count, decimal sum) as the
    // stored "materialized view", aggregate only the new partition
    // (here: the latest epoch-week, split in-plan by a one-row max
    // broadcast), and MERGE by re-aggregating partials — counts and
    // decimal sums are associative, and avg is derived from them,
    // never stored. The oracle recomputes from the full scan, so
    // the correctness gate IS the incremental==full contract.
    // DECIMAL(18,6) quantization makes the sum order-independent
    // (double addition is not associative; a snapshot+delta split
    // would drift a double sum's ULPs).
    "q_agg_incremental" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          col("value").cast("decimal(18,6)").as("v"))
      val cut = ev.agg(max(col("wk")).as("cutwk"))
      val tagged = ev.crossJoin(broadcast(cut))
      def partial(df: DataFrame) = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      partial(tagged.filter(col("wk") < col("cutwk")))      // "stored"
        .unionByName(partial(tagged.filter(col("wk") >= col("cutwk"))))
        .groupBy(col("event_type"))                          // merge
        .agg(sum(col("n")).as("n_events"),
          sum(col("sv")).cast("decimal(18,6)").as("sum_value"))
        .select(col("event_type"), col("n_events"),
          // DECIMAL internally (order-independent merge); DOUBLE on
          // the output surface — the repo-wide hash-gate discipline
          round(col("sum_value").cast("double"), 6).as("sum_value"),
          round(col("sum_value").cast("double") / col("n_events"), 4)
            .as("avg_value"))
        .orderBy(col("event_type"))
    },

    // Autocorrelation function of the daily value series per
    // event_type, lags 1–7 — the seasonality probe run before any
    // forecasting model. The fact table collapses to one DECIMAL-
    // exact daily sum per (type, day) FIRST; everything after (mean,
    // lag join on day+k, centered products) runs on the ≤|days|-row
    // aggregate, so the lag self-join is date-domain-sized no matter
    // how many raw events exist. ACF_k = Σ dx_t·dx_{t+k} / Σ dx_t².
    "q_acf" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").cast("double").as("x"))
      val mean = daily.groupBy(col("event_type"))
        .agg(avg(col("x")).as("xbar"))
      val dd = daily.join(broadcast(mean), "event_type")
        .select(col("event_type"), col("d"),
          (col("x") - col("xbar")).as("dx"))
      val denom = dd.groupBy(col("event_type"))
        .agg(sum(col("dx") * col("dx")).as("ss"))
      val a = dd.withColumn("lag", explode(sequence(lit(1), lit(7))))
      val b = dd.select(col("event_type").as("et2"),
        col("d").as("d2"), col("dx").as("dx2"))
      a.join(b, col("event_type") === col("et2") &&
          col("d2") === date_add(col("d"), col("lag")))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dx") * col("dx2")).as("num"))
        .join(broadcast(denom), "event_type")
        .select(col("event_type"), col("lag"), col("n_pairs"),
          round(col("num") / col("ss"), 4).as("acf"))
        .orderBy(col("event_type"), col("lag"))
    },

    // Kaplan–Meier time-to-second-order survival per market segment,
    // with single-order customers right-censored at the corpus
    // horizon — the churn-analysis primitive. Per-customer first/two
    // order dates come from a row_number window over the customer key
    // (orders per customer are bounded); the KM table then lives on
    // the (segment, distinct day) domain. The survival product is
    // exp(Σ ln(1−d/n)) with each ln term DECIMAL-quantized before the
    // running window sum — the repo-wide idiom that makes a
    // cumulative double reduction bit-identical across engines. The
    // d = n_risk boundary (everyone at risk exits) is pinned to
    // exactly 0 rather than ln(0).
    "q_survival_km" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey").as("cust"), col("c_mktsegment"),
          to_date(col("o_orderdate")).as("od"),
          col("o_orderkey"))
      val wOrd = Window.partitionBy(col("cust"))
        .orderBy(col("od"), col("o_orderkey"))
      val firstTwo = o.withColumn("rn", row_number().over(wOrd))
        .where(col("rn") <= 2)
        .groupBy(col("cust"))
        .agg(first(col("c_mktsegment")).as("seg"),
          min(when(col("rn") === 1, col("od"))).as("d1"),
          min(when(col("rn") === 2, col("od"))).as("d2"))
      val horizon = o.agg(max(col("od")).as("hz"))
      val subj = firstTwo.crossJoin(broadcast(horizon))
        .select(col("seg"),
          when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
            .otherwise(datediff(col("hz"), col("d1"))).cast("long")
            .as("t"),
          when(col("d2").isNotNull, 1L).otherwise(0L).as("ev"))
      val byT = subj.groupBy(col("seg"), col("t"))
        .agg(sum(col("ev")).as("d"),
          sum(lit(1) - col("ev")).as("cns"))
      val wSeg = Window.partitionBy(col("seg")).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("seg"))
      val km = byT
        .withColumn("n_total", sum(col("d") + col("cns")).over(wTot))
        .withColumn("cum_incl", sum(col("d") + col("cns")).over(wSeg))
        .withColumn("n_risk",
          col("n_total") - col("cum_incl") + col("d") + col("cns"))
        .withColumn("lnterm",
          when(col("d") < col("n_risk"),
            log(lit(1.0) - col("d") / col("n_risk"))
              .cast("decimal(18,12)")))
        .withColumn("cumln", sum(col("lnterm")).over(wSeg))
      km.where(col("d") > 0)
        .select(col("seg").as("c_mktsegment"), col("t").as("t_days"),
          col("n_risk"), col("d").as("n_events"),
          when(col("d") === col("n_risk"), lit(0.0))
            .otherwise(round(exp(col("cumln").cast("double")), 6))
            .as("survival"))
        .orderBy(col("c_mktsegment"), col("t_days"))
    },

    // Market-share shift: each supplier nation's revenue share in
    // the first half of the order history vs the second (split at
    // the in-plan median order date — epoch-day integer arithmetic),
    // and the delta in share points. One conditional-sum aggregate
    // over the join (both periods in one pass — the q_ab_ttest
    // discipline), DECIMAL revenue, shares divided once in double.
    "q_share_shift" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          expr("unix_micros(l_shipdate) div 86400000000").as("day"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)").as("rev"))
      val cut = li.agg(expr("(min(day) + max(day) + 1) div 2")
        .as("cutday"))
      // per-nation and corpus revenue sums are TOTAL-class (25 fixed
      // nation keys — fan-in grows with SF): (28,6), the r10 sf10
      // decimal-headroom rule (t1/t2 ~1.5e12 at sf10 overflow (18,6))
      val byNation = li.crossJoin(broadcast(cut))
        .groupBy(col("n_name"))
        .agg(sum(when(col("day") < col("cutday"), col("rev"))
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("decimal(28,6)").as("rev_p1"),
          sum(when(col("day") >= col("cutday"), col("rev"))
            .otherwise(lit(0).cast("decimal(18,6)")))
            .cast("decimal(28,6)").as("rev_p2"))
      val tot = byNation.agg(
        sum(col("rev_p1")).cast("decimal(28,6)").as("t1"),
        sum(col("rev_p2")).cast("decimal(28,6)").as("t2"))
      byNation.crossJoin(broadcast(tot))
        .select(col("n_name"),
          round(col("rev_p1").cast("double") / col("t1").cast("double"),
            6).as("share_p1"),
          round(col("rev_p2").cast("double") / col("t2").cast("double"),
            6).as("share_p2"),
          round(col("rev_p2").cast("double") / col("t2").cast("double") -
            col("rev_p1").cast("double") / col("t1").cast("double"),
            6).as("share_delta"))
        .orderBy(col("n_name"))
    },

    // Return-rate per brand with a 95% Wilson score interval — the
    // statistically honest way to rank small-sample rates (a brand
    // with 2/3 returns must not outrank one with 200/1000). Pure
    // per-row double algebra after one conditional-sum aggregate;
    // z = 1.96 literal, identical parenthesization both engines.
    "q_return_rate_ci" -> { (s, dir) =>
      val z = lit(1.96)
      val g = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"))
      val p = col("n_returned") / col("n")
      val z2n = z * z / col("n")
      val center = (p + z2n / lit(2.0)) / (lit(1.0) + z2n)
      val half = z * sqrt(p * (lit(1.0) - p) / col("n") +
        z2n / (lit(4.0) * col("n"))) / (lit(1.0) + z2n)
      g.select(col("p_brand"), col("n"), col("n_returned"),
          round(p, 6).as("rate"),
          round(center - half, 6).as("wilson_lo"),
          round(center + half, 6).as("wilson_hi"))
        .orderBy(col("p_brand"))
    },

    // Pareto / ABC classification: parts ranked by revenue, running
    // share of the total, classed A (≤80%), B (≤95%), C (rest) —
    // the inventory-concentration workhorse. The running sum runs
    // over the per-part AGGREGATE (parts domain, not line items),
    // and that domain GROWS with scale — so no single-partition
    // global window. Two-pass partition-wise cumsum instead:
    // broadcast approx-quantile edges split the rev axis into ≤32
    // rev-ordered buckets (bucket = #edges above my rev, a pure
    // map-side function of the row — order-consistent with the
    // global (rev desc, partkey) sort); the window cumsum runs
    // WITHIN each bucket, and each bucket adds the broadcast prefix
    // sum of the (≤32-row) bucket totals. Bucket count is fixed at
    // any SF, so the widest serial sort is |parts|/32 rows. Exact
    // DECIMAL throughout (edges only PLACE boundaries, they never
    // touch values); the share division happens once in double per
    // row. Class of a row = share BEFORE it crosses the boundary
    // (standard: the part that crosses 80% still belongs to A via
    // its predecessor share).
    "q_pareto_abc" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // four consumers reference the per-part aggregate (edges, tot,
      // bucket totals, cumsum) — eager cache or the lineitem scan +
      // groupBy runs four times (the triangle-census precedent)
      val rev = graft.CachedPlans.cache(Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(18,6)").as("rev")))
      rev.count()
      // one pass over the cached aggregate yields BOTH the bucket
      // edges and the corpus total (fused — no second broadcast job)
      val probs = (1 until 32).map(i => i / 32.0).mkString(",")
      // per-part rev fits (18,6) at any SF (bounded key fan-in), but
      // the corpus total / cumsum grow with SF: ~3e12 at sf10 needs 13
      // integer digits — (18,6) overflows under ANSI. (28,6) holds to
      // ~sf1e9; keep every corpus-scale accumulator at (28,6) in
      // LOCKSTEP with the oracle (sf10 soak divergence class: int
      // headroom of decimal accumulators).
      val edges = rev.agg(expr(
        s"approx_percentile(cast(rev as double), array($probs), 10000)")
        .as("es"),
        sum(col("rev")).cast("decimal(28,6)").as("tot"))
      val bucketed = rev.crossJoin(broadcast(edges))
        .select(col("l_partkey"), col("rev"), col("tot"),
          size(filter(col("es"), e => e > col("rev").cast("double")))
            .as("bkt"))
      val wIn = Window.partitionBy(col("bkt"))
        .orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val btots = bucketed.groupBy(col("bkt"))
        .agg(sum(col("rev")).cast("decimal(28,6)").as("btot"))
      val offsets = btots
        .join(broadcast(btots.select(col("bkt").as("pbkt"),
          col("btot").as("pbtot"))), col("pbkt") < col("bkt"), "left")
        .groupBy(col("bkt"))
        .agg(coalesce(sum(col("pbtot")), lit(0)).cast("decimal(28,6)")
          .as("off"))
      val classed = bucketed
        .withColumn("cum_in", sum(col("rev")).over(wIn)
          .cast("decimal(28,6)"))
        .join(broadcast(offsets), Seq("bkt"))
        .withColumn("cum", (col("cum_in") + col("off"))
          .cast("decimal(28,6)"))
        .withColumn("prev_share",
          ((col("cum") - col("rev")).cast("double") /
            col("tot").cast("double")))
        .withColumn("abc_class",
          when(col("prev_share") < 0.80, "A")
            .when(col("prev_share") < 0.95, "B").otherwise("C"))
      // PLAIN decimal→double cast, no round (sf10 soak: at ~4.5e11
      // the 1e-6 round grain is below double ulp, so round(…,6)
      // after the cast is lossy and engine-divergent — the r9
      // "double-rounding past 2^53" class; the exact (28,6) sum is
      // already at scale 6, one correctly-rounded conversion is
      // engine-identical, oracle takes the VARCHAR hop)
      classed.groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("decimal(28,6)").cast("double")
            .as("class_revenue"))
        .orderBy(col("abc_class"))
    },

    // Tukey-fence (IQR) outlier screen per event_type — the boxplot
    // rule, completing the robust-outlier trio next to MAD and
    // rolling-z. Exact quartiles per group, broadcast fence row,
    // one counting pass.
    "q_anomaly_iqr" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      // round(6) pins the quartiles before the fence arithmetic —
      // the strict fence counts otherwise inherit the engines' 1-ulp
      // quantile-interpolation difference (the q_winsorize sf1 class)
      val qs = ev.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.25)"), 6).as("q1"),
          round(expr("percentile(value, 0.75)"), 6).as("q3"))
        .withColumn("iqr", col("q3") - col("q1"))
        .withColumn("lo", col("q1") - lit(1.5) * col("iqr"))
        .withColumn("hi", col("q3") + lit(1.5) * col("iqr"))
      ev.join(broadcast(qs), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(round(col("q1"), 4)).as("q1"),
          first(round(col("q3"), 4)).as("q3"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L))
            .as("n_below"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L))
            .as("n_above"))
        .orderBy(col("event_type"))
    },

    // Incremental maintenance THROUGH a join: the materialized view
    // is brand-level quantities over lineitem ⋈ part, and the
    // refresh path recomputes only the newest ship-week's delta —
    // delta-join + partial-merge (ΔF ⋈ D, then merge with the stored
    // partial), the standard IVM identity for a view with a
    // foreign-key join. The merged result must equal the full
    // recompute, which IS the oracle. Both legs aggregate before
    // nothing: each is a scan-side-filtered join + hash aggregate;
    // at scale the stored leg is a read of yesterday's materialized
    // partials, not a rescan (q_agg_incremental's contract, extended
    // over a join).
    "q_incremental_join" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          expr("unix_micros(l_shipdate) div 604800000000").as("wk"))
      val part = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val cut = li.agg(max(col("wk")).as("cutwk"))
      val tagged = li.crossJoin(broadcast(cut))
      def leg(df: DataFrame) = df
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).as("sq"))
      leg(tagged.filter(col("wk") < col("cutwk")))       // stored view
        .unionByName(leg(tagged.filter(col("wk") >= col("cutwk"))))
        .groupBy(col("p_brand"))                          // merge
        .agg(sum(col("n")).as("n_items"),
          round(sum(col("sq")).cast("decimal(18,6)").cast("double"), 6)
            .as("sum_qty"))
        .orderBy(col("p_brand"))
    },

    // Activity heatmap: (ISO weekday × hour) event counts + DECIMAL
    // value sums — the 168-cell grid behind every "when are users
    // active" dashboard. One hash aggregate, map-side partials;
    // weekday via the portable ISO form (Spark weekday()+1 ≡ DuckDB
    // isodow — NOT dayofweek, whose week start differs between
    // engines).
    "q_activity_heatmap" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy((expr("weekday(ts)") + 1).cast("long").as("isodow"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)").cast("double"), 6).as("sum_value"))
        .orderBy(col("isodow"), col("hr"))
    },

    // New-vs-returning daily split: a user's first active day claims
    // them as "new"; every later active day counts them "returning".
    // Two passes over the distinct (user, day) aggregate — first-day
    // per user, then the daily rollup — so the fact table shuffles
    // once into the activity aggregate and everything after is
    // user-domain-sized.
    "q_new_vs_returning" -> { (s, dir) =>
      val act = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val firstDay = act.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"))
      act.join(firstDay, "user_id")
        .groupBy(col("d"))
        .agg(sum(when(col("d") === col("d0"), 1L).otherwise(0L))
            .as("n_new"),
          sum(when(col("d") =!= col("d0"), 1L).otherwise(0L))
            .as("n_returning"))
        .orderBy(col("d"))
    },

    // Weekly stickiness: avg daily-active over weekly-active
    // (DAU/WAU) per epoch-week — the engagement ratio. DAU comes
    // from the (user, day) aggregate, WAU from (user, week);
    // integer epoch-week arithmetic (the cohort idiom — no calendar
    // disagreement).
    "q_stickiness" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
      val dau = ev.select(col("user_id"), col("d"), col("wk")).distinct()
        .groupBy(col("wk"), col("d")).agg(count(lit(1)).as("dau"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_days"), avg(col("dau")).as("avg_dau"))
      val wau = ev.select(col("user_id"), col("wk")).distinct()
        .groupBy(col("wk")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "wk")
        .select(col("wk"), col("n_days"), col("wau"),
          round(col("avg_dau"), 4).as("avg_dau"),
          round(col("avg_dau") / col("wau"), 4).as("stickiness"))
        .orderBy(col("wk"))
    },

    // Week-over-week revenue growth per event_type: DECIMAL weekly
    // sums, a lag window over the (type, week) aggregate, percent
    // change in double at the end. First week's growth is NULL by
    // definition (no prior), identical in both engines.
    "q_wow_growth" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val weekly = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
      weekly.withColumn("prev", lag(col("rev"), 1).over(w))
        .select(col("event_type"), col("wk"),
          round(col("rev").cast("double"), 6).as("rev"),
          round((col("rev") - col("prev")).cast("double") /
            col("prev").cast("double"), 4).as("wow_growth"))
        .orderBy(col("event_type"), col("wk"))
    },

    // Time-decayed popularity — "trending parts": each line item
    // contributes pow(½, age_days/7) relative to the in-plan corpus
    // watermark (7-day half-life), so yesterday's order outweighs
    // last month's. Per-row decay is IEEE-identical; the per-part
    // score sum is DECIMAL-quantized (association-free); top-10 is
    // sort+limit (TakeOrderedAndProject). The decayed score is
    // mergeable and cheap to refresh by multiplying stored partials
    // by the elapsed decay — the same partial-merge contract as
    // q_agg_incremental.
    "q_topk_decayed" -> { (s, dir) =>
      // fanOut keyed on the groupBy key (r13): the pow/decimal decay
      // work ran single-threaded in the one-row-group scan stage;
      // hash-partitioning by l_partkey parallelizes it AND satisfies
      // the aggregation's clustering, so no further exchange follows
      // (guide §2.4 — operations keyed the same way share one
      // exchange). No-op at scale.
      val li = graft.Tables.fanOut(Tables(s, dir, "lineitem")
        .select(col("l_partkey"), to_date(col("l_shipdate")).as("d")),
        col("l_partkey"))
      val wm = li.agg(max(col("d")).as("wm"))
      li.crossJoin(broadcast(wm))
        .select(col("l_partkey"),
          pow(lit(0.5), datediff(col("wm"), col("d")) / lit(7.0))
            .cast("decimal(18,6)").as("decay"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_items"),
          // round(·,6) of a DECIMAL(18,6) is lossless at these
          // magnitudes, so the DESC sort order is unchanged
          round(sum(col("decay")).cast("decimal(18,6)")
            .cast("double"), 6).as("score"))
        .orderBy(col("score").desc, col("l_partkey"))
        .limit(10)
    },

    // Windowed funnel: the q_funnel_steps ladder with a 72-hour
    // conversion deadline per transition — "counts only if the next
    // step happens within N hours", the form product analytics
    // actually reports. Same bounded min-aggregate stage chain as
    // q_funnel_time_to_convert (one timestamp of state per user per
    // stage), the deadline just tightens each join's range predicate.
    "q_funnel_constrained" -> { (s, dir) =>
      val win = 72L * 3600L * 1000000L // 72 h in µs
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("u"),
          col("event_type").as("et"))
      val t1 = ev.filter(col("et") === "signup")
        .groupBy(col("user_id")).agg(min(col("u")).as("t1"))
      val t2 = ev.filter(col("et") === "click")
        .join(t1, "user_id")
        .where(col("u") > col("t1") && col("u") <= col("t1") + win)
        .groupBy(col("user_id")).agg(min(col("u")).as("t2"))
      val t3 = ev.filter(col("et") === "purchase")
        .join(t2, "user_id")
        .where(col("u") > col("t2") && col("u") <= col("t2") + win)
        .groupBy(col("user_id")).agg(min(col("u")).as("t3"))
      t1.agg(count(lit(1)).as("n")).select(lit(1).as("stage"),
          lit("signup").as("step"), col("n"))
        .unionByName(t2.agg(count(lit(1)).as("n"))
          .select(lit(2).as("stage"), lit("click_72h").as("step"),
            col("n")))
        .unionByName(t3.agg(count(lit(1)).as("n"))
          .select(lit(3).as("stage"), lit("purchase_72h").as("step"),
            col("n")))
        .orderBy(col("stage"))
    },

    // Time-to-convert distribution between funnel stages — the
    // latency companion of q_funnel_steps: per user, first signup,
    // first click strictly after it, first purchase strictly after
    // that; medians/p90s of the two transition durations. Built as
    // the BOUNDED funnel shape (min-aggregate per stage, each stage
    // joining the previous stage's per-user row) — per-user state is
    // one timestamp per stage no matter how many events a whale user
    // has, the same discipline as userStagesBounded.
    "q_funnel_time_to_convert" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts)").as("u"),
          col("event_type").as("et"))
      val t1 = ev.filter(col("et") === "signup")
        .groupBy(col("user_id")).agg(min(col("u")).as("t1"))
      val t2 = ev.filter(col("et") === "click")
        .join(t1, "user_id").where(col("u") > col("t1"))
        .groupBy(col("user_id"))
        .agg(min(col("u")).as("t2"), min(col("t1")).as("t1"))
      val t3 = ev.filter(col("et") === "purchase")
        .join(t2.select(col("user_id"), col("t2")), "user_id")
        .where(col("u") > col("t2"))
        .groupBy(col("user_id"))
        .agg(min(col("u")).as("t3"), min(col("t2")).as("t2"))
      val d = t2.select(lit("signup_to_click").as("transition"),
          ((col("t2") - col("t1")) / lit(3.6e9)).as("hrs"))
        .unionByName(t3.select(
          lit("click_to_purchase").as("transition"),
          ((col("t3") - col("t2")) / lit(3.6e9)).as("hrs")))
      d.groupBy(col("transition"))
        .agg(count(lit(1)).as("n_users"),
          round(expr("percentile(hrs, 0.5)"), 4).as("median_hours"),
          round(expr("percentile(hrs, 0.9)"), 4).as("p90_hours"))
        .orderBy(col("transition"))
    },

    // Quantile-normalization reference distribution — the
    // batch-effect correction used to force feature distributions
    // from different segments onto a common scale: each event_type
    // contributes its exact 20-grid quantiles, and the reference is
    // their cross-type mean at each grid point. One percentile-array
    // aggregate per type (map-side partials over the fact table),
    // then a 20×|types|-row reshape — the mapping table an engine
    // would broadcast back to normalize the raw column at scale.
    "q_quantile_normalize" -> { (s, dir) =>
      val ps = (1 to 20).map(_ / 20.0)
      val q = Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr(s"percentile(value, array(${ps.mkString(",")}))")
          .as("qs"))
      q.select(col("event_type"), posexplode(col("qs")))
        .select(col("event_type"),
          (col("pos") + 1).cast("long").as("bin"),
          col("col").as("qv"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_types"),
          round(avg(col("qv")), 4).as("ref_value"),
          round(max(col("qv")) - min(col("qv")), 4).as("spread"))
        .orderBy(col("bin"))
    },

    // Calendar gap-fill + LOCF — the canonical time-series
    // regularization before any forecasting/joining step: aggregate
    // to an hourly grid, expand each event_type's [min,max] hour
    // span into a dense calendar spine (sequence+explode — the
    // spine is CALENDAR-bounded, |types|·hours rows, independent of
    // fact-table size), left-join the observed aggregate, and carry
    // the last observation forward. The LOCF window is a running
    // last(ignoreNulls) per type ordered by hour — each series
    // partition is one type's spine, bounded by the calendar, so
    // the window never ships fact rows. Hourly revenue sums are
    // DECIMAL-quantized (association-free, oracle-exact).
    "q_gap_fill" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val spine = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          // epoch-µs output (not raw timestamp): repo convention for
          // driver-hash-stable time columns (cf. tp_scd2_intervals)
          expr("unix_micros(h)").as("h_us"),
          round(coalesce(last(col("rev"), ignoreNulls = true).over(w),
            lit(0).cast("decimal(18,6)")).cast("double"), 6)
            .as("rev_filled"),
          col("rev").isNull.as("is_gap"))
        .orderBy(col("event_type"), col("h_us"))
    },

    // Seasonal-naive forecast backtest — the baseline every demand
    // forecaster must beat, evaluated the way a backtest harness
    // would: zero-fill the hourly grid (a missing hour IS zero
    // revenue), predict each hour by the same hour one day earlier
    // (lag 24 over the dense spine), score per type with MAE, RMSE
    // and WAPE. Error sums are DECIMAL-quantized so the cross-row
    // reductions are exact; only the final /n and sqrt run in
    // doubles, pinned at round(4). Same calendar-bounded shape as
    // q_gap_fill — the backtest cost scales with the calendar and
    // the type domain, not the fact table.
    "q_forecast_backtest" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val spine = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val wOrd = Window.partitionBy(col("event_type"))
        .orderBy(col("h"))
      val dense = spine.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("rev"), lit(0).cast("decimal(18,6)"))
            .as("rev0"))
        .withColumn("pred", lag(col("rev0"), 24).over(wOrd))
        .where(col("pred").isNotNull)
      val errFb = (col("rev0") - col("pred")).cast("decimal(18,6)")
      dense.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(errFb)).cast("decimal(28,6)").as("sae"),
          sum((errFb * errFb).cast("decimal(38,12)"))
            .cast("decimal(38,12)").as("sse"),
          sum(abs(col("rev0"))).cast("decimal(28,6)").as("sa"))
        .select(col("event_type"), col("n_eval"),
          round(col("sae").cast("double") / col("n_eval"), 4)
            .as("mae"),
          round(sqrt(col("sse").cast("double") / col("n_eval")), 4)
            .as("rmse"),
          round(col("sae").cast("double") /
            col("sa").cast("double"), 4).as("wape"))
        .orderBy(col("event_type"))
    },

    // Fulfillment latency audit — order-to-ship lag distribution per
    // order priority: the supply-chain SLA readout (join on the
    // order key, integer day lags, exact percentiles). One shuffle
    // join keyed on orderkey (bucket both tables at scale and it
    // disappears), then a hash aggregate per priority; the lag sum
    // is exact integer arithmetic, percentiles run on the bounded
    // integer day domain.
    "q_fulfillment_latency" -> { (s, dir) =>
      val lag = datediff(to_date(col("l_shipdate")),
        to_date(col("o_orderdate")))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), lag.as("lag_days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("lag_days")).cast("double") / count(lit(1)),
            4).as("avg_days"),
          expr("percentile(lag_days, 0.5)").as("median_days"),
          expr("percentile(lag_days, 0.9)").as("p90_days"),
          max(col("lag_days")).cast("long").as("max_days"))
        .orderBy(col("o_orderpriority"))
    },

    // XYZ demand-variability classification — the inventory-planning
    // twin of Pareto/ABC: per-part weekly demand over the corpus
    // week domain (zero weeks INCLUDED via the global week count —
    // no per-part calendar spine needed: mean = Σq/W and
    // var = Σq²/W − mean² are exact in the decimal sums), coefficient
    // of variation, then the standard X (<0.5) / Y (<1.0) / Z bands.
    // Two scans of lineitem (week domain + per-part sums), both
    // map-side-partial aggregates; the readout is 3 rows.
    "q_demand_variability" -> { (s, dir) =>
      // (r13: a fanOut-by-partkey variant measured SLOWER here —
      // 1.33 → 1.67 s warm with fetch-stall outliers; the extra
      // exchange of 600k decimal rows costs more than the scan-stage
      // parallelism buys. Left on the single-pass plan.)
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"),
          expr("unix_micros(l_shipdate) div 604800000000").as("wk"),
          col("l_quantity"))
      val weeks = li.agg(countDistinct(col("wk")).as("n_weeks"))
      val perWk = li.groupBy(col("l_partkey"), col("wk"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("q"))
      val perPart = perWk.groupBy(col("l_partkey"))
        .agg(sum(col("q")).cast("decimal(28,6)").as("sq"),
          sum((col("q") * col("q")).cast("decimal(38,12)"))
            .cast("decimal(38,12)").as("sq2"))
      val mean = col("sq").cast("double") / col("n_weeks")
      val variance = col("sq2").cast("double") / col("n_weeks") -
        mean * mean
      val cv = sqrt(greatest(variance, lit(0.0))) / mean
      perPart.crossJoin(broadcast(weeks))
        .select(col("l_partkey"), cv.cast("decimal(18,8)").as("cvd"))
        // classify on the QUANTIZED cv so the band edges are
        // engine-identical (the oracle classifies the same column)
        .withColumn("xyz_class",
          when(col("cvd").cast("double") < 0.5, "X")
            .when(col("cvd").cast("double") < 1.0, "Y")
            .otherwise("Z"))
        .groupBy(col("xyz_class"))
        .agg(count(lit(1)).as("n_parts"),
          round(sum(col("cvd")).cast("double") / count(lit(1)), 4)
            .as("avg_cv"),
          round(min(col("cvd")).cast("double"), 4).as("min_cv"),
          round(max(col("cvd")).cast("double"), 4).as("max_cv"))
        .orderBy(col("xyz_class"))
    },

    // Post-stratification reweighting — the survey-correction
    // estimator: re-estimate the overall mean of `value` as if every
    // event_type stratum had equal share, plus the Kish effective
    // sample size for the implied weights w = N/(k·n_s). One hash
    // aggregate to the k stratum rows; per-stratum means and 1/n
    // terms are DECIMAL-quantized before the k-row sum so the
    // cross-stratum reduction is exact. The whole estimator reads
    // the fact table once.
    "q_post_stratification" -> { (s, dir) =>
      val strata = Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_s"),
          sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)").as("sv"))
      strata.agg(
          sum(col("n_s")).as("n"),
          count(lit(1)).as("k_strata"),
          sum(col("sv")).cast("decimal(28,6)").as("sv_all"),
          sum((col("sv").cast("double") / col("n_s"))
            .cast("decimal(18,8)")).cast("decimal(28,8)")
            .as("sum_means"),
          sum((lit(1.0) / col("n_s")).cast("decimal(18,12)"))
            .cast("decimal(28,12)").as("sum_inv"))
        .select(col("n"), col("k_strata"),
          round(col("sv_all").cast("double") / col("n"), 4)
            .as("mean_raw"),
          round(col("sum_means").cast("double") / col("k_strata"), 4)
            .as("mean_poststrat"),
          round(col("k_strata") * col("k_strata") /
            col("sum_inv").cast("double"), 2).as("kish_neff"))
    },

    // Weighted percentiles (median / p90 of price, weighted by
    // quantity) — the order statistic purchasing and pricing teams
    // actually want ("half the UNITS ship below this price", not
    // half the line items). Same discipline as Mann–Whitney/KS: the
    // cumulative-weight window runs over the DISTINCT-(group,price)
    // block aggregate, never the fact rows; the selected quantile is
    // the smallest value whose cumulative weight reaches p·W
    // (weights DECIMAL-exact, the threshold compare in doubles,
    // identical both engines).
    "q_percentile_weighted" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val blocks = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)"))
          .cast("decimal(28,6)").as("bw"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("l_returnflag"))
      val cum = blocks
        .withColumn("cw", sum(col("bw")).over(w))
        .withColumn("tw", sum(col("bw")).over(wAll))
      def pick(p: Double) = min(when(
        col("cw").cast("double") >= lit(p) * col("tw").cast("double"),
        col("l_extendedprice")))
      cum.groupBy(col("l_returnflag"))
        .agg(round(first(col("tw")).cast("double"), 6).as("total_qty"),
          round(pick(0.5), 2).as("w_median_price"),
          round(pick(0.9), 2).as("w_p90_price"),
          count(lit(1)).as("n_price_points"))
        .orderBy(col("l_returnflag"))
    },

    // Seasonality strength — how much of the hourly series' variance
    // the hour-of-day profile explains: 1 − Var(residual)/Var(total)
    // per event_type, the STL-style diagnostic that decides whether
    // a seasonal forecast model is worth fitting. Everything derives
    // from two aggregates of the DECIMAL hourly series (per-type
    // moments + per-(type, hour-of-day) moments): the within-profile
    // sum of squares uses the closed form Σ s_h²/n_h with each term
    // DECIMAL-quantized, so the 24-term reduction is exact. No pass
    // touches fact rows after the first hourly rollup.
    "q_seasonality_strength" -> { (s, dir) =>
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val hod = hourly.groupBy(col("event_type"),
          hour(col("h")).as("hod"))
        .agg(count(lit(1)).as("n_h"),
          sum(col("rev")).cast("decimal(28,6)").as("s_h"))
        .groupBy(col("event_type"))
        .agg(sum((col("s_h").cast("double") * col("s_h")
            .cast("double") / col("n_h")).cast("decimal(28,6)"))
          .cast("decimal(38,6)").as("ssq_profile"))
      val tot = hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("rev")).cast("decimal(28,6)").as("sx"),
          sum((col("rev") * col("rev")).cast("decimal(38,12)"))
            .cast("decimal(38,12)").as("sx2"))
      val varTotal = col("sx2").cast("double") / col("n") -
        (col("sx").cast("double") / col("n")) *
          (col("sx").cast("double") / col("n"))
      val varResid = (col("sx2").cast("double") -
        col("ssq_profile").cast("double")) / col("n")
      tot.join(broadcast(hod), "event_type")
        .select(col("event_type"), col("n").as("n_hours"),
          round(varTotal, 4).as("var_total"),
          round(greatest(varResid, lit(0.0)), 4).as("var_resid"),
          round(greatest(lit(0.0),
            lit(1.0) - varResid / varTotal), 4)
            .as("seasonality_strength"))
        .orderBy(col("event_type"))
    },

    // Lorenz curve by revenue decile — the visual companion to the
    // Gini coefficient: decile edges come from ONE exact-percentile
    // aggregate over the per-customer revenue table (broadcast, 9
    // numbers), decile assignment is map-side, cumulative shares run
    // over the 10-row decile aggregate. No global ntile window — the
    // same no-single-partition discipline as RFM / equi-depth bins.
    "q_lorenz_deciles" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val perCust = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      // round(6) pins decile edges across engines (the q_winsorize
      // sf1 ulp class; rev sums sit on a 1e-2 grid, edges on 1e-3)
      val edges = perCust.agg(expr(
        "transform(percentile(cast(rev as double), " +
          "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)), " +
          "e -> round(e, 6))").as("es"))
      val assigned = perCust.crossJoin(broadcast(edges))
        .select(col("rev"),
          (lit(1) + size(filter(col("es"),
            e => e < col("rev").cast("double")))).cast("long")
            .as("decile"))
      val byDecile = assigned.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev")).cast("decimal(28,6)").as("decile_rev"))
      // global windows over the DECILE aggregate: ≤10 rows at any
      // SF (the fact table was reduced by the broadcast-edges pass)
      val w = Window.partitionBy(lit(1)).orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(lit(1))
      byDecile
        .withColumn("cum_rev", sum(col("decile_rev")).over(w))
        .withColumn("tot_rev", sum(col("decile_rev")).over(wAll))
        .withColumn("cum_n", sum(col("n_customers")).over(w))
        .withColumn("tot_n", sum(col("n_customers")).over(wAll))
        .select(col("decile"), col("n_customers"),
          round(col("cum_n") / col("tot_n").cast("double"), 4)
            .as("cum_pop_share"),
          round(col("cum_rev").cast("double") /
            col("tot_rev").cast("double"), 4).as("cum_rev_share"))
        .orderBy(col("decile"))
    },

    // Retention half-life — fit ln(retention) = a + b·week by OLS
    // over the cohort-retention curve (weeks 1+, all cohorts pooled)
    // and report the implied half-life ln(2)/(−b). The regression
    // runs on the ≤|weeks| aggregated curve rows with every OLS term
    // (Σx, Σy, Σxy, Σx²) DECIMAL-quantized — model fitting as a
    // closed-form aggregate, no iteration, nothing larger than the
    // week domain ever shuffles.
    "q_retention_halflife" -> { (s, dir) =>
      val act = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .distinct()
      val cohorts = act.groupBy(col("user_id"))
        .agg(min(col("wk")).as("c0"))
      val curve = act.join(cohorts, "user_id")
        .groupBy((col("wk") - col("c0")).as("wk_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val base = curve.where(col("wk_offset") === 0)
        .select(col("n_active").as("n_base"))
      val pts = curve.where(col("wk_offset") > 0)
        .crossJoin(broadcast(base))
        .select(col("wk_offset").cast("double").as("x"),
          log(col("n_active") / col("n_base").cast("double"))
            .cast("decimal(18,8)").as("y"))
      val g = pts.agg(count(lit(1)).as("k"),
        sum(col("x").cast("decimal(18,6)")).cast("decimal(28,6)")
          .as("sx"),
        sum(col("y")).cast("decimal(28,8)").as("sy"),
        sum((col("y") * col("x").cast("decimal(18,6)"))
          .cast("decimal(28,8)")).cast("decimal(38,8)").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(18,6)"))
          .cast("decimal(28,6)").as("sx2"))
      val b = (col("k") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (col("k") * col("sx2").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      // (slope/intercept shared by the half-life readout below)
      val a = (col("sy").cast("double") -
        b * col("sx").cast("double")) / col("k")
      g.select(col("k").as("n_weeks"),
          round(a, 4).as("intercept_ln"),
          round(b, 4).as("slope_ln"),
          // no measured decay (b ≥ 0) ⇒ no finite half-life; the
          // NULL guard also keeps ANSI mode off the /0 edge when
          // the curve is exactly flat (this synthetic corpus)
          when(b < 0.0, round(lit(math.log(2.0)) / -b, 2))
            .as("half_life_weeks"))
    },

    // Basket diversity — Shannon entropy of each order's brand mix,
    // rolled up per order priority: the assortment-breadth metric
    // next to basket SIZE. Per-order entropy −Σ p·ln p uses the
    // repo's ln idiom (each term DECIMAL(18,8)-quantized, the
    // per-order sum exact); order-level entropies quantize again
    // before the per-priority mean. Two hash aggregates over the
    // lineitem⋈part join — the join shuffles on partkey once and
    // the entropy never sees more than the (order, brand) aggregate.
    "q_basket_entropy" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("o_orderpriority"),
          col("p_brand"))
      val brandCnt = li.groupBy(col("ok"), col("o_orderpriority"),
          col("p_brand"))
        .agg(count(lit(1)).as("c"))
      val withTot = brandCnt
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ok"))))
      val p = col("c") / col("n").cast("double")
      val perOrder = withTot
        .select(col("ok"), col("o_orderpriority"),
          (-p * log(p)).cast("decimal(18,8)").as("term"))
        .groupBy(col("ok"), col("o_orderpriority"))
        .agg(sum(col("term")).cast("decimal(18,8)").as("h"),
          count(lit(1)).as("n_brands"))
      perOrder.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("h")).cast("double") / count(lit(1)), 4)
            .as("avg_entropy"),
          round(max(col("h")).cast("double"), 4).as("max_entropy"),
          round(avg(col("n_brands")), 4).as("avg_brands"))
        .orderBy(col("o_orderpriority"))
    },

    // Customer segment migration — the value-tier transition matrix
    // between two periods (split at the in-plan median order date):
    // classify each customer low/mid/high by revenue tercile WITHIN
    // each period (broadcast percentile edges, map-side assignment
    // — the RFM discipline, no global ntile), full-outer join the
    // periods, and count the 4×4 matrix including churn ('none').
    // The readout an account team reads as "who moved up, who left".
    "q_segment_migration" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      // median date via the frequency-histogram percentile (the
      // graph-threshold idiom): the date domain is calendar-bounded,
      // so the heavy single-group buffer of a plain percentile over
      // |orders| rows collapses to |distinct days| histogram rows,
      // map-side combined. Identical value (repeated-value
      // semantics). The revenue terciles below stay plain exact
      // percentiles: continuous domain — see DESIGN.md "exact order
      // statistics at scale".
      val cut = o
        .groupBy(expr("unix_micros(o_orderdate)").as("us"))
        .agg(count(lit(1)).as("f"))
        .agg(expr("percentile(us, 0.5, f)").as("cut"))
      val tagged = o.crossJoin(broadcast(cut))
        .select(col("o_custkey").as("cust"),
          (expr("unix_micros(o_orderdate)") <= col("cut"))
            .as("first_half"),
          col("o_totalprice").cast("decimal(18,6)").as("rev"))
      def half(flag: Boolean) = {
        val h = tagged.where(col("first_half") === flag)
          .groupBy(col("cust"))
          .agg(sum(col("rev")).cast("decimal(18,6)").as("r"))
        // round(6): tercile edges pinned across engines (q_winsorize
        // sf1 ulp class; r sums sit on a 1e-2 grid)
        val edges = h.agg(expr(
          "transform(percentile(cast(r as double), " +
            "array(0.3333, 0.6667)), e -> round(e, 6))").as("es"))
        h.crossJoin(broadcast(edges))
          .select(col("cust"),
            when(col("r").cast("double") <= element_at(col("es"), 1),
              "low")
              .when(col("r").cast("double") <=
                element_at(col("es"), 2), "mid")
              .otherwise("high").as("seg"))
      }
      half(true).select(col("cust"), col("seg").as("seg_p1"))
        .join(half(false).select(col("cust"),
          col("seg").as("seg_p2")), Seq("cust"), "full_outer")
        .select(coalesce(col("seg_p1"), lit("none")).as("seg_p1"),
          coalesce(col("seg_p2"), lit("none")).as("seg_p2"))
        .groupBy(col("seg_p1"), col("seg_p2"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("seg_p1"), col("seg_p2"))
    },

    // Day-of-week seasonal index per event_type — the multiplicative
    // profile (dow mean ÷ overall mean) a planner multiplies into a
    // base forecast. Derived entirely from the DECIMAL daily
    // aggregate: per-(type,dow) and per-type means are exact-sum /
    // count, the index one IEEE division pinned at round(4). The
    // readout is |types|×7 rows; nothing after the daily rollup
    // touches fact rows.
    "q_seasonal_index" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("rev"))
      val byDow = daily
        .groupBy(col("event_type"), dayofweek(col("d")).as("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("rev")).cast("decimal(28,6)").as("s"))
      val overall = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_all"),
          sum(col("rev")).cast("decimal(28,6)").as("s_all"))
      byDow.join(broadcast(overall), "event_type")
        .select(col("event_type"), col("dow").cast("long").as("dow"),
          col("n_days"),
          round((col("s").cast("double") / col("n_days")) /
            (col("s_all").cast("double") / col("n_all")), 4)
            .as("seasonal_index"))
        .orderBy(col("event_type"), col("dow"))
    },

    // Cohort LTV curve — cumulative revenue per user by acquisition
    // cohort and week offset: the money companion to cohort
    // retention ("how much has the January cohort earned per head
    // by week 3"). Purchase revenue aggregates to the
    // (cohort, offset) grid (DECIMAL-exact), the running sum is a
    // window over that |cohorts|×|weeks| grid, and the per-head
    // division is the only double, pinned at round(4).
    "q_cohort_ltv" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val purchases = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          col("value").cast("decimal(18,6)").as("rev"))
      val cohorts = purchases.groupBy(col("user_id"))
        .agg(min(col("wk")).as("c0"))
      // cohorts is one row per user — plain count, no distinct plan
      val sized = cohorts.groupBy(col("c0").as("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      val grid = purchases.join(cohorts, "user_id")
        .groupBy(col("c0").as("cohort_wk"),
          (col("wk") - col("c0")).as("wk_offset"))
        .agg(sum(col("rev")).cast("decimal(28,6)").as("wk_rev"))
      val w = Window.partitionBy(col("cohort_wk"))
        .orderBy(col("wk_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(broadcast(sized), "cohort_wk")
        .withColumn("cum_rev", sum(col("wk_rev")).over(w)
          .cast("decimal(28,6)"))
        // ltv rounds EXACTLY: cum_rev/size can land on a true 4dp
        // half-tie (sf1 soak: 642212.6/4000 = 160.55315 — Spark's
        // BigDecimal HALF_UP said .5532, DuckDB's double rounding
        // .5531). round_half_up(a/b) = (2a+b) div (2b) in exact
        // integer space: micros = cum_rev*1e6, and q*1e4 =
        // micros/(100*size), so ltv4 = (2*micros + 100*size) div
        // (200*size); /1e4 back to double is exact (int < 2^53).
        .withColumn("micros",
          (col("cum_rev") * lit(1000000)).cast("decimal(38,0)"))
        .select(col("cohort_wk"), col("wk_offset"),
          col("cohort_size"),
          round(col("cum_rev").cast("double"), 6).as("cum_rev"),
          (expr("(2*micros + 100*cohort_size) div (200*cohort_size)")
            .cast("double") / lit(10000.0)).as("ltv_per_user"))
        .orderBy(col("cohort_wk"), col("wk_offset"))
    },

    // Rolling 24-hour distinct users per event_type — sliding-window
    // COUNT DISTINCT, the op a naive window can't do (distinct
    // doesn't decompose over frames): each (type, hour, user) row
    // EXPANDS into the 24 anchor hours it contributes to
    // (sequence+explode — a fixed 24× fan-out of the already
    // hour-deduplicated user rows, not of fact rows), then one hash
    // aggregate per (type, anchor) counts distinct users. Anchors
    // keep only OBSERVED hours (semi join) so the readout is
    // bounded by the activity calendar. At 100 TB the expansion
    // factor is the window/granularity ratio — the standard
    // time-series trade; for sketches swap countDistinct for HLL
    // partials and the same plan merges them.
    "q_rolling_distinct_users" -> { (s, dir) =>
      val hu = Tables(s, dir, "events")
        .select(col("event_type"),
          date_trunc("hour", col("ts")).as("h"), col("user_id"))
        .distinct()
      val observed = hu.select(col("event_type"), col("h")).distinct()
      val expanded = hu.select(col("event_type"), col("user_id"),
        explode(expr(
          "sequence(h, h + interval 23 hours, interval 1 hour)"))
          .as("anchor"))
      expanded
        .join(observed.select(col("event_type"),
          col("h").as("anchor")), Seq("event_type", "anchor"),
          "left_semi")
        .groupBy(col("event_type"), col("anchor"))
        .agg(countDistinct(col("user_id")).as("rolling_24h_users"))
        .select(col("event_type"),
          expr("unix_micros(anchor)").as("h_us"),
          col("rolling_24h_users"))
        .orderBy(col("event_type"), col("h_us"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_sessionize" ->
      """WITH seq AS (
           SELECT user_id, ts, event_id, event_type,
             epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 21600000000
                  THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s2 AS (
           SELECT user_id, event_type, us,
             sum(is_new) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
           FROM seq)
         SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           (max(us) - min(us)) // 1000 AS duration_ms,
           count(DISTINCT event_type) AS n_types
         FROM s2 GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",

    "q_equidepth_bins" ->
      """WITH h AS (
           SELECT event_type, event_id, value,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
               ::BIGINT AS hh
           FROM events),
         samp AS (
           SELECT * FROM h
           QUALIFY row_number() OVER (PARTITION BY event_type
             ORDER BY hh, event_id) <= 256),
         sv AS (
           SELECT event_type, list_sort(list(value)) AS v,
                  count(*) AS ns
           FROM samp GROUP BY event_type),
         b AS (
           SELECT event_type,
             round(v[CAST(greatest(1, ceil(0.25 * ns)) AS INTEGER)], 4)
               AS b1,
             round(v[CAST(greatest(1, ceil(0.5 * ns)) AS INTEGER)], 4)
               AS b2,
             round(v[CAST(greatest(1, ceil(0.75 * ns)) AS INTEGER)], 4)
               AS b3
           FROM sv)
         SELECT e.event_type,
           CASE WHEN value <= b1 THEN 0 WHEN value <= b2 THEN 1
                WHEN value <= b3 THEN 2 ELSE 3 END AS bin,
           count(*) AS n, round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
         FROM events e JOIN b ON e.event_type = b.event_type
         GROUP BY 1, 2 ORDER BY e.event_type, bin""",

    "q_pit_features" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, value,
                  epoch_us(ts) AS us
           FROM events),
         f AS (
           SELECT user_id, event_id, event_type, value,
             lag(value) OVER wl AS prev_value,
             us - lag(us) OVER wl AS stale_us,
             count(*) OVER wh AS cnt_1h,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wh
               AS DOUBLE), 4) AS sum_1h
           FROM e
           WINDOW wl AS (PARTITION BY user_id ORDER BY us, event_id),
                  wh AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 3600000000 PRECEDING
                                   AND 1 PRECEDING))
         SELECT user_id, event_id, value AS target_value,
                prev_value, stale_us, cnt_1h, sum_1h
         FROM f WHERE event_type = 'purchase'
         ORDER BY user_id, event_id""",

    "q_agg_quantile_sketch" ->
      """WITH h AS (
           SELECT event_type, event_id, value,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
               ::BIGINT AS hh
           FROM events),
         samp AS (
           SELECT * FROM h
           QUALIFY row_number() OVER (PARTITION BY event_type
             ORDER BY hh, event_id) <= 256),
         sv AS (
           SELECT event_type, list_sort(list(value)) AS v,
                  count(*) AS n_sample
           FROM samp GROUP BY event_type),
         ex AS (
           SELECT event_type,
             quantile_cont(value, 0.5) AS e50,
             quantile_cont(value, 0.9) AS e90,
             quantile_cont(value, 0.99) AS e99
           FROM events GROUP BY event_type)
         SELECT s.event_type, n_sample,
           round(v[CAST(greatest(1, ceil(0.5 * n_sample)) AS INTEGER)], 4)
             AS est_p50,
           round(v[CAST(greatest(1, ceil(0.9 * n_sample)) AS INTEGER)], 4)
             AS est_p90,
           round(v[CAST(greatest(1, ceil(0.99 * n_sample)) AS INTEGER)], 4)
             AS est_p99,
           round(e50, 6) AS exact_p50, round(e90, 6) AS exact_p90,
           round(e99, 6) AS exact_p99
         FROM sv s JOIN ex ON s.event_type = ex.event_type
         ORDER BY s.event_type""",

    // Join-chain formulation: min signup; min click strictly after
    // it; min purchase strictly after that — identical to the
    // greedy fold by exchange argument (taking the earliest
    // qualifying event at each step never forecloses a later step).
    "q_funnel_steps" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click'
                  AND epoch_us(e.ts) > s1.t1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase'
                  AND epoch_us(e.ts) > s2.t2 GROUP BY e.user_id)
         SELECT CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS stage,
                count(*) AS n_users
         FROM u LEFT JOIN s1 USING (user_id)
                LEFT JOIN s2 USING (user_id)
                LEFT JOIN s3 USING (user_id)
         GROUP BY 1 ORDER BY stage""",

    "q_cohort_retention" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
                  epoch_us(ts) // 604800000000 AS wk
           FROM events),
         c AS (SELECT user_id, min(wk) AS c0 FROM act
               GROUP BY user_id)
         SELECT c0 AS cohort_wk, wk - c0 AS wk_offset,
                count(*) AS n_users
         FROM act JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY cohort_wk, wk_offset""",

    "q_agg_heavy_hitters_cms" ->
      """WITH h AS (
           SELECT l_partkey,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
               ::BIGINT AS h1,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 9, 8))
               ::BIGINT AS h2
           FROM lineitem),
         cells AS (
           SELECT l_partkey, j, (h1 + j * h2) % 256 AS bucket
           FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
         sketch AS (
           SELECT j, bucket, count(*) AS cnt FROM cells
           GROUP BY j, bucket),
         probes AS (
           SELECT l_partkey, count(*) AS exact FROM lineitem
           WHERE l_partkey < 50 GROUP BY l_partkey),
         pcells AS (
           SELECT p.l_partkey, p.exact, t.j,
             (('0x' || substr(md5(CAST(p.l_partkey AS VARCHAR)), 1, 8))
               ::BIGINT
              + t.j * ('0x' || substr(md5(CAST(p.l_partkey AS VARCHAR)),
                  9, 8))::BIGINT) % 256 AS bucket
           FROM probes p
           CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) t)
         SELECT pc.l_partkey, min(s.cnt) AS est, pc.exact
         FROM pcells pc JOIN sketch s
           ON pc.j = s.j AND pc.bucket = s.bucket
         GROUP BY pc.l_partkey, pc.exact
         ORDER BY l_partkey""",

    // Full-scan recompute: the incremental snapshot+delta merge must
    // land on exactly this (decimal sums are order-independent).
    "q_agg_incremental" ->
      """SELECT event_type, count(*) AS n_events,
           round((sum(CAST(value AS DECIMAL(18,6)))::DECIMAL(18,6))::DOUBLE,
             6) AS sum_value,
           round((sum(CAST(value AS DECIMAL(18,6)))::DECIMAL(18,6))::DOUBLE
             / count(*), 4) AS avg_value
         FROM events
         GROUP BY event_type
         ORDER BY event_type""",

    "q_acf" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             (CAST(sum(CAST(value AS DECIMAL(18,6)))
               AS DECIMAL(18,6)))::DOUBLE AS x
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, avg(x) AS xbar
           FROM daily GROUP BY 1),
         dd AS (
           SELECT daily.event_type, d, x - xbar AS dx
           FROM daily JOIN m ON daily.event_type = m.event_type),
         denom AS (
           SELECT event_type, sum(dx * dx) AS ss
           FROM dd GROUP BY 1),
         lags AS (
           SELECT CAST(unnest(generate_series(1, 7)) AS INT) AS lag),
         num AS (
           SELECT a.event_type, l.lag,
             count(*) AS n_pairs, sum(a.dx * b.dx) AS num
           FROM dd a CROSS JOIN lags l
             JOIN dd b ON a.event_type = b.event_type
               AND b.d = a.d + l.lag
           GROUP BY 1, 2)
         SELECT num.event_type, CAST(lag AS INT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(num / ss, 4) AS acf
         FROM num JOIN denom ON num.event_type = denom.event_type
         ORDER BY num.event_type, lag""",

    "q_survival_km" ->
      """WITH o AS (
           SELECT c_custkey AS cust, c_mktsegment,
             CAST(o_orderdate AS DATE) AS od, o_orderkey
           FROM orders JOIN customer ON o_custkey = c_custkey),
         rk AS (
           SELECT cust, c_mktsegment, od,
             row_number() OVER (PARTITION BY cust
               ORDER BY od, o_orderkey) AS rn
           FROM o),
         ft AS (
           SELECT cust, min(c_mktsegment) AS seg,
             min(CASE WHEN rn = 1 THEN od END) AS d1,
             min(CASE WHEN rn = 2 THEN od END) AS d2
           FROM rk WHERE rn <= 2 GROUP BY cust),
         hz AS (SELECT max(od) AS hz FROM o),
         subj AS (
           SELECT seg,
             CAST(CASE WHEN d2 IS NOT NULL
               THEN datediff('day', d1, d2)
               ELSE datediff('day', d1, hz) END AS BIGINT) AS t,
             CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
           FROM ft, hz),
         byt AS (
           SELECT seg, t,
             CAST(sum(ev) AS BIGINT) AS d,
             CAST(sum(1 - ev) AS BIGINT) AS cns
           FROM subj GROUP BY 1, 2),
         km AS (
           SELECT seg, t, d, cns,
             CAST(sum(d + cns) OVER (PARTITION BY seg) AS BIGINT)
               AS n_total,
             CAST(sum(d + cns) OVER (PARTITION BY seg ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_incl
           FROM byt),
         km2 AS (
           SELECT seg, t, d,
             n_total - cum_incl + d + cns AS n_risk
           FROM km),
         km3 AS (
           SELECT seg, t, d, n_risk,
             CASE WHEN d < n_risk
               THEN CAST(ln(1.0 - d / n_risk) AS DECIMAL(18,12))
             END AS lnterm
           FROM km2),
         km4 AS (
           SELECT seg, t, d, n_risk,
             sum(lnterm) OVER (PARTITION BY seg ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumln
           FROM km3)
         SELECT seg AS c_mktsegment, t AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
           CASE WHEN d = n_risk THEN 0.0
             ELSE round(exp(CAST(cumln AS DOUBLE)), 6) END
             AS survival
         FROM km4 WHERE d > 0
         ORDER BY c_mktsegment, t_days""",

    // the full recompute IS the oracle — the IVM identity under test
    "q_incremental_join" ->
      """SELECT p_brand, count(*) AS n_items,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
             AS DECIMAL(18,6))::DOUBLE, 6) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q_share_shift" ->
      """WITH li AS (
           SELECT n_name,
             epoch_us(l_shipdate) // 86400000000 AS day,
             CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6)) AS rev
           FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey),
         cut AS (SELECT (min(day) + max(day) + 1) // 2 AS cutday
                 FROM li),
         bn AS (
           SELECT n_name,
             CAST(sum(CASE WHEN day < (SELECT cutday FROM cut)
               THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
               AS DECIMAL(28,6)) AS rev_p1,
             CAST(sum(CASE WHEN day >= (SELECT cutday FROM cut)
               THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END)
               AS DECIMAL(28,6)) AS rev_p2
           FROM li GROUP BY 1),
         tot AS (
           SELECT CAST(sum(rev_p1) AS DECIMAL(28,6)) AS t1,
             CAST(sum(rev_p2) AS DECIMAL(28,6)) AS t2
           FROM bn)
         SELECT n_name,
           round(rev_p1::DOUBLE / t1::DOUBLE, 6) AS share_p1,
           round(rev_p2::DOUBLE / t2::DOUBLE, 6) AS share_p2,
           round(rev_p2::DOUBLE / t2::DOUBLE -
             rev_p1::DOUBLE / t1::DOUBLE, 6) AS share_delta
         FROM bn, tot ORDER BY n_name""",

    "q_return_rate_ci" ->
      """WITH g AS (
           SELECT p_brand, count(*) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returned
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1),
         w AS (
           SELECT p_brand, n, n_returned,
             n_returned / n AS p,
             CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n AS z2n
           FROM g)
         SELECT p_brand, n, n_returned,
           round(p, 6) AS rate,
           round((p + z2n / 2.0) / (1.0 + z2n) -
             CAST(1.96 AS DOUBLE) *
               sqrt(p * (1.0 - p) / n + z2n / (4.0 * n)) /
               (1.0 + z2n), 6) AS wilson_lo,
           round((p + z2n / 2.0) / (1.0 + z2n) +
             CAST(1.96 AS DOUBLE) *
               sqrt(p * (1.0 - p) / n + z2n / (4.0 * n)) /
               (1.0 + z2n), 6) AS wilson_hi
         FROM w ORDER BY p_brand""",

    "q_pareto_abc" ->
      """WITH rev AS MATERIALIZED (
           SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev
           FROM lineitem GROUP BY 1),
         tot AS (SELECT CAST(sum(rev) AS DECIMAL(28,6)) AS tot
                 FROM rev),
         c AS (
           SELECT l_partkey, rev, tot,
             CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,6)) AS cum
           FROM rev, tot),
         cl AS (
           SELECT l_partkey, rev,
             CASE WHEN (cum - rev)::DOUBLE / tot::DOUBLE < 0.80
                    THEN 'A'
                  WHEN (cum - rev)::DOUBLE / tot::DOUBLE < 0.95
                    THEN 'B'
                  ELSE 'C' END AS abc_class
           FROM c)
         SELECT abc_class, count(*) AS n_parts,
           CAST(CAST(CAST(sum(rev) AS DECIMAL(28,6)) AS VARCHAR)
             AS DOUBLE) AS class_revenue
         FROM cl GROUP BY 1 ORDER BY abc_class""",

    "q_anomaly_iqr" ->
      """WITH qs AS (
           SELECT event_type,
             round(quantile_cont(value, 0.25), 6) AS q1,
             round(quantile_cont(value, 0.75), 6) AS q3
           FROM events GROUP BY 1),
         f AS (
           SELECT event_type, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
           FROM qs)
         SELECT e.event_type, count(*) AS n,
           round(min(f.q1), 4) AS q1, round(min(f.q3), 4) AS q3,
           CAST(sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END)
             AS BIGINT) AS n_below,
           CAST(sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END)
             AS BIGINT) AS n_above
         FROM events e JOIN f ON e.event_type = f.event_type
         GROUP BY e.event_type ORDER BY e.event_type""",

    "q_activity_heatmap" ->
      """SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
           CAST(hour(ts) AS BIGINT) AS hr,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
             AS DECIMAL(18,6))::DOUBLE, 6) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY isodow, hr""",

    "q_new_vs_returning" ->
      """WITH act AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         f AS (SELECT user_id, min(d) AS d0 FROM act GROUP BY 1)
         SELECT d,
           CAST(sum(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(sum(CASE WHEN d <> d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
         FROM act JOIN f USING (user_id)
         GROUP BY d ORDER BY d""",

    "q_stickiness" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
             epoch_us(ts) // 604800000000 AS wk
           FROM events),
         dau AS (
           SELECT wk, count(*) AS n_days, avg(dau) AS avg_dau FROM (
             SELECT wk, d, count(*) AS dau FROM (
               SELECT DISTINCT user_id, d, wk FROM ev)
             GROUP BY wk, d)
           GROUP BY wk),
         wau AS (
           SELECT wk, count(*) AS wau FROM (
             SELECT DISTINCT user_id, wk FROM ev)
           GROUP BY wk)
         SELECT dau.wk, CAST(n_days AS BIGINT) AS n_days,
           CAST(wau AS BIGINT) AS wau,
           round(avg_dau, 4) AS avg_dau,
           round(avg_dau / wau, 4) AS stickiness
         FROM dau JOIN wau ON dau.wk = wau.wk
         ORDER BY dau.wk""",

    "q_wow_growth" ->
      """WITH weekly AS (
           SELECT event_type,
             epoch_us(ts) // 604800000000 AS wk,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS rev
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, wk, rev,
             lag(rev, 1) OVER (PARTITION BY event_type
               ORDER BY wk) AS prev
           FROM weekly)
         SELECT event_type, wk, round(rev::DOUBLE, 6) AS rev,
           round((rev - prev)::DOUBLE / prev::DOUBLE, 4) AS wow_growth
         FROM lagged ORDER BY event_type, wk""",

    "q_topk_decayed" ->
      """WITH li AS (
           SELECT l_partkey, CAST(l_shipdate AS DATE) AS d
           FROM lineitem),
         wm AS (SELECT max(d) AS wm FROM li),
         scored AS (
           SELECT l_partkey,
             CAST(pow(0.5, datediff('day', d, wm) / 7.0)
               AS DECIMAL(18,6)) AS decay
           FROM li, wm)
         SELECT l_partkey, count(*) AS n_items,
           round(CAST(sum(decay) AS DECIMAL(18,6))::DOUBLE, 6)
             AS score
         FROM scored GROUP BY l_partkey
         ORDER BY score DESC, l_partkey LIMIT 10""",

    "q_funnel_constrained" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS u, event_type AS et
           FROM events),
         t1 AS (
           SELECT user_id, min(u) AS t1 FROM ev
           WHERE et = 'signup' GROUP BY 1),
         t2 AS (
           SELECT e.user_id, min(e.u) AS t2
           FROM ev e JOIN t1 ON e.user_id = t1.user_id
             AND e.u > t1.t1 AND e.u <= t1.t1 + 259200000000
           WHERE e.et = 'click' GROUP BY 1),
         t3 AS (
           SELECT e.user_id, min(e.u) AS t3
           FROM ev e JOIN t2 ON e.user_id = t2.user_id
             AND e.u > t2.t2 AND e.u <= t2.t2 + 259200000000
           WHERE e.et = 'purchase' GROUP BY 1)
         SELECT stage, step, n FROM (
           SELECT 1 AS stage, 'signup' AS step,
             count(*) AS n FROM t1
           UNION ALL
           SELECT 2 AS stage, 'click_72h' AS step,
             count(*) AS n FROM t2
           UNION ALL
           SELECT 3 AS stage, 'purchase_72h' AS step,
             count(*) AS n FROM t3)
         ORDER BY stage""",

    "q_funnel_time_to_convert" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS u, event_type AS et
           FROM events),
         t1 AS (
           SELECT user_id, min(u) AS t1 FROM ev
           WHERE et = 'signup' GROUP BY 1),
         t2 AS (
           SELECT e.user_id, min(e.u) AS t2, min(t1.t1) AS t1
           FROM ev e JOIN t1 ON e.user_id = t1.user_id
             AND e.u > t1.t1
           WHERE e.et = 'click' GROUP BY 1),
         t3 AS (
           SELECT e.user_id, min(e.u) AS t3, min(t2.t2) AS t2
           FROM ev e JOIN t2 ON e.user_id = t2.user_id
             AND e.u > t2.t2
           WHERE e.et = 'purchase' GROUP BY 1),
         d AS (
           SELECT 'signup_to_click' AS transition,
             (t2 - t1) / 3600000000.0 AS hrs
           FROM t2
           UNION ALL
           SELECT 'click_to_purchase' AS transition,
             (t3 - t2) / 3600000000.0 AS hrs
           FROM t3)
         SELECT transition, count(*) AS n_users,
           round(quantile_cont(hrs, 0.5), 4) AS median_hours,
           round(quantile_cont(hrs, 0.9), 4) AS p90_hours
         FROM d GROUP BY transition ORDER BY transition""",

    "q_quantile_normalize" ->
      """WITH q AS (
           SELECT event_type,
             quantile_cont(value, [0.05, 0.1, 0.15, 0.2, 0.25, 0.3,
               0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75,
               0.8, 0.85, 0.9, 0.95, 1.0]) AS qs
           FROM events GROUP BY event_type),
         bins AS (
           SELECT unnest(generate_series(1, 20)) AS bin),
         x AS (
           SELECT event_type, bin, qs[bin] AS qv
           FROM q, bins)
         SELECT bin,
           count(*) AS n_types,
           round(avg(qv), 4) AS ref_value,
           round(max(qv) - min(qv), 4) AS spread
         FROM x GROUP BY bin ORDER BY bin""",

    "q_gap_fill" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS rev
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT event_type,
             unnest(generate_series(min(h), max(h),
               INTERVAL 1 HOUR)) AS h
           FROM hourly GROUP BY event_type)
         SELECT s.event_type, epoch_us(s.h) AS h_us,
           round(coalesce(last_value(hr.rev IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             CAST(0 AS DECIMAL(18,6)))::DOUBLE, 6) AS rev_filled,
           hr.rev IS NULL AS is_gap
         FROM spine s
         LEFT JOIN hourly hr
           ON s.event_type = hr.event_type AND s.h = hr.h
         ORDER BY s.event_type, h_us""",

    // err is DECIMAL(18,6); DuckDB 1.0 multiplies DECIMAL(18) operands
    // in int64 and overflows once |err| > ~3e3 (hit at sf0.1) — the
    // DECIMAL(28,6) operand casts force the int128 path, same value.
    "q_forecast_backtest" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS rev
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT event_type,
             unnest(generate_series(min(h), max(h),
               INTERVAL 1 HOUR)) AS h
           FROM hourly GROUP BY event_type),
         dense AS (
           SELECT s.event_type, s.h,
             coalesce(hr.rev, CAST(0 AS DECIMAL(18,6))) AS rev0
           FROM spine s
           LEFT JOIN hourly hr
             ON s.event_type = hr.event_type AND s.h = hr.h),
         lagged AS (
           SELECT event_type, rev0,
             lag(rev0, 24) OVER (PARTITION BY event_type
               ORDER BY h) AS pred
           FROM dense),
         e AS (
           SELECT event_type, rev0, pred,
             CAST(rev0 - pred AS DECIMAL(18,6)) AS err
           FROM lagged WHERE pred IS NOT NULL),
         g AS (
           SELECT event_type, count(*) AS n_eval,
             CAST(sum(abs(err)) AS DECIMAL(28,6)) AS sae,
             CAST(sum(CAST(CAST(err AS DECIMAL(28,6))
               * CAST(err AS DECIMAL(28,6)) AS DECIMAL(38,12)))
               AS DECIMAL(38,12)) AS sse,
             CAST(sum(abs(rev0)) AS DECIMAL(28,6)) AS sa
           FROM e GROUP BY 1)
         SELECT event_type, n_eval,
           round(sae::DOUBLE / n_eval, 4) AS mae,
           round(sqrt(sse::DOUBLE / n_eval), 4) AS rmse,
           round(sae::DOUBLE / sa::DOUBLE, 4) AS wape
         FROM g ORDER BY event_type""",

    "q_fulfillment_latency" ->
      """WITH d AS (
           SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS lag_days
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey)
         SELECT o_orderpriority,
           count(*) AS n_lines,
           round(CAST(sum(lag_days) AS DOUBLE) / count(*), 4)
             AS avg_days,
           quantile_cont(lag_days, 0.5) AS median_days,
           quantile_cont(lag_days, 0.9) AS p90_days,
           CAST(max(lag_days) AS BIGINT) AS max_days
         FROM d GROUP BY 1 ORDER BY o_orderpriority""",

    // q is DECIMAL(18,6); operand casts to DECIMAL(28,6) keep the
    // square on the int128 path (the int64 mult overflows once a
    // per-part weekly sum passes ~3e3 — latent at higher SF).
    "q_demand_variability" ->
      """WITH li AS (
           SELECT l_partkey,
             epoch_us(l_shipdate) // 604800000000 AS wk,
             l_quantity
           FROM lineitem),
         weeks AS (SELECT count(DISTINCT wk) AS n_weeks FROM li),
         perwk AS (
           SELECT l_partkey, wk,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
               AS DECIMAL(18,6)) AS q
           FROM li GROUP BY 1, 2),
         perpart AS (
           SELECT l_partkey,
             CAST(sum(q) AS DECIMAL(28,6)) AS sq,
             CAST(sum(CAST(CAST(q AS DECIMAL(28,6))
               * CAST(q AS DECIMAL(28,6)) AS DECIMAL(38,12)))
               AS DECIMAL(38,12)) AS sq2
           FROM perwk GROUP BY 1),
         cvx AS (
           SELECT l_partkey,
             CAST(sqrt(greatest(
               sq2::DOUBLE / w.n_weeks
                 - (sq::DOUBLE / w.n_weeks) * (sq::DOUBLE / w.n_weeks),
               0.0)) / (sq::DOUBLE / w.n_weeks) AS DECIMAL(18,8))
               AS cvd
           FROM perpart, weeks w)
         SELECT CASE WHEN cvd::DOUBLE < 0.5 THEN 'X'
                     WHEN cvd::DOUBLE < 1.0 THEN 'Y'
                     ELSE 'Z' END AS xyz_class,
           count(*) AS n_parts,
           round(CAST(sum(cvd) AS DECIMAL(28,8))::DOUBLE / count(*), 4)
             AS avg_cv,
           round(min(cvd)::DOUBLE, 4) AS min_cv,
           round(max(cvd)::DOUBLE, 4) AS max_cv
         FROM cvx GROUP BY 1 ORDER BY xyz_class""",

    "q_post_stratification" ->
      """WITH strata AS (
           SELECT event_type, count(*) AS n_s,
             CAST(sum(CAST(value AS DECIMAL(18,6)))
               AS DECIMAL(28,6)) AS sv
           FROM events GROUP BY 1),
         g AS (
           SELECT CAST(sum(n_s) AS BIGINT) AS n,
             count(*) AS k_strata,
             CAST(sum(sv) AS DECIMAL(28,6)) AS sv_all,
             CAST(sum(CAST(sv::DOUBLE / n_s AS DECIMAL(18,8)))
               AS DECIMAL(28,8)) AS sum_means,
             CAST(sum(CAST(CAST(1.0 AS DOUBLE) / n_s
               AS DECIMAL(18,12))) AS DECIMAL(28,12)) AS sum_inv
           FROM strata)
         SELECT n, k_strata,
           round(sv_all::DOUBLE / n, 4) AS mean_raw,
           round(sum_means::DOUBLE / k_strata, 4) AS mean_poststrat,
           round(k_strata * k_strata / sum_inv::DOUBLE, 2)
             AS kish_neff
         FROM g""",

    "q_percentile_weighted" ->
      """WITH blocks AS (
           SELECT l_returnflag, l_extendedprice,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
               AS DECIMAL(28,6)) AS bw
           FROM lineitem GROUP BY 1, 2),
         cum AS (
           SELECT l_returnflag, l_extendedprice, bw,
             sum(bw) OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(bw) OVER (PARTITION BY l_returnflag) AS tw
           FROM blocks)
         SELECT l_returnflag,
           round(any_value(tw)::DOUBLE, 6) AS total_qty,
           round(min(CASE WHEN cw::DOUBLE >= 0.5 * tw::DOUBLE
             THEN l_extendedprice END), 2) AS w_median_price,
           round(min(CASE WHEN cw::DOUBLE >= 0.9 * tw::DOUBLE
             THEN l_extendedprice END), 2) AS w_p90_price,
           count(*) AS n_price_points
         FROM cum GROUP BY 1 ORDER BY l_returnflag""",

    // rev is DECIMAL(18,6); operand casts to DECIMAL(28,6) keep the
    // square on the int128 path (int64 mult overflowed at sf0.1).
    "q_seasonality_strength" ->
      """WITH hourly AS (
           SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS rev
           FROM events GROUP BY 1, 2),
         hod AS (
           SELECT event_type,
             CAST(sum(CAST(s_h::DOUBLE * s_h::DOUBLE / n_h
               AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS ssq_profile
           FROM (
             SELECT event_type, extract(hour FROM h) AS hod,
               count(*) AS n_h,
               CAST(sum(rev) AS DECIMAL(28,6)) AS s_h
             FROM hourly GROUP BY 1, 2)
           GROUP BY 1),
         tot AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(rev) AS DECIMAL(28,6)) AS sx,
             CAST(sum(CAST(CAST(rev AS DECIMAL(28,6))
               * CAST(rev AS DECIMAL(28,6)) AS DECIMAL(38,12)))
               AS DECIMAL(38,12)) AS sx2
           FROM hourly GROUP BY 1)
         SELECT t.event_type, t.n AS n_hours,
           round(t.sx2::DOUBLE / t.n
             - (t.sx::DOUBLE / t.n) * (t.sx::DOUBLE / t.n), 4)
             AS var_total,
           round(greatest((t.sx2::DOUBLE - p.ssq_profile::DOUBLE)
             / t.n, 0.0), 4) AS var_resid,
           round(greatest(0.0, 1.0
             - ((t.sx2::DOUBLE - p.ssq_profile::DOUBLE) / t.n)
               / (t.sx2::DOUBLE / t.n
                 - (t.sx::DOUBLE / t.n) * (t.sx::DOUBLE / t.n))), 4)
             AS seasonality_strength
         FROM tot t JOIN hod p USING (event_type)
         ORDER BY t.event_type""",

    "q_lorenz_deciles" ->
      """WITH pc AS (
           SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
               AS DECIMAL(18,6)) AS rev
           FROM orders GROUP BY 1),
         edges AS (
           SELECT list_transform(quantile_cont(rev::DOUBLE,
             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             x -> round(x, 6)) AS es
           FROM pc),
         assigned AS (
           SELECT rev,
             CAST(1 + len(list_filter(e.es,
               x -> x < rev::DOUBLE)) AS BIGINT) AS decile
           FROM pc, edges e),
         bydec AS (
           SELECT decile, count(*) AS n_customers,
             CAST(sum(rev) AS DECIMAL(28,6)) AS decile_rev
           FROM assigned GROUP BY 1),
         cum AS (
           SELECT decile, n_customers,
             sum(n_customers) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_n,
             sum(n_customers) OVER () AS tot_n,
             sum(decile_rev) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev,
             sum(decile_rev) OVER () AS tot_rev
           FROM bydec)
         SELECT decile, n_customers,
           round(cum_n / tot_n::DOUBLE, 4) AS cum_pop_share,
           round(cum_rev::DOUBLE / tot_rev::DOUBLE, 4)
             AS cum_rev_share
         FROM cum ORDER BY decile""",

    "q_retention_halflife" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS wk
           FROM events),
         cohorts AS (
           SELECT user_id, min(wk) AS c0 FROM act GROUP BY 1),
         curve AS (
           SELECT a.wk - c.c0 AS wk_offset,
             count(DISTINCT a.user_id) AS n_active
           FROM act a JOIN cohorts c USING (user_id)
           GROUP BY 1),
         base AS (
           SELECT n_active AS n_base FROM curve WHERE wk_offset = 0),
         pts AS (
           SELECT CAST(wk_offset AS DOUBLE) AS x,
             CAST(ln(n_active / b.n_base::DOUBLE) AS DECIMAL(18,8))
               AS y
           FROM curve, base b WHERE wk_offset > 0),
         g AS (
           SELECT count(*) AS k,
             CAST(sum(CAST(x AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS sx,
             CAST(sum(y) AS DECIMAL(28,8)) AS sy,
             CAST(sum(CAST(y * CAST(x AS DECIMAL(18,6))
               AS DECIMAL(28,8))) AS DECIMAL(38,8)) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(18,6)))
               AS DECIMAL(28,6)) AS sx2
           FROM pts)
         SELECT k AS n_weeks,
           round((sy::DOUBLE - ((k * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (k * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE))
             * sx::DOUBLE) / k, 4) AS intercept_ln,
           round((k * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (k * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE), 4)
             AS slope_ln,
           CASE WHEN (k * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / (k * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE) < 0
             THEN round(ln(2.0)
               / -((k * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (k * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)), 2)
             END AS half_life_weeks
         FROM g""",

    "q_basket_entropy" ->
      """WITH li AS (
           SELECT l.l_orderkey AS ok, o.o_orderpriority, p.p_brand
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           JOIN orders o ON l.l_orderkey = o.o_orderkey),
         bc AS (
           SELECT ok, o_orderpriority, p_brand, count(*) AS c
           FROM li GROUP BY 1, 2, 3),
         wt AS (
           SELECT ok, o_orderpriority, c,
             sum(c) OVER (PARTITION BY ok) AS n
           FROM bc),
         po AS (
           SELECT ok, o_orderpriority,
             CAST(sum(CAST(-(c / n::DOUBLE) * ln(c / n::DOUBLE)
               AS DECIMAL(18,8))) AS DECIMAL(18,8)) AS h,
             count(*) AS n_brands
           FROM wt GROUP BY 1, 2)
         SELECT o_orderpriority, count(*) AS n_orders,
           round(CAST(sum(h) AS DECIMAL(28,8))::DOUBLE / count(*), 4)
             AS avg_entropy,
           round(max(h)::DOUBLE, 4) AS max_entropy,
           round(avg(n_brands), 4) AS avg_brands
         FROM po GROUP BY 1 ORDER BY o_orderpriority""",

    "q_segment_migration" ->
      """WITH cutq AS (
           SELECT quantile_cont(epoch_us(o_orderdate), 0.5) AS cut
           FROM orders),
         tagged AS (
           SELECT o_custkey AS cust,
             epoch_us(o_orderdate) <= c.cut AS first_half,
             CAST(o_totalprice AS DECIMAL(18,6)) AS rev
           FROM orders, cutq c),
         h1 AS (
           SELECT cust, CAST(sum(rev) AS DECIMAL(18,6)) AS r
           FROM tagged WHERE first_half GROUP BY 1),
         e1 AS (
           SELECT list_transform(quantile_cont(r::DOUBLE,
             [0.3333, 0.6667]), x -> round(x, 6)) AS es
           FROM h1),
         s1 AS (
           SELECT cust,
             CASE WHEN r::DOUBLE <= e.es[1] THEN 'low'
                  WHEN r::DOUBLE <= e.es[2] THEN 'mid'
                  ELSE 'high' END AS seg_p1
           FROM h1, e1 e),
         h2 AS (
           SELECT cust, CAST(sum(rev) AS DECIMAL(18,6)) AS r
           FROM tagged WHERE NOT first_half GROUP BY 1),
         e2 AS (
           SELECT list_transform(quantile_cont(r::DOUBLE,
             [0.3333, 0.6667]), x -> round(x, 6)) AS es
           FROM h2),
         s2 AS (
           SELECT cust,
             CASE WHEN r::DOUBLE <= e.es[1] THEN 'low'
                  WHEN r::DOUBLE <= e.es[2] THEN 'mid'
                  ELSE 'high' END AS seg_p2
           FROM h2, e2 e),
         j AS (
           SELECT coalesce(s1.seg_p1, 'none') AS seg_p1,
             coalesce(s2.seg_p2, 'none') AS seg_p2
           FROM s1 FULL OUTER JOIN s2 USING (cust))
         SELECT seg_p1, seg_p2, count(*) AS n_customers
         FROM j GROUP BY 1, 2 ORDER BY seg_p1, seg_p2""",

    "q_seasonal_index" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS rev
           FROM events GROUP BY 1, 2),
         bydow AS (
           SELECT event_type,
             CAST(extract(dow FROM d) + 1 AS BIGINT) AS dow,
             count(*) AS n_days,
             CAST(sum(rev) AS DECIMAL(28,6)) AS s
           FROM daily GROUP BY 1, 2),
         overall AS (
           SELECT event_type, count(*) AS n_all,
             CAST(sum(rev) AS DECIMAL(28,6)) AS s_all
           FROM daily GROUP BY 1)
         SELECT b.event_type, b.dow, b.n_days,
           round((b.s::DOUBLE / b.n_days)
             / (o.s_all::DOUBLE / o.n_all), 4) AS seasonal_index
         FROM bydow b JOIN overall o USING (event_type)
         ORDER BY b.event_type, b.dow""",

    "q_cohort_ltv" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
             CAST(value AS DECIMAL(18,6)) AS rev
           FROM events WHERE event_type = 'purchase'),
         cohorts AS (
           SELECT user_id, min(wk) AS c0 FROM p GROUP BY 1),
         sized AS (
           SELECT c0 AS cohort_wk, count(DISTINCT user_id)
             AS cohort_size
           FROM cohorts GROUP BY 1),
         grid AS (
           SELECT c.c0 AS cohort_wk, p.wk - c.c0 AS wk_offset,
             CAST(sum(p.rev) AS DECIMAL(28,6)) AS wk_rev
           FROM p JOIN cohorts c USING (user_id)
           GROUP BY 1, 2),
         cum AS (
           SELECT cohort_wk, wk_offset,
             CAST(sum(wk_rev) OVER (PARTITION BY cohort_wk
               ORDER BY wk_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,6)) AS cum_rev
           FROM grid)
         SELECT c.cohort_wk, c.wk_offset, s.cohort_size,
           round(c.cum_rev::DOUBLE, 6) AS cum_rev,
           -- exact integer round-half-up, mirror of the Spark side:
           -- double rounding of a true 4dp half-tie is engine-dependent
           (((2 * CAST(c.cum_rev * 1000000 AS HUGEINT)
              + 100 * s.cohort_size)
             // (200 * s.cohort_size))::DOUBLE / 10000.0)
             AS ltv_per_user
         FROM cum c JOIN sized s USING (cohort_wk)
         ORDER BY c.cohort_wk, c.wk_offset""",

    "q_rolling_distinct_users" ->
      """WITH hu AS (
           SELECT DISTINCT event_type, date_trunc('hour', ts) AS h,
             user_id
           FROM events),
         observed AS (
           SELECT DISTINCT event_type, h FROM hu),
         expanded AS (
           SELECT event_type, user_id,
             unnest(generate_series(h, h + INTERVAL 23 HOUR,
               INTERVAL 1 HOUR)) AS anchor
           FROM hu),
         filtered AS (
           SELECT e.event_type, e.user_id, e.anchor
           FROM expanded e
           WHERE EXISTS (SELECT 1 FROM observed o
             WHERE o.event_type = e.event_type AND o.h = e.anchor))
         SELECT event_type, epoch_us(anchor) AS h_us,
           count(DISTINCT user_id) AS rolling_24h_users
         FROM filtered GROUP BY 1, 2
         ORDER BY event_type, h_us""",
  )
}
