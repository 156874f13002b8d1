package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality / operations operators a 100 TB pipeline runs beside
  * the analytics proper: one-pass column profiling (the "what is in
  * this table" scan), rolling-statistics anomaly detection over the
  * event stream, and blocked record linkage (entity resolution).
  *
  * Scale designs:
  *  - profiling reads the table ONCE for every per-column statistic
  *    (multi-distinct plans via Expand — one scan, not one scan per
  *    column; ProfileSpec pins the single-scan plan);
  *  - anomaly scoring is a rows-frame window per event_type — one
  *    shuffle on the type key, and the rolling moments are exact
  *    DECIMAL sums so the score is bit-identical in any engine
  *    (double window-sums are association-dependent: Spark's sliding
  *    accumulator and DuckDB's segment tree would disagree in ulps);
  *  - entity resolution joins on a blocking key (never all-pairs) and
  *    verifies candidates with edit distance — the same
  *    block→candidate→verify envelope as the LSH dedup family.
  */
object QualityQueries {

  /** Columns profiled by q_profile_columns — a representative mix of
    * key, low-cardinality, date, and free-text columns. min/max are
    * emitted as strings so one result schema covers all types
    * (binary collation in both engines).
    */
  private val profileCols =
    Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate",
      "l_quantity")

  /** Shared ER fixture: the distinct part-name dictionary plus one
    * planted near-variant per name (last char → '#'). Variant ids
    * sit in a disjoint range derived IN-PLAN from the data (next
    * multiple of 10⁶ above max id, one-row broadcast): a fixed
    * constant collides with real ids once p_partkey grows past it
    * (sf ≳ 2.5), silently corrupting the a.id < b.id pair dedup.
    * Integer arithmetic keeps Spark and DuckDB bit-equal. The
    * one-row broadcast attaches as a nested-loop join by
    * construction (a constant key would be folded right back);
    * QualitySpec pins that the PAIR join stays hash-on-block.
    */
  private def erCorpus(s: SparkSession, dir: String): DataFrame = {
    val dict = Tables(s, dir, "part")
      .groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
    val off = dict.agg(
      ((floor(max(col("id")) / 1000000L) + 1L) * 1000000L)
        .cast("long").as("off"))
    val variants = dict.crossJoin(broadcast(off))
      .select((col("id") + col("off")).as("id"),
        concat(expr("substring(p_name, 1, length(p_name) - 1)"),
          lit("#")).as("p_name"))
    dict.select(col("id"), col("p_name")).unionByName(variants)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // One-pass table profile: row count, null count, exact distinct
    // count, min/max for five lineitem columns — in a SINGLE
    // aggregate over a single scan. Catalyst plans the five exact
    // count-distincts as one Expand (each input row fans out once
    // per distinct column) + two-level hash aggregate; at 100 TB
    // that is one read of the table instead of five, and the
    // shuffle carries only (column, value) pairs pre-deduplicated
    // map-side. The row-multiplication cost of Expand is the
    // documented trade for exactness; swap countDistinct for
    // approx_count_distinct when a profile tolerates ±2%.
    "q_profile_columns" -> { (s, dir) =>
      // fanOut (r13): the 6-way Expand the count-distinct rewrite
      // plants ran inside the single-task scan stage (3.6M expanded
      // rows on one core); hashing the raw rows out by l_orderkey
      // first parallelizes the Expand + partial aggregation. No-op
      // at scale.
      val li = graft.Tables.fanOut(Tables(s, dir, "lineitem"),
        col("l_orderkey"))
      val aggs = profileCols.flatMap { c =>
        // HashAggregate demands FIXED-WIDTH aggregation buffers; a
        // min/max over a string column forces SortAggregate, which
        // sorts the whole 6×-expanded stream — measured 5.8 s vs
        // ~1 s at sf0.1. The one string column here is the 1-char
        // returnflag, so its min/max ride through ascii()/char()
        // (order-isomorphic for single chars) and every buffer stays
        // numeric. A general profiler pays SortAggregate for long
        // string extremes or drops them — documented trade.
        val (mn, mx) =
          if (c == "l_returnflag")
            (expr(s"char(min(ascii($c)))"), expr(s"char(max(ascii($c)))"))
          else (min(col(c)).cast("string"), max(col(c)).cast("string"))
        Seq(count(col(c)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"),
          mn.as(s"${c}__mn"), mx.as(s"${c}__mx"))
      }
      val stackArgs = profileCols.map { c =>
        s"'$c', __total - ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx"
      }.mkString(", ")
      li.agg(count(lit(1)).as("__total"), aggs: _*)
        .select(col("__total").as("n_rows"),
          expr(s"stack(${profileCols.size}, $stackArgs) AS " +
            "(col_name, n_nulls, n_distinct, min_val, max_val)"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy(col("col_name"))
    },

    // Rolling z-score anomaly detection — scoring semantics and the
    // exact-decimal-moments portability argument live in
    // [[graft.operators.Anomaly.rollingZ]], which the streaming form
    // (StreamAnomaly, spec-pinned row-identical) shares.
    "q_anomaly_zscore" -> { (s, dir) =>
      val scored = graft.operators.Anomaly.rollingZ(
        Tables(s, dir, "events"), col("event_type"),
        Seq(col("ts"), col("event_id")), col("value"))
      scored.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("z")).as("n_scored"),
          count(when(abs(col("z")) > 3, 1)).as("n_anomalies"),
          round(max(abs(col("z"))), 4).as("max_abs_z"))
        .orderBy(col("event_type"))
    },

    // Blocked entity resolution over part names with planted
    // single-char corruptions (every distinct name gets an
    // id-shifted variant with its last char replaced): the rows
    // first canonicalize to the DISTINCT-NAME dictionary (min
    // partkey as representative), and pairing happens in dictionary
    // space — candidates pair only within a blocking key (first
    // word), verified ONCE by edit distance. Dictionary-first is THE
    // scale decision: a name space is sublinear in the row count (64
    // names under 20k rows here — and a first formulation that
    // paired ROWS spent 42 s at sf0.1 on a quadratic same-name match
    // stream whose pairs carry no information), so the dictionary
    // aggregation is the only row-scale pass, map-side-partial, and
    // the quadratic stage runs over Σ(name-block²). Production adds
    // complementary blocking passes (phonetic, q-gram, LSH bands)
    // the same way the dedup family stacks band keys; QualitySpec
    // pins the no-cartesian plan.
    "q_entity_resolution" -> { (s, dir) =>
      val keyed = erCorpus(s, dir)
        .withColumn("block", element_at(split(col("p_name"), " "), 1))
      val a = keyed.as("a")
      val b = keyed.as("b")
      a.join(b, col("a.block") === col("b.block")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
        .filter(col("dist") <= 2)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Phonetic-blocking audit — the complementary ER pass the
    // entity-resolution scaladoc promises: candidates block on a
    // vowel/space-stripped consonant skeleton (first 6 chars), the
    // engine-portable stand-in for Soundex (DuckDB has no soundex;
    // regexp character classes behave identically in both). Output
    // is the blocking-quality scorecard a dedup pipeline tunes on:
    // block count, worst block, candidate volume (Σ block²-shaped),
    // and verified matches — the numbers that decide whether this
    // key needs another round of splitting before the quadratic
    // verify stage is affordable at scale.
    "q_er_phonetic_block" -> { (s, dir) =>
      // three aggregation branches consume the corpus (block stats,
      // pair stats, name count) — cache it once or each branch
      // re-runs the dictionary aggregate + broadcast subtree
      // (measured 4.6 s → sub-second at sf0.1)
      val keyed = graft.CachedPlans.cache(
        erCorpus(s, dir).withColumn("block",
          substring(regexp_replace(lower(col("p_name")),
            "[aeiou ]", ""), 1, 6)))
      val a = keyed.as("a")
      val b = keyed.as("b")
      val pairs = a.join(b, col("a.block") === col("b.block")
          && col("a.id") < col("b.id"))
        .select(col("a.block").as("block"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("dist"))
      val blockStats = keyed.groupBy(col("block"))
        .agg(count(lit(1)).as("bn"))
        .agg(count(lit(1)).as("n_blocks"), max(col("bn")).as("max_block"))
      val pairStats = pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("dist") <= 2, 1L).otherwise(0L)).as("n_matches"))
      keyed.agg(count(lit(1)).as("n_names"))
        .crossJoin(broadcast(blockStats))
        .crossJoin(broadcast(pairStats))
        .select(col("n_names"), col("n_blocks"), col("max_block"),
          col("n_candidate_pairs"), col("n_matches"),
          round(col("n_matches") / col("n_candidate_pairs"), 4)
            .as("verify_yield"))
    },

    // Distribution-drift audit (PSI): the ML-data-ops gate that
    // catches a feature's distribution shifting between a reference
    // period and the current one before a model trains on it.
    // Periods split at the median epoch-week (derived IN-PLAN by a
    // one-row integer-arithmetic broadcast — no driver constant to
    // rot); values histogram into fixed decade bins; per (type, bin)
    // the two period counts come out of ONE hash aggregate over ONE
    // scan (map-side partials — the wire carries |types × bins|
    // rows, never events). PSI = Σ (p−q)·ln(p/q) with add-one
    // smoothing over the observed-bin union (no ln(0)), each term
    // quantized through DECIMAL(18,6) before the sum so the rollup
    // is order-independent and engine-exact (the perplexity recipe).
    // Rule of thumb pinned in QualitySpec: PSI < 0.1 stable, > 0.25
    // action.
    "q_drift_psi" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          floor(col("value") / 10).cast("long").as("bin"))
      val cut = ev.agg(expr("(min(wk) + max(wk) + 1) div 2").as("cutwk"))
      val counts = ev.crossJoin(broadcast(cut))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("wk") < col("cutwk"), 1L).otherwise(0L))
            .as("c_ref"),
          sum(when(col("wk") >= col("cutwk"), 1L).otherwise(0L))
            .as("c_cur"))
      val stats = counts.groupBy(col("event_type"))
        .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"),
          count(lit(1)).as("n_bins"))
      val p = (col("c_ref") + 1).cast("double") /
        (col("n_ref") + col("n_bins")).cast("double")
      val q = (col("c_cur") + 1).cast("double") /
        (col("n_cur") + col("n_bins")).cast("double")
      counts.join(stats, "event_type")
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          col("n_bins"),
          ((p - q) * log(p / q).cast("decimal(18,6)").cast("double"))
            .cast("decimal(18,6)").as("term"))
        .groupBy(col("event_type"), col("n_ref"), col("n_cur"),
          col("n_bins"))
        .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
        .select(col("event_type"), col("n_bins"), col("n_ref"),
          col("n_cur"), col("psi"))
        .orderBy(col("event_type"))
    },

    // CDC apply-changes: collapse a keyed change log (insert /
    // update / delete, totally ordered per key by (ts, event_id))
    // into the current snapshot — the lakehouse MERGE/apply_changes
    // primitive. events stands in as the log: signup→I, error→D,
    // everything else→U; a key whose LAST change is a delete leaves
    // the snapshot. One max_by hash aggregate (map-side partials —
    // the shuffle carries |keys| pre-combined rows, not |rows|; same
    // shape as latest-per-key, plan-pinned in PlanSpec) plus a
    // post-agg delete filter: no window sort, no join, and at 100 TB
    // the log is never globally sorted.
    "q_cdc_apply" -> { (s, dir) =>
      val log = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U").as("op"))
      log.groupBy(col("user_id"))
        .agg(max_by(struct(col("op"), col("value"), col("ts")),
            struct(col("ts"), col("event_id"))).as("last"),
          count(lit(1)).as("n_changes"))
        .filter(col("last.op") =!= "D")
        .select(col("user_id"), col("last.op").as("last_op"),
          round(col("last.value"), 4).as("last_value"),
          unix_millis(col("last.ts")).as("last_ts_ms"),
          col("n_changes"))
        .orderBy(col("user_id"))
    },

    // k-anonymity audit over quasi-identifiers — the privacy gate a
    // training-data release runs: rows whose QI combination (event
    // type × value decade × epoch-week here) is shared by fewer than
    // k=5 rows are re-identification risks. Two hash aggregates (QI
    // group sizes, then per-type rollup), no window; at 100 TB the
    // QI-group count is bounded by the QI domain, not the row count,
    // and both aggs take map-side partials.
    "q_k_anonymity" -> { (s, dir) =>
      val k = 5
      val groups = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast("long").as("value_bucket"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .agg(count(lit(1)).as("gsize"))
      groups.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("gsize") < k, 1L).otherwise(0L))
            .as("n_small_groups"),
          sum(when(col("gsize") < k, col("gsize")).otherwise(0L))
            .cast("long").as("n_rows_at_risk"),
          round(sum(when(col("gsize") < k, col("gsize")).otherwise(0L))
            .cast("double") / sum(col("gsize")), 4).as("risk_frac"))
        .orderBy(col("event_type"))
    },

    // CUSUM change-point detection over the daily event stream: the
    // day where the cumulative deviation of daily volume from its
    // per-type mean peaks. The textbook statistic is
    // Σ(daily_mean − overall_mean) — divisions whose engine-specific
    // decimal rounding would poison parity. Multiply through by
    // n_days instead: dev_k = daily_sum_k·n_days − total_sum is the
    // SAME argmax in EXACT decimal arithmetic (no division
    // anywhere). One daily aggregate (map-side combined), a per-type
    // one-row broadcast of totals, a cumulative window over the
    // per-type DAY table (bounded by the calendar, not row count),
    // then argmax-by-|cusum| with a deterministic day tie-break.
    "q_changepoint_cusum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("dsum"),
          count(lit(1)).as("n"))
      // per-type totals as FULL-PARTITION windows over the tiny
      // daily table (not a self-join back to a second aggregate —
      // that shape scans events twice; this is one scan + one
      // type-key shuffle)
      val perType = Window.partitionBy(col("event_type"))
      val byDay = perType.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cusum = daily
        .withColumn("total", sum(col("dsum")).over(perType))
        .withColumn("n_days", count(lit(1)).over(perType))
        .withColumn("cusum",
          sum(col("dsum") * col("n_days") - col("total")).over(byDay)
            .cast("decimal(28,6)"))
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("cusum")).desc, col("day"))
      cusum.withColumn("rk", row_number().over(pick))
        .where(col("rk") === 1)
        .select(col("event_type"), col("day").as("changepoint_day"),
          col("n_days"),
          round(abs(col("cusum")).cast("double"), 6)
            .as("max_abs_cusum"))
        .orderBy(col("event_type"))
    },

    // l-diversity audit — the companion to k-anonymity: a QI group
    // can be large (k-anonymous) yet still leak if every row shares
    // one sensitive value. Here the sensitive attribute is user_id
    // and l = 3: per QI group count DISTINCT sensitive values, then
    // roll up per type. Same two-hash-aggregate shape as
    // q_k_anonymity — group count bounded by the QI domain, both
    // aggs take map-side partials.
    "q_l_diversity" -> { (s, dir) =>
      val l = 3
      val groups = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast("long").as("value_bucket"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        .agg(count(lit(1)).as("gsize"),
          countDistinct(col("user_id")).as("n_sensitive"))
      groups.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n_sensitive") < l, 1L).otherwise(0L))
            .as("n_low_diversity"),
          sum(when(col("n_sensitive") < l, col("gsize"))
            .otherwise(0L)).cast("long").as("n_rows_at_risk"),
          round(min(col("n_sensitive")).cast("double"), 1)
            .as("min_diversity"))
        .orderBy(col("event_type"))
    },

    // Declarative data-quality expectations (the dbt-test /
    // Great-Expectations shape): each rule is one aggregate over its
    // table — referential integrity as a broadcast left join with a
    // null-count (never an anti-join SUBTRACTION, which would need a
    // second pass for n_checked), range/nullness as conditional
    // sums. One scan per table, rules on the same table can fuse;
    // the result is a tiny (rule, checked, violations, passed)
    // contract table a pipeline gates deploys on.
    "q_dq_expectations" -> { (s, dir) =>
      def rule(name: String, df: DataFrame, bad: Column): DataFrame =
        df.agg(count(lit(1)).as("n_checked"),
            sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"),
            col("n_violations"),
            (col("n_violations") === 0).as("passed"))
      val orders = Tables(s, dir, "orders")
      val withCust = orders.join(
        broadcast(Tables(s, dir, "customer").select(col("c_custkey"))),
        orders("o_custkey") === col("c_custkey"), "left_outer")
      rule("fk_orders_customer", withCust, col("c_custkey").isNull)
        .unionByName(rule("range_lineitem_quantity",
          Tables(s, dir, "lineitem"),
          col("l_quantity").isNull || col("l_quantity") < 1 ||
            col("l_quantity") > 50))
        .unionByName(rule("nonneg_events_value",
          Tables(s, dir, "events"),
          col("value").isNull || col("value") < 0))
        .unionByName(rule("notnull_customer_name",
          Tables(s, dir, "customer"),
          col("c_name").isNull || length(col("c_name")) === 0))
        .orderBy(col("rule"))
    },

    // Freshness/completeness audit: for each event_type, compare the
    // days it actually has data against the full corpus day spine
    // (min..max over ALL types — derived in-plan, no calendar
    // constant), report missing partition-days and staleness versus
    // the corpus watermark. The spine is a one-row sequence() explode
    // (|days| rows) cross-joined with the distinct type dimension —
    // both dimension-sized; the fact table contributes only its
    // distinct (type, day) aggregate. The anti-join that finds holes
    // runs dimension × dimension, never against raw events.
    "q_dq_freshness" -> { (s, dir) =>
      val act = Tables(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
        .distinct()
      val bounds = act.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val spine = bounds
        .select(explode(expr("sequence(d0, d1)")).as("d"))
      val types = act.select(col("event_type")).distinct()
      val expected = types.crossJoin(spine)
      val missing = expected.join(act, Seq("event_type", "d"),
          "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_missing"))
      act.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days_present"),
          max(col("d")).as("last_day"))
        .join(missing, Seq("event_type"), "left")
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          (datediff(col("d1"), col("d0")) + 1).cast("long")
            .as("n_days_expected"),
          col("n_days_present"),
          coalesce(col("n_missing"), lit(0L)).as("n_days_missing"),
          col("last_day"),
          datediff(col("d1"), col("last_day")).cast("long")
            .as("staleness_days"))
        .orderBy(col("event_type"))
    },

    // Ingest row-count anomaly monitor — the operational DQ check
    // that catches a broken producer before any content check can:
    // daily row counts per event_type scored against the TRAILING
    // 7-day window (Σ exact in long; Σ² DECIMAL-widened — n² wraps
    // 64 bits once a daily count passes ~3e9), |z| > 3
    // flags. The window runs over the |types|×|days| daily
    // aggregate, never fact rows. Emits only scored days (≥3 prior
    // days of history) to keep the readout stable as the calendar
    // grows.
    "q_dq_rowcount_anomaly" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(-7, -1)
      val scored = daily
        .withColumn("k", count(col("n")).over(w))
        .withColumn("s1", sum(col("n")).over(w))
        // n² in DECIMAL, not long: a (type, day) count past ~3e9
        // would wrap n*n in 64-bit and clamp every variance to the
        // greatest(·, 1) floor — silent mass false-positives at the
        // 100 TB target (DuckDB sums in int128, and the streaming
        // twin squares in BigInt, so parity would break too). The
        // cast must precede the multiply — casting the Long product
        // wraps first.
        .withColumn("s2", sum({
          val n = col("n").cast("decimal(38,0)")
          n * n
        }).over(w))
        .where(col("k") >= 3)
      val mean = col("s1").cast("double") / col("k")
      val variance = col("s2").cast("double") / col("k") -
        mean * mean
      val z = (col("n") - mean) / sqrt(greatest(variance, lit(1.0)))
      scored.select(col("event_type"), col("d").cast("string")
            .as("day"),
          col("n").as("row_count"),
          round(mean, 4).as("trailing_mean"),
          round(z, 4).as("z_score"),
          (abs(z) > 3.0).as("anomaly"))
        .orderBy(col("event_type"), col("day"))
    },

    // Survivorship (golden-record merge) — the step AFTER entity
    // resolution: matched records collapse to one survivor per
    // cluster under explicit domain rules (format-valid name wins —
    // fewest non-alphanumeric characters — then lowest id). Cluster
    // ids propagate as min-over-neighbors (exact here: the ER match
    // graph is star-shaped orig↔variant); the survivor pick is one
    // per-cluster window over clusters whose size is bounded by the
    // blocking key. This is the MDM merge that turns match pairs
    // into a master table.
    "q_dedup_survivorship" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val keyed = erCorpus(s, dir)
        .withColumn("block", element_at(split(col("p_name"), " "), 1))
      val a = keyed.as("a")
      val b = keyed.as("b")
      val pairs = a.join(b, col("a.block") === col("b.block")
          && col("a.id") < col("b.id"))
        .where(levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      // one explode pass (r13): the two-leg union evaluated the
      // levenshtein blocking join TWICE — same rows, one scan
      val membership = pairs
        .select(explode(array(
          struct(col("id_a").as("node"), col("id_a").as("peer")),
          struct(col("id_b").as("node"), col("id_a").as("peer"))))
          .as("m"))
        .select(col("m.node").as("node"), col("m.peer").as("peer"))
        .groupBy(col("node")).agg(min(col("peer")).as("cluster"))
      val members = keyed.join(membership,
          col("id") === col("node"), "inner")
        .select(col("cluster"), col("id"), col("p_name"),
          length(regexp_replace(col("p_name"), "[a-z0-9 ]", ""))
            .as("n_bad_chars"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("n_bad_chars"), col("id"))
      members.withColumn("rn", row_number().over(w))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rn") === 1, col("p_name")))
            .as("survivor_name"),
          max(when(col("rn") === 1, col("id"))).as("survivor_id"),
          countDistinct(col("p_name")).as("n_name_variants"))
        .orderBy(col("cluster"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_profile_columns" -> {
      val per = profileCols.map { c =>
        s"""SELECT '$c' AS col_name,
              (SELECT count(*) FROM lineitem) AS n_rows,
              count(*) - count($c) AS n_nulls,
              count(DISTINCT $c) AS n_distinct,
              CAST(min($c) AS VARCHAR) AS min_val,
              CAST(max($c) AS VARCHAR) AS max_val
            FROM lineitem"""
      }.mkString("\n UNION ALL\n")
      s"SELECT * FROM (\n$per\n) ORDER BY col_name"
    },

    "q_anomaly_zscore" ->
      """WITH s AS (
           SELECT event_type, value,
             sum(CAST(value AS DECIMAL(18,6))) OVER w AS sm,
             sum(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) OVER w AS sq,
             count(value) OVER w AS c
           FROM events
           WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
         z AS (
           SELECT event_type,
             CASE WHEN c = 20
                   AND CAST(sq * c - sm * sm AS DOUBLE) / (c * c) > 0
                  THEN (value - CAST(sm AS DOUBLE) / c)
                       / sqrt(CAST(sq * c - sm * sm AS DOUBLE)
                              / (c * c))
             END AS z
           FROM s)
         SELECT event_type, count(*) AS n_events,
           count(z) AS n_scored,
           count(CASE WHEN abs(z) > 3 THEN 1 END) AS n_anomalies,
           round(max(abs(z)), 4) AS max_abs_z
         FROM z GROUP BY event_type ORDER BY event_type""",

    "q_entity_resolution" ->
      """WITH dict AS (
           SELECT p_name, min(p_partkey) AS id FROM part
           GROUP BY p_name),
         offs AS (
           SELECT (max(id) // 1000000 + 1) * 1000000 AS off FROM dict),
         allp AS (
           SELECT id, p_name FROM dict
           UNION ALL
           SELECT id + (SELECT off FROM offs) AS id,
                  substr(p_name, 1, length(p_name) - 1) || '#' AS p_name
           FROM dict),
         k AS (
           SELECT id, p_name,
                  string_split(p_name, ' ')[1] AS block
           FROM allp)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
         FROM k a JOIN k b
           ON a.block = b.block AND a.id < b.id
         WHERE levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY id_a, id_b""",

    // Mirrors the Spark plan exactly: same median-week split, same
    // decade bins, same add-one smoothing, ln quantized to
    // DECIMAL(18,6) before the (p−q) product, each term quantized
    // before the order-independent decimal sum.
    "q_drift_psi" ->
      """WITH e AS (
           SELECT event_type,
             epoch_us(ts) // 604800000000 AS wk,
             CAST(floor(value / 10) AS BIGINT) AS bin
           FROM events),
         cut AS (SELECT (min(wk) + max(wk) + 1) // 2 AS cutwk FROM e),
         counts AS (
           SELECT event_type, bin,
             sum(CASE WHEN wk < (SELECT cutwk FROM cut)
                      THEN 1 ELSE 0 END) AS c_ref,
             sum(CASE WHEN wk >= (SELECT cutwk FROM cut)
                      THEN 1 ELSE 0 END) AS c_cur
           FROM e GROUP BY event_type, bin),
         stats AS (
           SELECT event_type,
             CAST(sum(c_ref) AS BIGINT) AS n_ref,
             CAST(sum(c_cur) AS BIGINT) AS n_cur,
             count(*) AS n_bins
           FROM counts GROUP BY event_type),
         terms AS (
           SELECT c.event_type, s.n_ref, s.n_cur, s.n_bins,
             CAST(
               ((CAST(c.c_ref + 1 AS DOUBLE)
                   / CAST(s.n_ref + s.n_bins AS DOUBLE)
                 - CAST(c.c_cur + 1 AS DOUBLE)
                   / CAST(s.n_cur + s.n_bins AS DOUBLE))
                * CAST(CAST(ln(
                    (CAST(c.c_ref + 1 AS DOUBLE)
                       / CAST(s.n_ref + s.n_bins AS DOUBLE))
                    / (CAST(c.c_cur + 1 AS DOUBLE)
                       / CAST(s.n_cur + s.n_bins AS DOUBLE)))
                  AS DECIMAL(18,6)) AS DOUBLE))
               AS DECIMAL(18,6)) AS term
           FROM counts c JOIN stats s USING (event_type))
         SELECT event_type, n_bins, n_ref, n_cur,
           round(CAST(sum(term) AS DOUBLE), 6) AS psi
         FROM terms
         GROUP BY event_type, n_ref, n_cur, n_bins
         ORDER BY event_type""",

    "q_cdc_apply" ->
      """WITH chg AS (
           SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
           FROM events),
         r AS (
           SELECT *,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_changes
           FROM chg)
         SELECT user_id, op AS last_op, round(value, 4) AS last_value,
           epoch_us(ts) // 1000 AS last_ts_ms, n_changes
         FROM r WHERE rn = 1 AND op <> 'D'
         ORDER BY user_id""",

    "q_k_anonymity" ->
      """WITH g AS (
           SELECT event_type,
             CAST(floor(value / 10) AS BIGINT) AS value_bucket,
             epoch_us(ts) // 604800000000 AS wk,
             count(*) AS gsize
           FROM events GROUP BY 1, 2, 3)
         SELECT event_type, count(*) AS n_groups,
           CAST(sum(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END)
             AS BIGINT) AS n_rows_at_risk,
           round(CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END)
               AS DOUBLE) / sum(gsize), 4) AS risk_frac
         FROM g GROUP BY event_type ORDER BY event_type""",

    "q_changepoint_cusum" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(18,6))) AS dsum,
             count(*) AS n
           FROM events GROUP BY 1, 2),
         totals AS (
           SELECT event_type, sum(dsum) AS total,
             count(*) AS n_days
           FROM daily GROUP BY event_type),
         c AS (
           SELECT d.event_type, d.day, t.n_days,
             CAST(sum(d.dsum * t.n_days - t.total) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,6)) AS cusum
           FROM daily d JOIN totals t USING (event_type)),
         r AS (
           SELECT event_type, day, n_days, cusum,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day) AS rk
           FROM c)
         SELECT event_type, day AS changepoint_day, n_days,
           round(abs(cusum)::DOUBLE, 6) AS max_abs_cusum
         FROM r WHERE rk = 1 ORDER BY event_type""",

    "q_l_diversity" ->
      """WITH g AS (
           SELECT event_type,
             CAST(floor(value / 10) AS BIGINT) AS value_bucket,
             epoch_us(ts) // 604800000000 AS wk,
             count(*) AS gsize,
             count(DISTINCT user_id) AS n_sensitive
           FROM events GROUP BY 1, 2, 3)
         SELECT event_type, count(*) AS n_groups,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_low_diversity,
           CAST(sum(CASE WHEN n_sensitive < 3 THEN gsize ELSE 0 END)
             AS BIGINT) AS n_rows_at_risk,
           round(CAST(min(n_sensitive) AS DOUBLE), 1) AS min_diversity
         FROM g GROUP BY event_type ORDER BY event_type""",

    "q_dq_expectations" ->
      """SELECT * FROM (
           SELECT 'fk_orders_customer' AS rule,
             count(*) AS n_checked,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violations,
             sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
               AS passed
           FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey
           UNION ALL
           SELECT 'range_lineitem_quantity', count(*),
             CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
             sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
           FROM lineitem
           UNION ALL
           SELECT 'nonneg_events_value', count(*),
             CAST(sum(CASE WHEN value IS NULL OR value < 0
                 THEN 1 ELSE 0 END) AS BIGINT),
             sum(CASE WHEN value IS NULL OR value < 0
                 THEN 1 ELSE 0 END) = 0
           FROM events
           UNION ALL
           SELECT 'notnull_customer_name', count(*),
             CAST(sum(CASE WHEN c_name IS NULL OR length(c_name) = 0
                 THEN 1 ELSE 0 END) AS BIGINT),
             sum(CASE WHEN c_name IS NULL OR length(c_name) = 0
                 THEN 1 ELSE 0 END) = 0
           FROM customer)
         ORDER BY rule""",

    "q_er_phonetic_block" ->
      """WITH dict AS (
           SELECT p_name, min(p_partkey) AS id FROM part
           GROUP BY p_name),
         off AS (
           SELECT CAST((floor(max(id) / 1000000) + 1) * 1000000
             AS BIGINT) AS off
           FROM dict),
         keyed AS (
           SELECT id, p_name FROM dict
           UNION ALL
           SELECT d.id + o.off AS id,
             substring(p_name, 1, length(p_name) - 1) || '#' AS p_name
           FROM dict d, off o),
         kb AS (
           SELECT id, p_name,
             substring(regexp_replace(lower(p_name), '[aeiou ]', '',
               'g'), 1, 6) AS block
           FROM keyed),
         pairs AS (
           SELECT a.block, levenshtein(a.p_name, b.p_name) AS dist
           FROM kb a JOIN kb b
             ON a.block = b.block AND a.id < b.id),
         bs AS (
           SELECT count(*) AS n_blocks, max(bn) AS max_block FROM (
             SELECT block, count(*) AS bn FROM kb GROUP BY block)),
         ps AS (
           SELECT count(*) AS n_candidate_pairs,
             CAST(sum(CASE WHEN dist <= 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_matches
           FROM pairs),
         nn AS (SELECT count(*) AS n_names FROM kb)
         SELECT n_names, n_blocks, max_block, n_candidate_pairs,
           n_matches,
           round(n_matches / n_candidate_pairs, 4) AS verify_yield
         FROM nn, bs, ps""",

    "q_dq_freshness" ->
      """WITH act AS (
           SELECT DISTINCT event_type, CAST(ts AS DATE) AS d
           FROM events),
         bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM act),
         spine AS (
           SELECT CAST(unnest(generate_series(d0, d1,
             INTERVAL 1 DAY)) AS DATE) AS d
           FROM bounds),
         types AS (SELECT DISTINCT event_type FROM act),
         missing AS (
           SELECT e.event_type, count(*) AS n_missing
           FROM (SELECT event_type, d FROM types, spine) e
           LEFT JOIN act ON e.event_type = act.event_type
             AND e.d = act.d
           WHERE act.event_type IS NULL
           GROUP BY 1),
         pres AS (
           SELECT event_type, count(*) AS n_days_present,
             max(d) AS last_day
           FROM act GROUP BY 1)
         SELECT p.event_type,
           CAST(datediff('day', b.d0, b.d1) + 1 AS BIGINT)
             AS n_days_expected,
           p.n_days_present,
           CAST(coalesce(m.n_missing, 0) AS BIGINT) AS n_days_missing,
           p.last_day,
           CAST(datediff('day', p.last_day, b.d1) AS BIGINT)
             AS staleness_days
         FROM pres p LEFT JOIN missing m
           ON p.event_type = m.event_type, bounds b
         ORDER BY p.event_type""",

    "q_dq_rowcount_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT event_type, d, n,
             count(n) OVER w AS k,
             sum(n) OVER w AS s1,
             sum(n * n) OVER w AS s2
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         f AS (SELECT * FROM scored WHERE k >= 3)
         SELECT event_type, CAST(d AS VARCHAR) AS day,
           n AS row_count,
           round(s1::DOUBLE / k, 4) AS trailing_mean,
           round((n - s1::DOUBLE / k)
             / sqrt(greatest(s2::DOUBLE / k
               - (s1::DOUBLE / k) * (s1::DOUBLE / k), 1.0)), 4)
             AS z_score,
           abs((n - s1::DOUBLE / k)
             / sqrt(greatest(s2::DOUBLE / k
               - (s1::DOUBLE / k) * (s1::DOUBLE / k), 1.0))) > 3.0
             AS anomaly
         FROM f ORDER BY event_type, day""",

    "q_dedup_survivorship" ->
      """WITH dict AS (
           SELECT p_name, min(p_partkey) AS id FROM part GROUP BY 1),
         off AS (
           SELECT CAST((floor(max(id) / 1000000) + 1) * 1000000
             AS BIGINT) AS off
           FROM dict),
         corpus AS (
           SELECT id, p_name FROM dict
           UNION ALL
           SELECT d.id + o.off AS id,
             substr(d.p_name, 1, length(d.p_name) - 1) || '#'
               AS p_name
           FROM dict d, off o),
         keyed AS (
           SELECT id, p_name, string_split(p_name, ' ')[1] AS block
           FROM corpus),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b
           FROM keyed a JOIN keyed b
             ON a.block = b.block AND a.id < b.id
           WHERE levenshtein(a.p_name, b.p_name) <= 2),
         membership AS (
           SELECT node, min(peer) AS cluster FROM (
             SELECT id_a AS node, id_a AS peer FROM pairs
             UNION ALL
             SELECT id_b AS node, id_a AS peer FROM pairs)
           GROUP BY 1),
         members AS (
           SELECT m.cluster, k.id, k.p_name,
             length(regexp_replace(k.p_name, '[a-z0-9 ]', '', 'g'))
               AS n_bad_chars
           FROM keyed k JOIN membership m ON k.id = m.node),
         rk AS (
           SELECT cluster, id, p_name, n_bad_chars,
             row_number() OVER (PARTITION BY cluster
               ORDER BY n_bad_chars, id) AS rn
           FROM members)
         SELECT cluster,
           count(*) AS n_members,
           max(CASE WHEN rn = 1 THEN p_name END) AS survivor_name,
           max(CASE WHEN rn = 1 THEN id END) AS survivor_id,
           count(DISTINCT p_name) AS n_name_variants
         FROM rk GROUP BY cluster ORDER BY cluster""",
  )
}
