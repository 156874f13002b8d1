package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query corpus over the TPC-H-ish star schema — SURVEY.md
  * §2b rows: scans, projection, filters, all join types, aggregations
  * (incl. distinct / rollup / cube / grouping sets / stats), window
  * functions, sort/limit/top-k, set ops, tumbling windows, JSON.
  *
  * Determinism contract (SURVEY.md §5.3): every query is totally
  * ordered; money sums are computed in exact DECIMAL then emitted as
  * DOUBLE (bit-identical across engines since the decimal sum is
  * exact and the final decimal→double conversion is correctly
  * rounded); order-sensitive double aggregates are round()ed; sort
  * keys are never nullable (Spark sorts NULLS FIRST asc, DuckDB NULLS
  * LAST — we sidestep rather than annotate).
  *
  * Scale notes are inline per query; the global ones: dimension
  * tables are broadcast (no shuffle of the fact side), aggregates are
  * hash aggregates with map-side partial aggregation, top-k is
  * TakeOrderedAndProject (no global sort), and every filter/projection
  * reaches the parquet scan (PushedFilters / ReadSchema — asserted in
  * PlanSpec).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact money arithmetic: cast operand to decimal before summing. */
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Emit an exact decimal aggregate as a stable double: a plain
    * cast, NO rounding. The decimal value is bit-identical across
    * engines (exact decimal partials), and Spark's decimal→double
    * cast is correctly rounded, so the output is deterministic at
    * any SF. Rounding is what BREAKS at scale: once the sum's
    * magnitude makes ulp(x) ≳ 10^-scale, the engines' round()
    * implementations diverge in the last ulp (sf1 soak: q1
    * sum_charge at 2.8e10, round(…,6) — Spark …71 vs DuckDB …712).
    * Oracle-side note: DuckDB's own decimal→double cast
    * DOUBLE-ROUNDS (int128→double, then /10^scale) once the
    * unscaled value passes 2^53, so the paired oracles route the
    * conversion through VARCHAR (exact digits → correctly-rounded
    * strtod), which reproduces Spark's single rounding exactly. */
  private def asDouble(c: Column): Column =
    c.cast("double")

  private def tsLit(s: String): Column = lit(s).cast("timestamp")

  /** Statements BOTH engines run verbatim: the Spark def calls
    * `s.sql(sameTextSql(name))` and the oracle map points at the
    * same entry, so "the oracle runs the IDENTICAL statement" is
    * structural rather than kept in sync by discipline. Only
    * queries whose text is valid on Spark AND DuckDB 1.0 belong
    * here (q_sql_pivot / q_sql_unpivot / q_select_rename use
    * engine-specific sugar and keep hand-written oracles).
    */
  private val sameTextSql: Map[String, String] = Map(

    "q_sql_correlated" ->
      """        SELECT c_custkey, c_name,
          (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_totalprice > 200000) AS n_big
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        ORDER BY c_custkey""",

    "q_sql_recursive" ->
      """        WITH RECURSIVE ordered AS (
          SELECT n_regionkey, n_nationkey,
            lead(n_nationkey) OVER (PARTITION BY n_regionkey
              ORDER BY n_nationkey) AS next_key,
            row_number() OVER (PARTITION BY n_regionkey
              ORDER BY n_nationkey) AS rn
          FROM nation),
        chain AS (
          SELECT n_regionkey, n_nationkey, next_key, 0 AS depth
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.n_regionkey, o.n_nationkey, o.next_key, c.depth + 1
          FROM chain c JOIN ordered o
            ON o.n_regionkey = c.n_regionkey
           AND o.n_nationkey = c.next_key)
        SELECT n_regionkey AS region_key, n_nationkey AS nation_key,
          depth
        FROM chain ORDER BY region_key, depth""",

    "q_sql_lateral" ->
      """        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""",

    "q_sql_window" ->
      """        SELECT * FROM (
          SELECT event_type, event_id,
            CAST(rank() OVER w AS BIGINT) AS rnk,
            lag(event_id) OVER w AS prev_id,
            count(*) OVER (PARTITION BY event_type) AS n_type
          FROM events
          WINDOW w AS (PARTITION BY event_type
                       ORDER BY value DESC, event_id))
        WHERE rnk <= 5
        ORDER BY event_type, rnk""",

    "q_grouping_sets" ->
      """        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls""",

    "q_sql_group_by_all" ->
      """        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
          round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2)
            AS sum_qty
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL""",

    "q_select_exclude" ->
      """        SELECT * EXCLUDE (o_totalprice, o_orderdate) FROM orders
        ORDER BY o_orderkey LIMIT 50""",

    "q_select_replace" ->
      """        SELECT * REPLACE (o_totalprice * 2 AS o_totalprice,
                          upper(o_orderstatus) AS o_orderstatus)
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",

    "q_distinct_on" ->
      """        SELECT DISTINCT ON (user_id) user_id, event_id, value
        FROM events
        ORDER BY user_id, value DESC, event_id""",

    "q_window_qualify" ->
      """        SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey) <= 3
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""")

  /** Shared def body for every [[sameTextSql]] query. */
  private def sameText(name: String)
      : (SparkSession, String) => DataFrame = { (s, dir) =>
    Tables.registerViews(s, dir)
    s.sql(sameTextSql(name))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 2-D skyline (Pareto frontier): parts no other part dominates
    // (cheaper-or-equal AND bigger-or-equal, strict in one). The
    // sort-based formulation: a part survives iff its size beats
    // the best size among ALL strictly-cheaper price points (M1,
    // a cumulative max over the per-price aggregate — one row per
    // DISTINCT price, so the serial window is bounded by the price
    // domain, not the row count) and no same-price part is strictly
    // bigger (M2, a per-price max). The DuckDB oracle uses the
    // textbook NOT EXISTS anti-join — a deliberately different
    // formulation proving the same frontier, like the funnel pair.
    "q_skyline" -> { (s, dir) =>
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val perPrice = p.groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("m2"))
      val m1 = perPrice.withColumn("m1",
        max(col("m2")).over(Window.orderBy(col("p_retailprice"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      p.join(m1, Seq("p_retailprice"))
        .where((col("m1").isNull || col("p_size") > col("m1")) &&
          col("p_size") === col("m2"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
    },

    // ---- scans / projection / filter pushdown --------------------
    // Per-row double arithmetic is IEEE-identical across engines, so
    // `revenue` needs no rounding. Filter + 4-column projection both
    // reach the parquet scan.
    "q_scan_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
                col("l_shipdate") < tsLit("1997-01-01"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        // (l_orderkey, l_linenumber) is NOT unique in this testdata
        // (118k duplicate pairs at sf0.1) — revenue completes the
        // total order so row order is engine-independent at any SF
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))
    },

    // ---- SQL front-end + correlated subqueries -------------------
    // The same engine through spark.sql(): EXISTS / NOT EXISTS and a
    // correlated scalar count — Catalyst decorrelates all three into
    // semi/anti/aggregate joins (asserted in PlanSpec; a naive
    // per-row subquery re-execution would be O(n·m) at scale). All
    // predicates are exact (literal-vs-stored compare, string
    // equality, integer count), so the identical SQL is its own
    // DuckDB oracle.
    "q_sql_correlated" -> sameText("q_sql_correlated"),

    // Recursive CTE (Spark 4 WITH RECURSIVE): linked-list walk over
    // per-region nation chains built with lead(). The recursion
    // engine (UnionLoop) re-executes only the recursive leg per
    // round, like the hand-rolled connected-components loop in
    // Dedup — this is the declarative form. Identical SQL is its own
    // DuckDB oracle (integer-only: no float drift across rounds).
    "q_sql_recursive" -> sameText("q_sql_recursive"),

    // Correlated LATERAL join (top-2-per-key as the inner table):
    // Spark decorrelates the per-row subquery into a ranked join —
    // PlanSpec-style proof that it never degenerates to per-row
    // re-execution is the absent CartesianProduct in the plan.
    "q_sql_lateral" -> sameText("q_sql_lateral"),

    // Named WINDOW clause (SQL surface): one window definition
    // shared by several functions, exactly the text DuckDB runs.
    // Both rank functions share the same WindowSpec, so Catalyst
    // plans ONE Window node over one exchange — the named-window
    // sugar is also the plan-dedup hint.
    "q_sql_window" -> sameText("q_sql_window"),

    // Unpivot (pivot's inverse): wide metric columns to long
    // (metric, v) rows — a per-row flatMap, narrow and codegen'd.
    "q_unpivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= tsLit("1997-01-01") &&
          col("l_shipdate") < tsLit("1997-02-01"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("qty"),
          col("l_extendedprice").cast("double").as("price"),
          col("l_discount").cast("double").as("disc"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("disc")), "metric", "v")
        // key pairs duplicate in this testdata — v completes the
        // total order (identical full rows are interchangeable)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"),
          col("v"))
    },

    // Exact multi-point percentiles: one percentile() aggregate
    // evaluates the whole quantile vector per group (single pass,
    // one shuffle); verified bit-identical to DuckDB quantile_cont
    // (same linear-interpolation formula over the same doubles).
    "q_agg_percentiles" -> { (s, dir) =>
      val ps = array(lit(0.25), lit(0.5), lit(0.75), lit(0.9), lit(0.99))
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(percentile(col("value"), ps).as("p"))
        .select(col("event_type"),
          round(element_at(col("p"), 1), 6).as("p25"),
          round(element_at(col("p"), 2), 6).as("p50"),
          round(element_at(col("p"), 3), 6).as("p75"),
          round(element_at(col("p"), 4), 6).as("p90"),
          round(element_at(col("p"), 5), 6).as("p99"))
        .orderBy(col("event_type"))
    },

    // ---- TPC-H Q1: wide hash aggregate -----------------------------
    // One shuffle; partial agg reduces the exchange to |groups| rows
    // per map partition (4 groups here — negligible shuffle at any SF).
    "q1_pricing_summary" -> { (s, dir) =>
      val disc = (lit(1.0) - col("l_discount")).cast("decimal(12,2)")
      val tax  = (lit(1.0) + col("l_tax")).cast("decimal(12,2)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= tsLit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDouble(sum(dec2(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec2(col("l_extendedprice")) * disc)).as("sum_disc_price"),
          asDouble(sum(dec2(col("l_extendedprice")) * disc * tax)).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- TPC-H Q3: fact-fact join + broadcast dim + top-k ---------
    // customer is filtered then broadcast (no shuffle of lineitem for
    // that join); lineitem⋈orders is the one real shuffle. Top-10 via
    // sort+limit collapses to TakeOrderedAndProject.
    "q3_shipping_priority" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < tsLit("1997-01-01"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > tsLit("1997-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderpriority"))
        .agg(asDouble(sum(dec2(col("l_extendedprice")) *
          (lit(1.0) - col("l_discount")).cast("decimal(12,2)")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q5-ish: 6-way star join ----------------------------
    // region/nation/supplier are broadcast; the only shuffles are
    // lineitem⋈orders and the final 25-group aggregate. At 100 TB the
    // same plan holds: dims stay broadcastable, facts co-shuffle once.
    "q5_nation_revenue" -> { (s, dir) =>
      val region = t(s, dir, "region")
      val nation = t(s, dir, "nation")
      val supp = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
                col("o_orderdate") < tsLit("1997-01-01"))
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(asDouble(sum(dec2(col("l_extendedprice")) *
          (lit(1.0) - col("l_discount")).cast("decimal(12,2)")))
          .as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // ---- join types ----------------------------------------------
    "q_join_left" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      part.join(li, col("p_partkey") === col("l_partkey"), "left")
        .groupBy(col("p_brand"))
        .agg(count(col("l_orderkey")).as("n_big_lines"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("p_brand"))
    },

    "q_join_full" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
      val a = ord.filter(col("o_orderdate") < tsLit("1998-01-01"))
        .groupBy(col("o_custkey").as("cust_a"))
        .agg(asDouble(sum(dec2(col("o_totalprice")))).as("early_total"))
      val b = ord.filter(col("o_orderdate") >= tsLit("1998-01-01"))
        .groupBy(col("o_custkey").as("cust_b"))
        .agg(asDouble(sum(dec2(col("o_totalprice")))).as("late_total"))
      a.join(b, col("cust_a") === col("cust_b"), "full")
        .select(coalesce(col("cust_a"), col("cust_b")).as("o_custkey"),
          coalesce(col("early_total"), lit(0.0)).as("early_total"),
          coalesce(col("late_total"), lit(0.0)).as("late_total"))
        .orderBy(col("o_custkey"))
    },

    // left_semi == EXISTS: no payload from the build side crosses the
    // join, and each probe row emits at most once.
    "q_join_semi" -> { (s, dir) =>
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    "q_join_anti" -> { (s, dir) =>
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 350000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    },

    // cross join is only ever sane when one side is tiny — both sides
    // here are ≤25 rows; Spark picks BroadcastNestedLoopJoin.
    "q_join_cross" -> { (s, dir) =>
      val prio = t(s, dir, "orders").select(col("o_orderpriority")).distinct()
      t(s, dir, "region").crossJoin(prio)
        .select(concat(col("r_name"), lit("-"), col("o_orderpriority"))
          .as("label"))
        .orderBy(col("label"))
    },

    // ---- aggregation variants ------------------------------------
    "q_agg_distinct" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"),
          asDouble(sum(dec2(col("c_acctbal")))).as("acctbal_total"))
        .orderBy(col("c_mktsegment"))
    },

    // NULL-semantics parity — the classic engine-divergence trap,
    // pinned by oracle: count(*) vs count(col) vs count(DISTINCT col)
    // over nulls, null-ignoring avg, null-safe equality (<=> /
    // IS NOT DISTINCT FROM) as a join condition, nullif/coalesce.
    // 'view' events get a nulled value to create the nulls.
    "q_null_semantics" -> { (s, dir) =>
      val e = t(s, dir, "events").select(col("user_id"),
        col("event_type"),
        when(col("event_type") === "view", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      val buckets = e.select(col("user_id"),
        nullif(floor(col("v") / 200).cast("long"), lit(0L)).as("vb"))
      val dim = e.sparkSession.range(-1, 3)
        .select(nullif(col("id"), lit(0L)).as("vb"),
          concat(lit("b"), col("id").cast("string")).as("bucket_name"))
      buckets.join(dim, buckets("vb") <=> dim("vb"))
        .groupBy(col("bucket_name"))
        .agg(count(lit(1)).as("n_rows"),
          count(buckets("vb")).as("n_nonnull"),
          countDistinct(buckets("vb")).as("n_distinct"),
          count(lit(1)).minus(count(buckets("vb"))).as("n_null"))
        .orderBy(col("bucket_name"))
    },

    "q_agg_rollup" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          asDouble(sum(dec2(col("o_totalprice")))).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total"))
        .orderBy(col("status"), col("priority"))
    },

    "q_agg_cube" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          asDouble(sum(dec2(col("l_quantity")))).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n_lines"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    },

    "q_agg_stats" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          round(avg(col("value")), 4).as("avg_v"),
          round(stddev_samp(col("value")), 4).as("std_v"),
          round(percentile(col("value"), lit(0.5)), 4).as("median_v"))
        .orderBy(col("event_type"))
    },

    // Bivariate / dispersion statistics (variance, population
    // stddev, correlation, covariance) from EXACT decimal sufficient
    // statistics (n, Σx, Σy, Σx², Σy², Σxy), not the built-in
    // streaming moment aggregates. Two reasons, both scale-bound:
    // (1) the built-ins accumulate doubles in partition-merge order,
    // so on a real cluster (or under AQE) they are not even
    // run-to-run reproducible, and the sf1 soak measured 3e-4 drift
    // vs DuckDB once user_id magnitudes hit 1e9; (2) decimal
    // partials are exact and merge associatively, so the map-side
    // partial aggregation is lossless at any parallelism. The
    // moments are then a FIXED double expression over bit-identical
    // inputs — deterministic on both engines by IEEE semantics.
    // Oracle mirrors the identical expression tree.
    "q_agg_stats_bivariate" -> { (s, dir) =>
      val x = col("value").cast("decimal(18,6)")
      val y = col("user_id").cast("decimal(18,0)")
      val g = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("nd"),
          sum(x).cast("decimal(38,6)").cast("double").as("sx"),
          sum(y).cast("decimal(38,0)").cast("double").as("sy"),
          sum((x * x).cast("decimal(38,12)")).cast("decimal(38,12)")
            .cast("double").as("sxx"),
          sum((y * y).cast("decimal(38,0)")).cast("decimal(38,0)")
            .cast("double").as("syy"),
          sum((x * y).cast("decimal(38,6)")).cast("decimal(38,6)")
            .cast("double").as("sxy"))
      val nd = col("nd")
      val mxx = col("sxx") - col("sx") * col("sx") / nd
      val myy = col("syy") - col("sy") * col("sy") / nd
      val mxy = col("sxy") - col("sx") * col("sy") / nd
      // Guard the sqrt inputs: for a (near-)constant group mxx can
      // round to a tiny negative in doubles; DuckDB's sqrt raises an
      // Out of Range error where Spark returns NaN, so the oracle
      // would crash instead of mismatching. Clamp/NULL identically on
      // both engines (oracle SQL mirrors these exact guards).
      g.select(col("event_type"),
          round(mxx / (nd - lit(1.0)), 4).as("var_s"),
          round(mxx / nd, 4).as("var_p"),
          round(sqrt(greatest(mxx, lit(0.0)) / nd), 4).as("std_p"),
          round(when(mxx <= 0 || myy <= 0, lit(null))
            .otherwise(mxy / sqrt(mxx * myy)), 6).as("corr_vu"),
          round(mxy / (nd - lit(1.0)), 4).as("covar_s"),
          round(mxy / nd, 4).as("covar_p"))
        .orderBy(col("event_type"))
    },

    // GROUPING SETS via the SQL front-end (temp views registered per
    // call) — same Catalyst plan as rollup/cube (Expand + hash agg).
    "q_grouping_sets" -> sameText("q_grouping_sets"),

    // GROUP BY ALL / ORDER BY ALL — the analyst shorthand both
    // engines now speak natively (no parser sugar needed; Spark
    // added both in 3.4/4.0). Same statement text on both engines.
    "q_sql_group_by_all" -> sameText("q_sql_group_by_all"),

    // SQL PIVOT — Spark's native relational pivot clause (one
    // conditional-aggregate pass under the hood, same plan class as
    // the DataFrame q_pivot). The oracle states the equivalent
    // conditional aggregation: DuckDB's own PIVOT syntax differs,
    // and the CASE form is the engine-neutral ground truth anyway.
    "q_sql_pivot" -> { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT l_returnflag,
          round(CAST(qty_open AS DOUBLE), 6) AS qty_open,
          round(CAST(qty_filled AS DOUBLE), 6) AS qty_filled
        FROM (
          SELECT * FROM (
            SELECT l_returnflag, l_linestatus,
              CAST(l_quantity AS DECIMAL(18,6)) AS qty
            FROM lineitem)
          PIVOT (CAST(sum(qty) AS DECIMAL(18,6))
                 FOR l_linestatus IN ('O' AS qty_open, 'F' AS qty_filled)))
        ORDER BY l_returnflag""")
    },

    // SQL UNPIVOT — the inverse clause (Spark 3.4+ native): a wide
    // per-flag metrics row unfolds into (metric, val) pairs. The
    // oracle is the engine-neutral UNION ALL expansion (DuckDB's
    // UNPIVOT sugar differs syntactically). All three metrics are
    // rounded doubles so one value column types cleanly.
    "q_sql_unpivot" -> { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT l_returnflag, metric, val FROM (
          SELECT l_returnflag,
            CAST(count(*) AS DOUBLE) AS n_rows,
            round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
              AS DOUBLE), 2) AS qty,
            round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
              AS DOUBLE), 2) AS revenue
          FROM lineitem GROUP BY l_returnflag)
        UNPIVOT (val FOR metric IN (n_rows, qty, revenue))
        ORDER BY l_returnflag, metric""")
    },

    // QUALIFY (injectParser sugar, graft.plans.QualifySyntax): the
    // post-window filter Spark SQL lacks; rewritten at parse time
    // into a wrapped subquery + filter + star-EXCEPT. The oracle runs
    // the IDENTICAL statement — DuckDB's native QUALIFY and the
    // injected rewrite must agree row-for-row.
    "q_window_qualify" -> sameText("q_window_qualify"),

    // DISTINCT ON (parser sugar chain: DistinctOnSyntax lowers to a
    // QUALIFY, QualifySyntax lowers that to the wrapped filter) —
    // the latest/best-per-key grammar. Highest-value event per user,
    // deterministically tie-broken; the oracle runs the identical
    // statement through DuckDB's native DISTINCT ON.
    "q_distinct_on" -> sameText("q_distinct_on"),

    // star-EXCLUDE (DuckDB spelling, mapped to Spark's * EXCEPT by
    // ExcludeSyntax): same statement on both engines.
    "q_select_exclude" -> sameText("q_select_exclude"),

    // star-REPLACE (DuckDB grammar, absent from Spark — parser
    // marker + in-place resolution swap, graft.plans
    // .StarReplaceSyntax): same statement on both engines, and the
    // replaced columns keep their original star position. The ORDER
    // BY deliberately references a replaced column — both engines
    // must order by the REPLACED value.
    "q_select_replace" -> sameText("q_select_replace"),

    // `SELECT * RENAME` — the third star modifier (DuckDB 1.3+/
    // Snowflake grammar; EXCLUDE and REPLACE above): rename keeps
    // the value and POSITION, and the ORDER BY deliberately uses the
    // new name to prove it resolves. DuckDB 1.0 lacks the grammar,
    // so this oracle is the hand-expanded equivalent rather than the
    // same text.
    "q_select_rename" -> { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT * RENAME (o_totalprice AS price, o_orderstatus AS status)
        FROM orders
        ORDER BY price DESC, o_orderkey LIMIT 50""")
    },

    // ---- window functions ----------------------------------------
    // Distribution window functions — percent_rank / cume_dist /
    // ntile complete the ranking-function surface. Ties resolve
    // identically in both engines (percent_rank/cume_dist are
    // tie-aware by definition; ntile follows the deterministic
    // (value, orderkey) total order, larger leading buckets).
    "q_window_dist" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // Modal decade-bin per event_type — explicit two-level aggregate
    // with a pinned (count desc, bin asc) tie-break instead of the
    // engines' mode() builtins, whose tie policies differ.
    "q_agg_mode" -> { (s, dir) =>
      val binned = t(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cnt").desc, col("bin"))
      binned.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_type"), col("bin").as("modal_bin"),
          col("cnt").as("n_modal"))
        .orderBy(col("event_type"))
    },

    "q_window_rank" -> { (s, dir) =>
      val bucket = floor(col("o_totalprice") / 50000).cast("long")
      val ord = t(s, dir, "orders").withColumn("bucket", bucket)
      val wTies = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("bucket").desc)
      val wUnique = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("bucket").desc, col("o_orderkey"))
      ord.select(col("o_orderstatus"), col("bucket"), col("o_orderkey"),
          row_number().over(wUnique).as("rn"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"))
        .filter(col("rn") <= 20)
        .orderBy(col("o_orderstatus"), col("rn"))
    },

    "q_window_lag" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          (col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)))
            .as("delta"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Running/moving aggregates: engines associate the frame sums
    // differently (Spark recompute vs DuckDB segment tree) → round(4).
    "q_window_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 4).as("running"),
          round(avg(col("value")).over(
            w.rowsBetween(-2, 0)), 4).as("mov_avg3"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // RANGE frame over event time: all events of the same user within
    // the trailing 10 minutes (value-based frame, not row-based).
    "q_window_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-600000000L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_10min"),
          round(sum(col("value")).over(w), 4).as("sum_10min"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Analytic window functions: first/last/nth value, ntile,
    // percent_rank, cume_dist.
    "q_window_analytics" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          first(col("o_orderkey")).over(wFull).as("cheapest_key"),
          last(col("o_orderkey")).over(wFull).as("dearest_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .filter(col("o_orderkey") % 25 === 0)
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // ---- top-k ----------------------------------------------------
    "q_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // Global top-k: orderBy+limit fuses into TakeOrderedAndProject —
    // each partition keeps 20 rows, driver merges; no full sort.
    "q_sort_limit" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(20)
    },

    // ---- set ops --------------------------------------------------
    "q_set_union" -> { (s, dir) =>
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"))
      c.unionByName(sp)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("nationkey"))
    },

    "q_set_intersect" -> { (s, dir) =>
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      c.intersect(sp).orderBy(col("nationkey"))
    },

    "q_set_except" -> { (s, dir) =>
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier")
        .filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nationkey"))
      c.except(sp).orderBy(col("nationkey"))
    },

    // ---- event-time tumbling window (batch analogue) -------------
    // `window()` here is the batch form of the streaming tumbling
    // window; aligned to epoch so it equals date_trunc('day').
    "q_window_tumbling" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value")), 4).as("total"))
        .select(col("window.start").cast("date").as("day"),
          col("event_type"), col("cnt"), col("total"))
        .orderBy(col("day"), col("event_type"))
    },

    // ---- JSON -----------------------------------------------------
    "q_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total"))
        .orderBy(col("k"))
    },
  )

  val oracles: Map[String, String] = Map(
    // textbook anti-join skyline — independent formulation of the
    // engine's sort-based frontier
    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
         FROM part p
         WHERE NOT EXISTS (
           SELECT 1 FROM part q
           WHERE q.p_retailprice <= p.p_retailprice
             AND q.p_size >= p.p_size
             AND (q.p_retailprice < p.p_retailprice
                  OR q.p_size > p.p_size))
         ORDER BY p.p_retailprice, p.p_partkey""",

    "q_null_semantics" ->
      """WITH e AS (
           SELECT user_id,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
           FROM events),
         b AS (
           SELECT user_id,
             nullif(CAST(floor(v / 200) AS BIGINT), 0) AS vb FROM e),
         dim AS (
           SELECT nullif(id, 0) AS vb,
             'b' || CAST(id AS VARCHAR) AS bucket_name
           FROM range(-1, 3) t(id))
         SELECT bucket_name, count(*) AS n_rows,
           count(b.vb) AS n_nonnull,
           count(DISTINCT b.vb) AS n_distinct,
           count(*) - count(b.vb) AS n_null
         FROM b JOIN dim ON b.vb IS NOT DISTINCT FROM dim.vb
         GROUP BY bucket_name ORDER BY bucket_name""",

    "q_sql_correlated" -> sameTextSql("q_sql_correlated"),

    "q_sql_recursive" -> sameTextSql("q_sql_recursive"),

    "q_sql_lateral" -> sameTextSql("q_sql_lateral"),

    "q_sql_window" -> sameTextSql("q_sql_window"),

    "q_unpivot" ->
      """WITH b AS (
           SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS qty,
             CAST(l_extendedprice AS DOUBLE) AS price,
             CAST(l_discount AS DOUBLE) AS disc
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1997-02-01')
         SELECT l_orderkey, l_linenumber, 'qty' AS metric, qty AS v FROM b
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'price', price FROM b
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'disc', disc FROM b
         ORDER BY l_orderkey, l_linenumber, metric, v""",

    "q_agg_percentiles" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS p25,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.75), 6) AS p75,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         ORDER BY l_orderkey, l_linenumber, revenue""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         o_orderpriority,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, order_date, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",

    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",

    "q_join_left" ->
      """SELECT p_brand, count(l_orderkey) AS n_big_lines,
         count(*) AS n_rows
         FROM part LEFT JOIN (
           SELECT * FROM lineitem WHERE l_quantity > 45
         ) ON p_partkey = l_partkey
         GROUP BY p_brand ORDER BY p_brand""",

    "q_join_full" ->
      """WITH a AS (
           SELECT o_custkey AS cust_a,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS early_total
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY o_custkey
         ), b AS (
           SELECT o_custkey AS cust_b,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS late_total
           FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
           GROUP BY o_custkey
         )
         SELECT coalesce(cust_a, cust_b) AS o_custkey,
           coalesce(early_total, 0.0) AS early_total,
           coalesce(late_total, 0.0) AS late_total
         FROM a FULL OUTER JOIN b ON cust_a = cust_b
         ORDER BY o_custkey""",

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",

    "q_join_anti" ->
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",

    "q_join_cross" ->
      """SELECT r_name || '-' || o_orderpriority AS label
         FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
         ORDER BY label""",

    "q_agg_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
         count(*) AS n_cust,
         CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS acctbal_total
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q_agg_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n_orders,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",

    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls,
         count(*) AS n_lines,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",

    "q_agg_stats" ->
      """SELECT event_type, count(*) AS n,
         min(value) AS min_v, max(value) AS max_v,
         round(avg(value), 4) AS avg_v,
         round(stddev_samp(value), 4) AS std_v,
         round(quantile_cont(value, 0.5), 4) AS median_v
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_agg_stats_bivariate" ->
      """WITH g AS (
           SELECT event_type,
             CAST(count(*) AS DOUBLE) AS nd,
             -- the VARCHAR hop makes the decimal->double conversion
             -- correctly rounded (DuckDB's direct cast double-rounds
             -- via int128->double then /10^scale once the unscaled
             -- value passes 2^53; Spark's cast is single-rounded)
             CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
               AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(CAST(sum(CAST(user_id AS DECIMAL(18,0)))
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS sy,
             -- DECIMAL(28) operands force DuckDB's int128 multiply
             -- path (the r8 overflow class: DECIMAL(18) products run
             -- in int64 and user_id^2 passes 2^63 at sf1)
             CAST(CAST(CAST(sum(CAST(CAST(value AS DECIMAL(28,6))
                 * CAST(value AS DECIMAL(28,6)) AS DECIMAL(38,12)))
               AS DECIMAL(38,12)) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(CAST(sum(CAST(CAST(user_id AS DECIMAL(28,0))
                 * CAST(user_id AS DECIMAL(28,0)) AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(CAST(sum(CAST(CAST(value AS DECIMAL(28,6))
                 * CAST(user_id AS DECIMAL(28,0)) AS DECIMAL(38,6)))
               AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sxy
           FROM events GROUP BY event_type),
         m AS (
           SELECT event_type, nd,
             sxx - sx * sx / nd AS mxx,
             syy - sy * sy / nd AS myy,
             sxy - sx * sy / nd AS mxy
           FROM g)
         SELECT event_type,
           round(mxx / (nd - 1.0), 4) AS var_s,
           round(mxx / nd, 4) AS var_p,
           round(sqrt(greatest(mxx, 0) / nd), 4) AS std_p,
           round(CASE WHEN mxx <= 0 OR myy <= 0 THEN NULL
                 ELSE mxy / sqrt(mxx * myy) END, 6) AS corr_vu,
           round(mxy / (nd - 1.0), 4) AS covar_s,
           round(mxy / nd, 4) AS covar_p
         FROM m ORDER BY event_type""",

    "q_grouping_sets" -> sameTextSql("q_grouping_sets"),

    "q_sql_pivot" ->
      """SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_quantity AS DECIMAL(18,6)) END)
             AS DECIMAL(18,6))::DOUBLE, 6) AS qty_open,
           round(CAST(sum(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_quantity AS DECIMAL(18,6)) END)
             AS DECIMAL(18,6))::DOUBLE, 6) AS qty_filled
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    "q_sql_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n_rows,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
               AS DOUBLE), 2) AS qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
               AS DOUBLE), 2) AS revenue
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, metric, val FROM (
           SELECT l_returnflag, 'n_rows' AS metric, n_rows AS val
           FROM wide
           UNION ALL
           SELECT l_returnflag, 'qty' AS metric, qty AS val FROM wide
           UNION ALL
           SELECT l_returnflag, 'revenue' AS metric, revenue AS val
           FROM wide)
         ORDER BY l_returnflag, metric""",

    // the Spark query's exact text (both engines native)
    "q_sql_group_by_all" -> sameTextSql("q_sql_group_by_all"),

    // the Spark query's exact text: DuckDB's native EXCLUDE
    "q_select_exclude" -> sameTextSql("q_select_exclude"),

    // the Spark query's exact text: DuckDB's native REPLACE
    "q_select_replace" -> sameTextSql("q_select_replace"),

    // hand-expanded: DuckDB 1.0 predates the RENAME star modifier
    "q_select_rename" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus AS status,
                o_totalprice AS price, o_orderdate, o_orderpriority
         FROM orders
         ORDER BY price DESC, o_orderkey LIMIT 50""",

    // the Spark query's exact text: DuckDB's native DISTINCT ON
    "q_distinct_on" -> sameTextSql("q_distinct_on"),

    // the Spark query's exact text: DuckDB evaluates QUALIFY natively
    "q_window_qualify" -> sameTextSql("q_window_qualify"),

    "q_window_dist" ->
      """SELECT o_orderstatus, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
           ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderstatus, o_orderkey""",

    "q_agg_mode" ->
      """WITH b AS (
           SELECT event_type,
             CAST(floor(value / 10) AS BIGINT) AS bin,
             count(*) AS cnt
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, bin, cnt,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cnt DESC, bin) AS rn
           FROM b)
         SELECT event_type, bin AS modal_bin, cnt AS n_modal
         FROM r WHERE rn = 1 ORDER BY event_type""",

    "q_window_rank" ->
      """SELECT * FROM (
           SELECT o_orderstatus,
             CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY floor(o_totalprice / 50000) DESC, o_orderkey) AS INTEGER) AS rn,
             CAST(rank() OVER (PARTITION BY o_orderstatus
               ORDER BY floor(o_totalprice / 50000) DESC) AS INTEGER) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_orderstatus
               ORDER BY floor(o_totalprice / 50000) DESC) AS INTEGER) AS drnk
           FROM orders)
         WHERE rn <= 20 ORDER BY o_orderstatus, rn""",

    "q_window_lag" ->
      """SELECT user_id, event_id, value,
         lag(value, 1) OVER w AS prev_v,
         lead(value, 1) OVER w AS next_v,
         value - coalesce(lag(value, 1) OVER w, 0.0) AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",

    "q_window_running" ->
      """SELECT user_id, event_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running,
         round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
         FROM events ORDER BY user_id, event_id""",

    "q_window_range_frame" ->
      """SELECT user_id, event_id,
         count(*) OVER w AS n_10min,
         round(sum(value) OVER w, 4) AS sum_10min
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "q_window_analytics" ->
      """SELECT * FROM (
           SELECT o_orderstatus, o_orderkey,
             first_value(o_orderkey) OVER wf AS cheapest_key,
             last_value(o_orderkey) OVER wf AS dearest_key,
             nth_value(o_orderkey, 2) OVER wf AS second_key,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
           FROM orders
           WINDOW
             w AS (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey),
             wf AS (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING))
         WHERE o_orderkey % 25 = 0
         ORDER BY o_orderstatus, o_orderkey""",

    "q_topk_per_group" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "q_set_union" ->
      """SELECT nationkey, count(*) AS cnt FROM (
           SELECT c_nationkey AS nationkey FROM customer
           WHERE c_mktsegment = 'BUILDING'
           UNION ALL
           SELECT s_nationkey AS nationkey FROM supplier)
         GROUP BY nationkey ORDER BY nationkey""",

    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
         ORDER BY nationkey""",

    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT
         SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
         ORDER BY nationkey""",

    "q_window_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         count(*) AS cnt, round(sum(value), 4) AS total
         FROM events GROUP BY day, event_type ORDER BY day, event_type""",

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         count(*) AS cnt, round(sum(value), 4) AS total
         FROM events GROUP BY k ORDER BY k""",
  )
}
