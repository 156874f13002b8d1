package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral-sequence and market-basket mining over the event
  * stream and the order fact table: last-touch attribution, a
  * first-order Markov transition matrix, and association-rule
  * mining with apriori pruning.
  *
  * Scale designs:
  *  - attribution and transitions are ONE window each, partitioned
  *    by user_id with a rows frame — a single shuffle on the user
  *    key, state bounded by the frame (1 row), never a per-user
  *    collect;
  *  - association rules never enumerate the item×item cross
  *    product: baskets are pruned to frequent items FIRST (the
  *    apriori bound — a pair at support s needs both items at
  *    support ≥ s), via a broadcast semi-join, then the pair join is
  *    an equi-join on the basket key, so shuffle volume is
  *    Σ basket², bounded by the max basket size (13 here; a cap
  *    would guard pathological baskets at 100 TB), not |items|².
  */
object SequenceQueries {

  /** Per-user event order: ts then event_id — a deterministic total
    * order (event_id is unique), identical in both engines.
    */
  private def userSeq = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  private val touchTypes = Seq("click", "view", "signup")

  /** Distinct (basket, item) incidence of the order fact table. */
  private def basketTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).distinct()

  /** Apriori-pruned co-occurring pairs with supports as payload —
    * shared by the rule miner and the item-cosine recommender.
    * Item supports ride a FULL-PARTITION window and travel through
    * the pair join as payload columns — a first cut built three
    * separate broadcast legs (itemN, n_a, n_b) whose renamed
    * subtrees Catalyst could NOT dedupe, re-running the
    * scan+distinct per leg; measured 4.1 s → this shape at sf0.1.
    * Output: (item_a < item_b, n_a, n_b, n_ab ≥ minSup).
    */
  private def supportedPairs(baskets: DataFrame,
      minSup: Int): DataFrame = {
    val withN = baskets.withColumn("n_item",
        count(lit(1)).over(Window.partitionBy(col("item"))))
      .where(col("n_item") >= minSup)
    // Pair generation (r13, guide §2.3/§2.4, same rewrite as the
    // co-supply graph): ONE groupBy(basket) collecting the sorted
    // (item, support) set replaces the basket self-join — one fewer
    // exchange, no join, and the a<b combinations unroll map-side
    // with the supports riding in the structs, pre-aggregated before
    // the pair shuffle. Identical pair multiset. Work stays
    // Σ(basket size)².
    withN
      .groupBy(col("basket"))
      .agg(sort_array(collect_set(struct(col("item"), col("n_item"))))
        .as("its"))
      .select(explode(expr(
        "flatten(transform(its, (x, i) -> " +
          "transform(slice(its, i + 2, size(its)), " +
          "y -> struct(x.item AS item_a, y.item AS item_b, " +
          "x.n_item AS n_a, y.n_item AS n_b))))")).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .groupBy(col("item_a"), col("item_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSup)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Last-touch attribution: each purchase is credited to the
    // user's most recent PRECEDING touch event (click/view/signup;
    // errors and earlier purchases don't count as touches). One
    // window with an unbounded-preceding rows frame and
    // ignore-nulls last() — the running "latest touch seen" — then
    // a hash aggregate per channel. Purchases with no prior touch
    // report as 'unattributed' rather than being dropped: the
    // attribution table must sum to all conversions.
    "q_attribution_last_touch" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val touch = when(col("event_type").isin(touchTypes: _*),
        col("event_type"))
      val lastTouch = last(touch, ignoreNulls = true)
        .over(userSeq.rowsBetween(Window.unboundedPreceding, -1))
      ev.withColumn("channel", lastTouch)
        .where(col("event_type") === "purchase")
        .select(coalesce(col("channel"), lit("unattributed"))
          .as("channel"), col("value"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          // DECIMAL sum: order-independent across partitions, exact
          // in any engine (a double sum differs in ulps by
          // association) — the repo-wide idiom for summed metrics.
          round(sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)").cast("double"), 6).as("revenue"))
        .orderBy(col("channel"))
    },

    // Linear multi-touch attribution — the last-touch model's
    // companion: each purchase's value is split EQUALLY across all
    // touch events since the user's previous purchase. Segments are
    // a running count of PRECEDING purchases (one window), touch
    // tallies per (user, segment, channel) and purchase totals per
    // (user, segment) are two hash aggregates joined back on the
    // segment key; per-credit doubles are DECIMAL-quantized before
    // the channel sum. Purchases whose segment has no touches
    // surface as 'unattributed' via the purchase-side anti check —
    // credited revenue must sum to total purchase revenue
    // (conservation gate in SequenceSpec).
    "q_attribution_linear" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val seg = sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L))
        .over(userSeq.rowsBetween(Window.unboundedPreceding, -1))
      val tagged = ev.withColumn("seg", coalesce(seg, lit(0L)))
      val touches = tagged
        .where(col("event_type").isin(touchTypes: _*))
        .groupBy(col("user_id"), col("seg"),
          col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_ch"))
      val segTotals = touches.groupBy(col("user_id"), col("seg"))
        .agg(sum(col("n_ch")).as("n_tot"))
      val purchases = tagged
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("seg"), col("value"))
      purchases
        .join(segTotals, Seq("user_id", "seg"), "left_outer")
        .join(touches, Seq("user_id", "seg"), "left_outer")
        .select(
          coalesce(col("channel"), lit("unattributed")).as("channel"),
          when(col("n_ch").isNotNull,
            (col("value") * col("n_ch") / col("n_tot"))
              .cast("decimal(18,6)"))
            .otherwise(col("value").cast("decimal(18,6)"))
            .as("credit"))
        .groupBy(col("channel"))
        .agg(round(sum(col("credit")).cast("decimal(18,6)")
          .cast("double"), 6).as("credited_revenue"))
        .orderBy(col("channel"))
    },

    // First-order Markov transition matrix of event types: lag(1)
    // per user sequence, then (prev → next) counts and the
    // row-normalized transition probability. The second window
    // (sum over prev) runs on the |types|² grouped table — 25 rows
    // here, bounded by the type-domain size at any scale.
    "q_markov_transitions" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val withPrev = ev.select(col("user_id"), col("ts"),
          col("event_id"), col("event_type").as("next"))
        .withColumn("prev", lag(col("next"), 1).over(userSeq))
        .where(col("prev").isNotNull)
      val counts = withPrev.groupBy(col("prev"), col("next"))
        .agg(count(lit(1)).as("n"))
      counts.withColumn("p_transition",
          round(col("n") / sum(col("n"))
            .over(Window.partitionBy(col("prev"))), 4))
        .orderBy(col("prev"), col("next"))
    },

    // RFM segmentation: recency / frequency / monetary quintile
    // scores per purchasing user, the classic customer-value grid.
    // One hash aggregate builds the per-user RFM row (recency
    // against a one-row broadcast corpus max — no second scan);
    // scores are assigned MAP-SIDE against broadcast quintile edges
    // (exact distributed percentile), NOT with global ntile windows
    // — ntile single-partitions the whole user table, the exact
    // plan shape earlier rounds eliminated from rrf/k-means.
    // score = 1 + #edges exceeded; ties share a score (an
    // edge-assignment, not an equal-count split — the scalable
    // semantics). Output is the 5³-bounded segment grid.
    "q_rfm_segmentation" -> { (s, dir) =>
      val purchases = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
      val perUser = purchases.groupBy(col("user_id"))
        .agg(max(expr("unix_micros(ts)")).as("last_us"),
          count(lit(1)).cast("double").as("frequency"),
          sum(col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)").as("monetary"))
      val maxTs = purchases
        .agg(max(expr("unix_micros(ts)")).as("corpus_max_us"))
      val rfm = perUser.crossJoin(broadcast(maxTs))
        .withColumn("recency_days",
          ((col("corpus_max_us") - col("last_us")) /
            lit(86400000000L)).cast("long").cast("double"))
        .withColumn("monetary_d", col("monetary").cast("double"))
      // round(6) pins the quintile edges across engines: frequency
      // and recency are integer-valued (massive ties), and DuckDB's
      // quantile_cont is ~1 ulp off even when lo == hi (the
      // q_winsorize sf1 class) — an unrounded edge flips the strict
      // `v > edge` scores by the whole tie group. Data grids here
      // are ≥ 2e-3, so 6dp can't hit its own half-tie.
      val edges = rfm.agg(
        expr("transform(percentile(recency_days, " +
          "array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("r_edges"),
        expr("transform(percentile(frequency, " +
          "array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("f_edges"),
        expr("transform(percentile(monetary_d, " +
          "array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("m_edges"))
      def score(v: org.apache.spark.sql.Column, e: String) =
        (lit(1) + aggregate(col(e), lit(0),
          (acc, edge) => acc + when(v > edge, 1).otherwise(0)))
          .cast("long")
      rfm.crossJoin(broadcast(edges))
        .select(
          score(col("recency_days"), "r_edges").as("r_score"),
          score(col("frequency"), "f_edges").as("f_score"),
          score(col("monetary_d"), "m_edges").as("m_score"),
          col("monetary"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          round(sum(col("monetary")).cast("decimal(18,6)")
            .cast("double"), 6).as("segment_revenue"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },

    // Association rules over order baskets (basket = order, item =
    // part): apriori-pruned pair mining with support, directional
    // confidence, and lift. Pipeline: distinct (basket, item) →
    // frequent-item prune (broadcast semi-join against the ≥minsup
    // item list) → self-equi-join on the basket key with a < b →
    // pair support filter → stats join (broadcast; the item-count
    // side is |frequent items| rows) → lift against the one-row
    // basket total.
    "q_cooccur_rules" -> { (s, dir) =>
      val minSup = 3
      val baskets = basketTable(s, dir)
      val pairs = supportedPairs(baskets, minSup)
      // r13: count distinct orderkeys straight off the scan — the
      // old baskets.distinct().agg path paid a full (basket, item)
      // exchange just to count baskets. Same value.
      val nBaskets = Tables(s, dir, "lineitem")
        .agg(countDistinct(col("l_orderkey")).as("n_baskets"))
      pairs
        .crossJoin(broadcast(nBaskets))
        .select(col("item_a"), col("item_b"), col("n_ab"),
          col("n_a"), col("n_b"),
          round(col("n_ab") / col("n_baskets"), 6).as("support"),
          round(col("n_ab") / col("n_a"), 4).as("conf_a_to_b"),
          round(col("n_ab") / col("n_b"), 4).as("conf_b_to_a"),
          round(col("n_ab") * col("n_baskets") /
            (col("n_a") * col("n_b")), 4).as("lift"))
        .orderBy(col("n_ab").desc, col("item_a"), col("item_b"))
    },

    // Item-item collaborative filtering: cosine similarity over the
    // order-basket incidence (sim = n_ab/√(n_a·n_b)), top-3 neighbors
    // per item — the "customers also bought" primitive. Same
    // windowed-support pair join as q_cooccur_rules (supports ride
    // the join as payload, Σ basket² work bound); the neighbor rank
    // is a row_number over each item's aggregated pair list, pruned
    // map-side by WindowGroupLimit. Cosine is a per-row quotient of
    // integers — IEEE-identical across engines, so ordering and the
    // top-3 cut replay exactly.
    "q_recsys_item_cosine" -> { (s, dir) =>
      // same support/pair construction AND the same threshold as
      // q_cooccur_rules — one shared builder, no lockstep editing
      val pairs = supportedPairs(basketTable(s, dir), minSup = 3)
      // expand to both directions so every item ranks its neighbors.
      // One explode pass (r13): the two-leg union evaluated the
      // whole supportedPairs pipeline TWICE — same rows, one scan.
      val directed = pairs.select(explode(array(
          struct(col("item_a").as("item"), col("item_b").as("neighbor"),
            col("n_ab"), col("n_a").as("n_i"), col("n_b").as("n_j")),
          struct(col("item_b").as("item"), col("item_a").as("neighbor"),
            col("n_ab"), col("n_b").as("n_i"), col("n_a").as("n_j"))))
          .as("d"))
        .select(col("d.item").as("item"), col("d.neighbor").as("neighbor"),
          col("d.n_ab").as("n_ab"), col("d.n_i").as("n_i"),
          col("d.n_j").as("n_j"))
        .withColumn("cosine",
          col("n_ab") / sqrt(col("n_i") * col("n_j")))
      val w = Window.partitionBy(col("item"))
        .orderBy(col("cosine").desc, col("neighbor"))
      directed.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("item"), col("neighbor"), col("n_ab"),
          round(col("cosine"), 4).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("item"), col("rank"))
    },

    // Journey-prefix mining: each user's first three event types
    // (time order, event_id tie-break) concatenated into a path
    // string, then the top-20 paths by user count — the "how do
    // users start" readout next to the Markov matrix's "where do
    // they go next". The per-user window is WindowGroupLimit-pruned
    // to 3 rows map-side (the top-k-per-group machinery), the path
    // build is one ordered collect over ≤3 rows, and the final
    // top-20 is sort+limit (TakeOrderedAndProject). Path cardinality
    // is bounded by |types|³, so the count aggregate is map-side
    // partial at any scale.
    "q_session_path_topk" -> { (s, dir) =>
      val first3 = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("rn", row_number().over(userSeq))
        .where(col("rn") <= 3)
      val paths = first3.groupBy(col("user_id"))
        .agg(concat_ws(">", array_sort(
          collect_list(struct(col("rn"), col("event_type"))))
          .getField("event_type")).as("path"),
          count(lit(1)).as("len"))
        .where(col("len") === 3)
      paths.groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },

    // Inter-purchase interval distribution — the repeat-purchase
    // cadence metric behind replenishment and churn models: per-user
    // consecutive purchase gaps (lag over the user sequence, exact
    // integer µs), summarized with exact percentiles. One window
    // pass over the purchase subset, one aggregate; the gap sum is
    // exact integer arithmetic so the mean is engine-identical.
    "q_interpurchase_gap" -> { (s, dir) =>
      val purchases = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
      val wUs = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gaps = purchases
        .withColumn("prev", lag(col("us"), 1).over(wUs))
        .where(col("prev").isNotNull)
        .select(col("user_id"), (col("us") - col("prev")).as("gap"))
      val hours = lit(3600.0) * lit(1000000.0)
      gaps.agg(
          countDistinct(col("user_id")).as("n_repeat_users"),
          count(lit(1)).as("n_gaps"),
          round(sum(col("gap")).cast("double") / count(lit(1)) /
            hours, 4).as("avg_gap_hours"),
          round(expr("percentile(gap, 0.5)") / hours, 4)
            .as("median_gap_hours"),
          round(expr("percentile(gap, 0.9)") / hours, 4)
            .as("p90_gap_hours"),
          round(max(col("gap")) / hours, 4).as("max_gap_hours"))
    })

  val oracles: Map[String, String] = Map(

    "q_attribution_last_touch" ->
      """WITH seq AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click','view','signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
           FROM events)
         SELECT coalesce(channel, 'unattributed') AS channel,
           count(*) AS n_conversions,
           round((sum(CAST(value AS DECIMAL(18,6)))::DECIMAL(18,6))::DOUBLE,
             6) AS revenue
         FROM seq WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY channel""",

    "q_attribution_linear" ->
      """WITH tagged AS (
           SELECT user_id, event_type, value,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS seg
           FROM events),
         touches AS (
           SELECT user_id, seg, event_type AS channel,
             count(*) AS n_ch
           FROM tagged
           WHERE event_type IN ('click', 'view', 'signup')
           GROUP BY 1, 2, 3),
         seg_totals AS (
           SELECT user_id, seg, sum(n_ch) AS n_tot
           FROM touches GROUP BY 1, 2),
         purchases AS (
           SELECT user_id, seg, value FROM tagged
           WHERE event_type = 'purchase')
         SELECT coalesce(t.channel, 'unattributed') AS channel,
           round(CAST(sum(CASE WHEN t.n_ch IS NOT NULL
             THEN CAST(p.value * t.n_ch / s.n_tot AS DECIMAL(18,6))
             ELSE CAST(p.value AS DECIMAL(18,6)) END)
             AS DECIMAL(18,6))::DOUBLE, 6) AS credited_revenue
         FROM purchases p
         LEFT JOIN seg_totals s USING (user_id, seg)
         LEFT JOIN touches t USING (user_id, seg)
         GROUP BY 1 ORDER BY channel""",

    "q_markov_transitions" ->
      """WITH seq AS (
           SELECT event_type AS next,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (
           SELECT prev, next, count(*) AS n FROM seq
           WHERE prev IS NOT NULL GROUP BY prev, next)
         SELECT prev, next, n,
           round(n / (sum(n) OVER (PARTITION BY prev)), 4)
             AS p_transition
         FROM c ORDER BY prev, next""",

    "q_rfm_segmentation" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) AS us, value FROM events
           WHERE event_type = 'purchase'),
         per AS (
           SELECT user_id, max(us) AS last_us,
             CAST(count(*) AS DOUBLE) AS frequency,
             sum(CAST(value AS DECIMAL(18,6)))::DECIMAL(18,6)
               AS monetary
           FROM p GROUP BY user_id),
         mx AS (SELECT max(us) AS corpus_max_us FROM p),
         rfm AS (
           SELECT user_id, frequency, monetary,
             monetary::DOUBLE AS monetary_d,
             CAST((mx.corpus_max_us - per.last_us) // 86400000000
               AS DOUBLE) AS recency_days
           FROM per, mx),
         e AS (
           SELECT
             list_transform(quantile_cont(recency_days,
               [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS r_edges,
             list_transform(quantile_cont(frequency,
               [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS f_edges,
             list_transform(quantile_cont(monetary_d,
               [0.2,0.4,0.6,0.8]), x -> round(x, 6)) AS m_edges
           FROM rfm),
         scored AS (
           SELECT
             1 + len(list_filter(e.r_edges,
               x -> rfm.recency_days > x)) AS r_score,
             1 + len(list_filter(e.f_edges,
               x -> rfm.frequency > x)) AS f_score,
             1 + len(list_filter(e.m_edges,
               x -> rfm.monetary_d > x)) AS m_score,
             rfm.monetary
           FROM rfm, e)
         SELECT r_score, f_score, m_score, count(*) AS n_users,
           round(CAST(sum(monetary) AS DECIMAL(18,6))::DOUBLE, 6)
             AS segment_revenue
         FROM scored GROUP BY 1, 2, 3
         ORDER BY r_score, f_score, m_score""",

    "q_cooccur_rules" ->
      """WITH baskets AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
           FROM lineitem),
         itemn AS MATERIALIZED (
           SELECT item, count(*) AS n_item FROM baskets
           GROUP BY item HAVING count(*) >= 3),
         freq AS MATERIALIZED (
           SELECT b.basket, b.item FROM baskets b
           WHERE b.item IN (SELECT item FROM itemn)),
         pairs AS (
           SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
           FROM freq a JOIN freq b
             ON a.basket = b.basket AND a.item < b.item
           GROUP BY 1, 2 HAVING count(*) >= 3),
         t AS (SELECT count(DISTINCT basket) AS n_baskets FROM baskets)
         SELECT p.item_a, p.item_b, p.n_ab, na.n_item AS n_a,
           nb.n_item AS n_b,
           round(p.n_ab / t.n_baskets, 6) AS support,
           round(p.n_ab / na.n_item, 4) AS conf_a_to_b,
           round(p.n_ab / nb.n_item, 4) AS conf_b_to_a,
           round(p.n_ab * t.n_baskets / (na.n_item * nb.n_item), 4)
             AS lift
         FROM pairs p
         JOIN itemn na ON p.item_a = na.item
         JOIN itemn nb ON p.item_b = nb.item, t
         ORDER BY p.n_ab DESC, p.item_a, p.item_b""",

    "q_recsys_item_cosine" ->
      """WITH baskets AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
           FROM lineitem),
         itemn AS (
           SELECT item, count(*) AS n_item FROM baskets GROUP BY item),
         b2 AS MATERIALIZED (
           SELECT basket, b.item, n_item
           FROM baskets b JOIN itemn USING (item)
           WHERE n_item >= 3),
         pairs AS MATERIALIZED (
           SELECT a.item AS item_a, b.item AS item_b,
             a.n_item AS n_a, b.n_item AS n_b, count(*) AS n_ab
           FROM b2 a JOIN b2 b ON a.basket = b.basket
             AND a.item < b.item
           GROUP BY 1, 2, 3, 4
           HAVING count(*) >= 3),
         directed AS (
           SELECT item_a AS item, item_b AS neighbor, n_ab,
             n_ab / sqrt(n_a * n_b) AS cosine
           FROM pairs
           UNION ALL
           SELECT item_b AS item, item_a AS neighbor, n_ab,
             n_ab / sqrt(n_b * n_a) AS cosine
           FROM pairs),
         rk AS (
           SELECT item, neighbor, n_ab, cosine,
             row_number() OVER (PARTITION BY item
               ORDER BY cosine DESC, neighbor) AS rank
           FROM directed)
         SELECT item, neighbor, n_ab,
           round(cosine, 4) AS cosine, rank
         FROM rk WHERE rank <= 3
         ORDER BY item, rank""",

    "q_session_path_topk" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
           FROM events),
         f3 AS (
           SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path,
             count(*) AS len
           FROM seq WHERE rn <= 3 GROUP BY user_id),
         p AS (
           SELECT path, count(*) AS n_users
           FROM f3 WHERE len = 3 GROUP BY 1)
         SELECT path, n_users FROM p
         ORDER BY n_users DESC, path LIMIT 20""",

    "q_interpurchase_gap" ->
      """WITH p AS (
           SELECT user_id, event_id, epoch_us(ts) AS us
           FROM events WHERE event_type = 'purchase'),
         g AS (
           SELECT user_id,
             us - lag(us, 1) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS gap
           FROM p),
         gg AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL)
         SELECT count(DISTINCT user_id) AS n_repeat_users,
           count(*) AS n_gaps,
           round(CAST(sum(gap) AS DOUBLE) / count(*)
             / 3600000000.0, 4) AS avg_gap_hours,
           round(quantile_cont(gap, 0.5) / 3600000000.0, 4)
             AS median_gap_hours,
           round(quantile_cont(gap, 0.9) / 3600000000.0, 4)
             AS p90_gap_hours,
           round(max(gap)::DOUBLE / 3600000000.0, 4)
             AS max_gap_hours
         FROM gg""")
}
