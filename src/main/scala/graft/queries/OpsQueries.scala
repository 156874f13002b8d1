package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline-operations utilities: snapshot diffing (the "what
  * changed between two table versions" audit behind any CDC or
  * backfill), weighted reservoir sampling, and KMV sketch set
  * algebra (union / intersection cardinality across segments from
  * two k-sized sketches — never from the raw sets).
  *
  * Scale designs:
  *  - the snapshot diff is ONE full-outer equi-join on the key plus
  *    a hash aggregate — the canonical minimal-shuffle shape for
  *    version comparison (both sides shuffle once on the key; at
  *    100 TB bucket both versions on the key and even that shuffle
  *    disappears);
  *  - the weighted sample is Efraimidis–Spirakis A-ES: one scan
  *    computes a deterministic md5-uniform priority per row,
  *    top-k via sort+limit (TakeOrderedAndProject — each partition
  *    forwards only k rows, there is no global sort and no pass
  *    that depends on total weight);
  *  - KMV set algebra never touches raw distinct sets beyond the
  *    first per-segment sketch build (distinct shuffle of (segment,
  *    8-byte hash), WindowGroupLimit-pruned to k per segment);
  *    union/intersection estimates are derived from the ≤ 2k merged
  *    sketch rows — the whole point of mergeable sketches at scale.
  */
object OpsQueries {

  private val two60 = Portable.two60

  /** Portable 60-bit hash — see [[Portable.h60]] (the former local
    * copy interpolated Column.toString into SQL text, which breaks
    * for any composite expression).
    */
  private def h60(c: org.apache.spark.sql.Column) = Portable.h60(c)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Snapshot diff: two deterministic "versions" of orders (V1
    // drops keys ≡3 mod 10; V2 drops keys ≡7 mod 10 and reprices
    // keys ≡0 mod 5) compared by key with a single full-outer join.
    // Output is the per-class audit (added/removed/changed/
    // unchanged): row counts and the exact DECIMAL price delta.
    "q_snapshot_diff" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val v1 = o.where(col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").as("price1"))
      val v2 = o.where(col("o_orderkey") % 10 =!= 7)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 5 === 0,
            col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("price2"))
      v1.join(v2, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("price1").isNull, "added")
            .when(col("price2").isNull, "removed")
            .when(col("price1") =!= col("price2"), "changed")
            .otherwise("unchanged").as("change_type"),
          (coalesce(col("price2"), lit(0.0)) -
            coalesce(col("price1"), lit(0.0)))
            .cast("decimal(18,4)").as("delta"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("delta")).cast("decimal(18,4)")
            .cast("double"), 4).as("price_delta"),
          min(col("k")).as("min_key"), max(col("k")).as("max_key"))
        .orderBy(col("change_type"))
    },

    // Weighted sample without replacement (Efraimidis–Spirakis
    // A-ES), weight = document length: priority = ln(u)/w with u a
    // deterministic md5-uniform in (0,1] — the k largest priorities
    // are exactly a weighted draw. One scan, top-k via
    // TakeOrderedAndProject; DECIMAL(28,10) quantization of the
    // priority makes the order (and the oracle) engine-stable, with
    // doc_id as the total-order tie-break.
    "q_sample_weighted" -> { (s, dir) =>
      val k = 100
      val docs = Tables(s, dir, "documents")
      // top-k membership + order decided on the DECIMAL(28,10)
      // priority (engine-stable); the emitted column is DOUBLE —
      // round(·,10) cannot re-tie rows the decimal kept distinct,
      // so the final sort is unambiguous in both engines.
      docs.select(col("doc_id"), col("lang"), col("n_chars"),
          (log((h60(col("doc_id")) + 1) / two60) / col("n_chars"))
            .cast("decimal(28,10)").as("priority_d"))
        .orderBy(col("priority_d").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("priority_d").cast("double"), 10).as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
    },

    // KMV sketch set algebra, k = 64: per-segment k-minimum-values
    // sketches of the purchase-users and click-users sets, then
    // union cardinality from the merged sketch's k-th minimum and
    // intersection via the Jaccard fraction WITHIN the merged
    // sketch (ρ = |both| / |merged ≤ k|) — the standard mergeable
    // estimator (Bar-Yossef et al.; Beyer et al. SIGMOD'07). Every
    // number is deterministic arithmetic over md5 hashes, so the
    // oracle reproduces the estimates bit-for-bit.
    "q_kmv_set_ops" -> { (s, dir) =>
      val k = 64
      val hashes = Tables(s, dir, "events")
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_type").as("seg"),
          h60(col("user_id")).as("h"))
        .distinct()
      val perSeg = Window.partitionBy(col("seg")).orderBy(col("h"))
      val sketch = hashes
        .withColumn("rn", row_number().over(perSeg))
        .where(col("rn") <= k).select(col("seg"), col("h"))
      def est(mc: org.apache.spark.sql.Column,
          hk: org.apache.spark.sql.Column) =
        when(mc < k, mc.cast("double"))
          .otherwise(lit((k - 1) * two60) / hk.cast("double"))
      val perSegEst = sketch.groupBy(col("seg"))
        .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
        .select(col("seg"), round(est(col("m"), col("hk")), 4)
          .as("e"))
      val merged = sketch
        .groupBy(col("h"))
        .agg(max(when(col("seg") === "purchase", 1).otherwise(0))
            .as("in_a"),
          max(when(col("seg") === "click", 1).otherwise(0))
            .as("in_b"))
        // unpartitioned window over the MERGED SKETCH (≤2k hashes),
        // never the event stream — bounded at any corpus size
        .withColumn("rn",
          row_number().over(Window.orderBy(col("h"))))
        .where(col("rn") <= k)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("m"),
          sum(col("in_a") * col("in_b")).as("n_both"))
        .select(round(est(col("m"), col("hk")), 4).as("est_union"),
          col("n_both"), col("m"))
      val ea = perSegEst.where(col("seg") === "purchase")
        .select(col("e").as("est_purchase_users"))
      val eb = perSegEst.where(col("seg") === "click")
        .select(col("e").as("est_click_users"))
      merged.crossJoin(broadcast(ea)).crossJoin(broadcast(eb))
        .select(col("est_purchase_users"), col("est_click_users"),
          col("est_union"),
          round(col("n_both") / col("m") * col("est_union"), 4)
            .as("est_intersection"))
    },

    // Duplicate-payment screen — the classic AP audit: orders from
    // the SAME customer whose amounts are within 5% and dates within
    // 30 days are flagged as candidate double payments. The
    // self-join is an equi-join on the customer key (the selective
    // predicate); amount and date tolerance are residual filters, so
    // the pair space is Σ(orders-per-customer)², bounded by the
    // per-entity order cadence — never |orders|². At 100 TB the same
    // plan holds: shuffle both sides on custkey (or bucket the table
    // by it and shuffle nothing).
    "q_duplicate_payments" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val a = o.select(col("o_custkey").as("cust"),
        col("o_orderkey").as("ok_a"),
        col("o_totalprice").as("amt_a"),
        to_date(col("o_orderdate")).as("d_a"))
      val b = o.select(col("o_custkey").as("cust"),
        col("o_orderkey").as("ok_b"),
        col("o_totalprice").as("amt_b"),
        to_date(col("o_orderdate")).as("d_b"))
      a.join(b, Seq("cust"))
        .where(col("ok_a") < col("ok_b") &&
          abs(col("amt_a") - col("amt_b")) <=
            lit(0.05) * col("amt_a") &&
          abs(datediff(col("d_a"), col("d_b"))) <= 30)
        .select(col("cust"), col("ok_a"), col("ok_b"),
          round(col("amt_a"), 2).as("amt_a"),
          round(col("amt_b"), 2).as("amt_b"),
          abs(datediff(col("d_a"), col("d_b"))).cast("long")
            .as("day_gap"),
          round(abs(col("amt_a") - col("amt_b")) / col("amt_a"), 4)
            .as("pct_diff"))
        .orderBy(col("cust"), col("ok_a"), col("ok_b"))
    },

    // Ledger reconciliation — does the order header total equal the
    // sum of its lines at invoice arithmetic
    // (extendedprice·(1−discount)·(1+tax))? One equi-join +
    // aggregate keyed on the order, then a per-status rollup of
    // match/over/under counts and the worst discrepancy. Per-line
    // amounts are DECIMAL(18,4)-quantized before summing (exact,
    // association-free), the header total quantized the same way,
    // so the match verdict is bit-identical cross-engine. Linear
    // scans, one shuffle on the order key — at scale, bucket both
    // tables by orderkey and the shuffle disappears.
    "q_ledger_reconcile" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("line_total"),
          count(lit(1)).as("n_lines"))
      val d = Tables(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderstatus"),
          col("n_lines").isNull.as("no_lines"),
          (col("o_totalprice").cast("decimal(18,6)") -
            coalesce(col("line_total"),
              lit(0).cast("decimal(18,6)"))).as("diff"))
      d.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("no_lines"), 1L).otherwise(0L))
            .as("n_no_lines"),
          sum(when(!col("no_lines") &&
            abs(col("diff")) <= lit(new java.math.BigDecimal("0.01")),
            1L).otherwise(0L)).as("n_matched"),
          sum(when(!col("no_lines") &&
            col("diff") > lit(new java.math.BigDecimal("0.01")), 1L)
            .otherwise(0L)).as("n_over"),
          sum(when(!col("no_lines") &&
            col("diff") < lit(new java.math.BigDecimal("-0.01")), 1L)
            .otherwise(0L)).as("n_under"),
          round(max(abs(col("diff"))).cast("decimal(18,6)")
            .cast("double"), 6).as("max_abs_diff"),
          round(sum(col("diff")).cast("decimal(28,6)")
            .cast("double"), 6).as("total_diff"))
        .orderBy(col("o_orderstatus"))
    },

    // Order aging report — the receivables view: age each order
    // against the corpus watermark (one-row broadcast max — the
    // q_topk_decayed idiom), bucket at 30/60/90 days, and roll up
    // counts and DECIMAL-exact value per status × bucket. One scan,
    // one aggregate; the bucket domain is fixed so the readout is
    // |status|×4 rows at any scale.
    "q_order_aging" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val wm = o.agg(max(to_date(col("o_orderdate"))).as("wm"))
      val age = datediff(col("wm"), to_date(col("o_orderdate")))
      o.crossJoin(broadcast(wm))
        .select(col("o_orderstatus"), col("o_totalprice"),
          age.as("age_days"))
        .withColumn("age_bucket",
          when(col("age_days") <= 30, "000-030")
            .when(col("age_days") <= 60, "031-060")
            .when(col("age_days") <= 90, "061-090")
            .otherwise("090+"))
        .groupBy(col("o_orderstatus"), col("age_bucket"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)").cast("double"), 6)
            .as("total_value"),
          max(col("age_days")).cast("long").as("max_age"))
        .orderBy(col("o_orderstatus"), col("age_bucket"))
    },

    // Deterministic global shuffle → fixed-size training shards —
    // the export step every training pipeline ends with: rows must
    // land in a reproducible pseudo-random order, cut into shards of
    // exactly `shardSize`, with NO global sort. The shuffle order is
    // the portable md5 hex of doc_id; global rank is recovered from
    // 256 hash-prefix buckets (first 2 hex chars — prefix order is
    // consistent with full-string order): per-bucket counts
    // prefix-sum into rank offsets (unpartitioned window over the
    // ≤256-row bucket aggregate — constant-bounded domain, the
    // audited exception), and row_number runs WITHIN buckets only.
    // The widest serial sort is |docs|/256 at any SF; each doc
    // crosses the wire once for the bucket window and once for the
    // shard rollup. Readout: per-shard doc count / char volume /
    // hash span (every shard exactly shardSize docs except the
    // tail — the property OpsSpec pins).
    "q_shuffle_shards" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val shardSize = 64
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("bkt",
          conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
      val counts = docs.groupBy(col("bkt")).agg(count(lit(1)).as("c"))
      val offsets = counts.withColumn("off",
        coalesce(sum(col("c")).over(Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val wIn = Window.partitionBy(col("bkt"))
        .orderBy(col("h"), col("doc_id"))
      docs.join(broadcast(offsets.select(col("bkt"), col("off"))),
          Seq("bkt"))
        .withColumn("rnk", col("off") + row_number().over(wIn))
        .withColumn("shard",
          floor((col("rnk") - 1) / shardSize).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("shard_chars"),
          min(col("h")).as("min_hash"), max(col("h")).as("max_hash"))
        .orderBy(col("shard"))
    })

  val oracles: Map[String, String] = Map(

    "q_shuffle_shards" ->
      """WITH ranked AS (
           SELECT n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
           FROM documents)
         SELECT CAST(floor((rnk - 1) / 64) AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_chars,
           min(h) AS min_hash, max(h) AS max_hash
         FROM ranked GROUP BY 1 ORDER BY 1""",

    "q_snapshot_diff" ->
      """WITH v1 AS (
           SELECT o_orderkey AS k, o_totalprice AS price1 FROM orders
           WHERE o_orderkey % 10 <> 3),
         v2 AS (
           SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS price2
           FROM orders WHERE o_orderkey % 10 <> 7),
         d AS (
           SELECT coalesce(v1.k, v2.k) AS k,
             CASE WHEN price1 IS NULL THEN 'added'
                  WHEN price2 IS NULL THEN 'removed'
                  WHEN price1 <> price2 THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             CAST(coalesce(price2, 0) - coalesce(price1, 0)
               AS DECIMAL(18,4)) AS delta
           FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
         SELECT change_type, count(*) AS n,
           round(CAST(sum(delta) AS DECIMAL(18,4))::DOUBLE, 4)
             AS price_delta,
           min(k) AS min_key, max(k) AS max_key
         FROM d GROUP BY change_type ORDER BY change_type""",

    "q_sample_weighted" ->
      """WITH ranked AS (
           SELECT doc_id, lang, n_chars,
             CAST(ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        ::BIGINT + 1) / 1152921504606846976.0)
                  / n_chars AS DECIMAL(28,10)) AS priority_d
           FROM documents
           ORDER BY priority_d DESC, doc_id LIMIT 100)
         SELECT doc_id, lang, n_chars,
           round(priority_d::DOUBLE, 10) AS priority
         FROM ranked ORDER BY priority DESC, doc_id""",

    "q_kmv_set_ops" ->
      """WITH hashes AS (
           SELECT DISTINCT event_type AS seg,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT AS h
           FROM events WHERE event_type IN ('purchase', 'click')),
         sketch AS (
           SELECT seg, h FROM (
             SELECT seg, h,
               row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
             FROM hashes) WHERE rn <= 64),
         perseg AS (
           SELECT seg,
             round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
               ELSE 63.0 * 1152921504606846976.0 / max(h)::DOUBLE END, 4)
               AS e
           FROM sketch GROUP BY seg),
         merged AS (
           SELECT h,
             max(CASE WHEN seg = 'purchase' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN seg = 'click' THEN 1 ELSE 0 END) AS in_b
           FROM sketch GROUP BY h),
         topu AS (
           SELECT * FROM (
             SELECT h, in_a, in_b,
               row_number() OVER (ORDER BY h) AS rn
             FROM merged) WHERE rn <= 64),
         uagg AS (
           SELECT round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
               ELSE 63.0 * 1152921504606846976.0 / max(h)::DOUBLE END, 4)
               AS est_union,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
             count(*) AS m
           FROM topu)
         SELECT
           (SELECT e FROM perseg WHERE seg = 'purchase')
             AS est_purchase_users,
           (SELECT e FROM perseg WHERE seg = 'click')
             AS est_click_users,
           est_union,
           round(n_both / m * est_union, 4) AS est_intersection
         FROM uagg""",

    "q_duplicate_payments" ->
      """SELECT a.o_custkey AS cust,
           a.o_orderkey AS ok_a, b.o_orderkey AS ok_b,
           round(a.o_totalprice, 2) AS amt_a,
           round(b.o_totalprice, 2) AS amt_b,
           CAST(abs(date_diff('day', CAST(b.o_orderdate AS DATE),
             CAST(a.o_orderdate AS DATE))) AS BIGINT) AS day_gap,
           round(abs(a.o_totalprice - b.o_totalprice)
             / a.o_totalprice, 4) AS pct_diff
         FROM orders a JOIN orders b
           ON a.o_custkey = b.o_custkey
          AND a.o_orderkey < b.o_orderkey
          AND abs(a.o_totalprice - b.o_totalprice)
                <= 0.05 * a.o_totalprice
          AND abs(date_diff('day', CAST(b.o_orderdate AS DATE),
                CAST(a.o_orderdate AS DATE))) <= 30
         ORDER BY cust, ok_a, ok_b""",

    "q_ledger_reconcile" ->
      """WITH li AS (
           SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(18,6))
               AS line_total,
             count(*) AS n_lines
           FROM lineitem GROUP BY 1),
         d AS (
           SELECT o.o_orderstatus,
             li.n_lines IS NULL AS no_lines,
             CAST(o.o_totalprice AS DECIMAL(18,6))
               - coalesce(li.line_total, CAST(0 AS DECIMAL(18,6)))
               AS diff
           FROM orders o
           LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
         SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_lines,
           CAST(sum(CASE WHEN NOT no_lines AND abs(diff) <= 0.01
             THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN NOT no_lines AND diff > 0.01
             THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
           CAST(sum(CASE WHEN NOT no_lines AND diff < -0.01
             THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
           round(CAST(max(abs(diff)) AS DECIMAL(18,6))::DOUBLE, 6)
             AS max_abs_diff,
           round(CAST(sum(diff) AS DECIMAL(28,6))::DOUBLE, 6)
             AS total_diff
         FROM d GROUP BY 1 ORDER BY o_orderstatus""",

    "q_order_aging" ->
      """WITH wm AS (
           SELECT max(CAST(o_orderdate AS DATE)) AS wm FROM orders),
         aged AS (
           SELECT o_orderstatus, o_totalprice,
             date_diff('day', CAST(o_orderdate AS DATE), w.wm)
               AS age_days
           FROM orders, wm w),
         bucketed AS (
           SELECT o_orderstatus, o_totalprice, age_days,
             CASE WHEN age_days <= 30 THEN '000-030'
                  WHEN age_days <= 60 THEN '031-060'
                  WHEN age_days <= 90 THEN '061-090'
                  ELSE '090+' END AS age_bucket
           FROM aged)
         SELECT o_orderstatus, age_bucket,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
             AS DECIMAL(28,6))::DOUBLE, 6) AS total_value,
           CAST(max(age_days) AS BIGINT) AS max_age
         FROM bucketed GROUP BY 1, 2
         ORDER BY o_orderstatus, age_bucket""")
}
