package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationship structures hiding in the star
  * schema: the co-supply graph (suppliers linked when they serve the
  * same order) and the nation-level trade graph (supplier nation →
  * customer nation, weighted by line items).
  *
  * Scale designs:
  *  - triangle counting uses the DEGREE-ORDERED orientation: each
  *    undirected edge is directed from its (degree, id)-smaller
  *    endpoint, which bounds every out-neighborhood by O(√m) on any
  *    graph, so the wedge join (the only superlinear step) does
  *    Σ outdeg² work — the standard bound that keeps triangle
  *    counting feasible on power-law graphs where a naive
  *    orientation would square the hub degree;
  *  - edge building is bounded by Σ(order size)² like the basket
  *    queries, never |suppliers|²;
  *  - PageRank iterates as THREE relational passes (the plan is the
  *    product: edges join a broadcast rank vector, re-aggregate by
  *    destination). On a 100× web-scale graph the broadcast flips to
  *    a shuffle join on src and the same plan holds; per-iteration
  *    contribution sums are DECIMAL-quantized (the repo-wide idiom
  *    for cross-engine double reductions), so three iterations stay
  *    bit-identical with the oracle.
  */
object GraphQueries {

  /** STRONG-TIE co-supply edges (a < b): supplier pairs whose
    * shared-order count reaches the in-plan 95th percentile of all
    * pair weights. Raw co-occurrence saturates to a near-complete
    * graph as orders accumulate (at sf0.1 every supplier pair shares
    * an order, and the unpruned triangle census measured 121 s on a
    * Θ(n³) wedge space); percentile-strength sparsification is the
    * standard pre-step before cubic graph analytics, keeps the edge
    * count at a fixed top-5% fraction at ANY scale factor, and is
    * derived in-plan (one-row broadcast — no tuning constant to rot
    * as the data grows). Pair weights are bounded by Σ(order size)²
    * work, never |suppliers|².
    */
  private[graft] def coSupplyEdges(s: SparkSession, dir: String)
      : DataFrame = {
    // Pair generation (r13 optimization, guide §2.3/§2.4): ONE
    // groupBy(order) with a map-side-combinable collect_set replaces
    // the old distinct + inverted self-join — 2 exchanges instead of
    // 4, and the only shuffled streams are the (ok, sk) rows once
    // and the pre-aggregated pair partials once. The sorted supplier
    // set unrolls into its a<b combinations map-side; the pair
    // multiset (and so every weight w) is identical to the self-join
    // formulation. Work stays Σ(order size)², never |suppliers|².
    // Both the threshold subquery and the pruning filter scan the
    // weighted aggregate — cache it eagerly (a lazy cache loses the
    // race to concurrent subtree tasks).
    val pairs = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("sks"))
      .select(explode(expr(
        "flatten(transform(sks, (x, i) -> " +
          "transform(slice(sks, i + 2, size(sks)), " +
          "y -> struct(x AS sa, y AS sb))))")).as("p"))
      .select(col("p.sa").as("sa"), col("p.sb").as("sb"))
    val weighted = graft.CachedPlans.cache(
      pairs.groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("w")))
    weighted.count()
    // exact p95 via the FREQUENCY form: a plain percentile(w, .95)
    // buffers every pair row in one aggregation buffer (the
    // single-reducer collect the pareto rewrite eliminated);
    // w is a small-domain integer count, so histogram first —
    // map-side-combinable, |distinct w| rows — then interpolate over
    // the tiny histogram. percentile(col, p, freq) is value-repeated
    // semantics: bit-identical to the unweighted form. round(6) pins
    // the threshold across engines (integer w ties + DuckDB's 1-ulp
    // quantile_cont interpolation — the q_winsorize sf1 class).
    val thr = weighted.groupBy(col("w")).agg(count(lit(1)).as("f"))
      .agg(round(expr("percentile(w, 0.95, f)"), 6).as("thr"))
    weighted.crossJoin(broadcast(thr)).where(col("w") >= col("thr"))
      .select(col("sa"), col("sb"))
  }

  /** Degree table of an undirected (sa, sb) edge list: one row per
    * node `v` with its incident-edge count named `cnt`. Shared by the
    * triangle census, the degree distribution, and the k-core peel so
    * the oracles' common `deg` CTE tracks a single definition.
    */
  private def degreeTable(e: DataFrame, cnt: String): DataFrame =
    // explode, not unionAll (r13, guide §2.4): the union form scans
    // (and for k_core's uncached per-round subgraphs, RE-EXECUTES)
    // the edge pipeline twice per degree build; one endpoint explode
    // reads it once. Same (v, count) multiset.
    e.select(explode(array(col("sa"), col("sb"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as(cnt))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Triangle census of the co-supply graph: nodes, edges, wedges
    // (paths of length 2), triangles, and the global clustering
    // coefficient 3·Δ/wedges. The wedge join runs on the
    // degree-oriented edge list (out-endpoint = smaller (deg, id)),
    // and the closing-edge check is a semi-join back to the oriented
    // edges — both equi-joins on node ids, no cartesian anywhere.
    "q_graph_triangles" -> { (s, dir) =>
      // eager materialization: the oriented/closing/wedge branches
      // reference the edge list 4×, and a lazy cache lets concurrent
      // subtree tasks race past the unpopulated cache and re-run the
      // Σ(order²) pair aggregate per branch (measured 15.6 s → 3.1 s
      // at sf0.1; same eager-count precedent as q_dedup_clusters_lsh)
      val e = graft.CachedPlans.cache(coSupplyEdges(s, dir))
      e.count()
      // deg feeds the orientation joins (da, db) AND the stats
      // aggregate; oriented feeds BOTH wedge sides and BOTH closing
      // directions. Uncached, each reference re-ran the whole
      // upstream join pipeline (the executed plan evaluated oriented
      // 4x and deg 6x — measured 7.3 s warm at sf0.1; ~1.6 s with
      // the two caches). Both tables are node/edge-sized, and the
      // accurate size of a materialized cache lets the planner keep
      // every downstream join a broadcast exactly while it fits.
      val deg = graft.CachedPlans.cache(degreeTable(e, "deg"))
      // orient each edge from the (deg, id)-smaller endpoint
      val da = deg.select(col("v").as("sa"), col("deg").as("dega"))
      val db = deg.select(col("v").as("sb"), col("deg").as("degb"))
      val oriented = graft.CachedPlans.cache(
        e.join(da, "sa").join(db, "sb")
        .select(
          when(col("dega") < col("degb") ||
            (col("dega") === col("degb") && col("sa") < col("sb")),
            col("sa")).otherwise(col("sb")).as("src"),
          when(col("dega") < col("degb") ||
            (col("dega") === col("degb") && col("sa") < col("sb")),
            col("sb")).otherwise(col("sa")).as("dst")))
      oriented.count()
      // wedges u→v, u→w (v < w by id) close iff v→w or w→v oriented;
      // oriented closing edges always run low→high in (deg,id) order,
      // so checking (v,w) AND (w,v) is a plain equi-join union
      val e1 = oriented.select(col("src").as("u"), col("dst").as("v"))
      val e2 = oriented.select(col("src").as("u2"), col("dst").as("w"))
      val wedges = e1.join(e2, col("u") === col("u2") &&
          col("v") < col("w"))
        .select(col("v"), col("w"))
      val closing = oriented.select(col("src").as("v"),
          col("dst").as("w"))
        .unionAll(oriented.select(col("dst").as("v"),
          col("src").as("w")))
      val triCount = wedges.join(closing, Seq("v", "w"))
        .agg(count(lit(1)).as("n_triangles"))
      val stats = deg.agg(count(lit(1)).as("n_nodes"),
        (sum(col("deg")) / 2).cast("long").as("n_edges"),
        sum((col("deg") * (col("deg") - 1) / 2).cast("long"))
          .as("n_wedges"))
      stats.crossJoin(broadcast(triCount))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
            .as("clustering_coeff"))
    },

    // Log2-binned degree distribution of the co-supply graph — the
    // first question asked of any production graph (is it power-law?
    // where do the hubs start?) and the input to choosing the
    // triangle orientation / join salting. Exact log2 via bin-string
    // length (length(bin(d))−1): pure integer semantics, no
    // floating-point floor(ln/ln2) edge at powers of two, identical
    // in both engines.
    "q_graph_degree_dist" -> { (s, dir) =>
      val e = coSupplyEdges(s, dir)
      val deg = degreeTable(e, "deg")
      deg.withColumn("bucket",
          (length(bin(col("deg"))) - 1).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
        .orderBy(col("bucket"))
    },

    // Three damped PageRank iterations over the nation trade graph
    // (supplier nation → customer nation, weight = line items).
    // Rank vector starts uniform (1/25); each pass is
    // edges ⋈ broadcast(rank) → re-aggregate by destination with
    // DECIMAL-quantized contribution sums; dangling mass follows the
    // simplified (non-redistributing) convention. 0.006 = (1−d)/25.
    "q_graph_pagerank" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val supp = Tables(s, dir, "supplier")
      val nation = Tables(s, dir, "nation")
      val edges0 = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("src"),
          col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      import org.apache.spark.sql.expressions.Window
      val edges = graft.CachedPlans.cache(edges0.withColumn("outw",
        sum(col("w")).over(Window.partitionBy(col("src")))))
      val nodes = nation.select(col("n_nationkey").as("node"),
        col("n_name"))
      var pr = nodes.select(col("node"), col("n_name"),
        lit(0.04).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(broadcast(pr.select(col("node"), col("pr"))),
            col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum((col("pr") * col("w") / col("outw"))
            .cast("decimal(28,14)")).cast("decimal(28,14)")
            .as("contrib"))
        pr = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"), col("n_name"),
            (lit(0.006) + lit(0.85) *
              coalesce(col("contrib").cast("double"), lit(0.0)))
              .as("pr"))
      }
      pr.select(col("n_name"), round(col("pr"), 6).as("pagerank"))
        .orderBy(col("n_name"))
    },

    // Common-neighbor / Jaccard link prediction on the co-supply
    // graph — "which supplier pairs SHOULD be trading partners":
    // score non-adjacent pairs by shared neighbors. The candidate
    // generator is the same wedge join as the triangle census
    // (Σ deg² work on the strength-pruned graph — the p95 prune is
    // what keeps the wedge space bounded at any scale); existing
    // edges leave via one anti join; Jaccard = cn/(deg_a+deg_b−cn)
    // needs only the node-sized degree table, broadcast twice.
    // Top-15 is sort+limit (TakeOrderedAndProject — each partition
    // forwards its own top-k).
    "q_link_prediction" -> { (s, dir) =>
      val e = graft.CachedPlans.cache(coSupplyEdges(s, dir))
      e.count()
      // adj feeds BOTH wedge-join sides and the degree table; cached
      // (r13) so the symmetrization runs once, not once per
      // reference, and the planner sees its exact materialized size
      // when picking the wedge-join strategy. One explode pass, not
      // a two-scan union (guide §2.4).
      val adj = graft.CachedPlans.cache(
        e.select(explode(array(
            struct(col("sa").as("c"), col("sb").as("v")),
            struct(col("sb").as("c"), col("sa").as("v")))).as("p"))
          .select(col("p.c").as("c"), col("p.v").as("v")))
      adj.count()
      val cand = adj.select(col("c"), col("v").as("a"))
        .join(adj.select(col("c").as("c2"), col("v").as("b")),
          col("c") === col("c2") && col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cn"))
        .join(e, col("a") === col("sa") && col("b") === col("sb"),
          "left_anti")
      val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("deg"))
      cand
        .join(broadcast(deg.select(col("c").as("a"),
          col("deg").as("dega"))), "a")
        .join(broadcast(deg.select(col("c").as("b"),
          col("deg").as("degb"))), "b")
        .select(col("a"), col("b"), col("cn"),
          round(col("cn") /
            (col("dega") + col("degb") - col("cn")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("cn").desc, col("a"), col("b"))
        .limit(15)
    },

    // k-core decomposition (k=3), three peeling rounds unrolled —
    // the standard dense-subgraph extraction before community or
    // influence analytics. The BASE edge list is cached once; each
    // round's subgraph is base edges filtered by BROADCAST semi
    // joins against the node-sized survivor set (never a new
    // materialized edge table — the first formulation eagerly cached
    // and counted per-round edge sets and measured 24.9 s at sf0.1;
    // the broadcast-filter chain over the one cached base runs the
    // same peel in ~2 s). The inter-round wire is survivor node
    // sets, so a 100× graph peels with the same plan until the core
    // itself outgrows a broadcast. Emits per-round
    // (n_nodes, n_edges, min_deg) — the convergence trace an
    // operator would iterate to fixpoint; three rounds pin the plan
    // shape and the oracle replays them as chained CTEs.
    "q_k_core" -> { (s, dir) =>
      val k = 3
      val base = graft.CachedPlans.cache(coSupplyEdges(s, dir))
      base.count()
      def stats(r: Int, deg: org.apache.spark.sql.DataFrame) =
        deg.agg(lit(r).cast("long").as("round"),
          count(lit(1)).as("n_nodes"),
          coalesce((sum(col("d")) / 2).cast("long"), lit(0L))
            .as("n_edges"),
          coalesce(min(col("d")), lit(0L)).as("min_deg"))
      // localCheckpoint each round's NODE-SIZED degree table (the
      // only inter-round state): the checkpoint truncates lineage,
      // so round r+1 is always one broadcast-filter over the cached
      // base — never a replay of the nested peel chain (lazy
      // chaining re-executed the broadcast subtrees and measured
      // 47 s at sf0.1; per-round edge caches measured 24.9 s; the
      // checkpointed-degree form runs the peel at base-build cost).
      // Checkpointing node-sized state is exactly what an iterative
      // graph engine does between supersteps.
      var edges = base
      var deg = degreeTable(edges, "d").localCheckpoint()
      val out = scala.collection.mutable.ArrayBuffer(stats(0, deg))
      for (r <- 1 to 3) {
        val keep = deg.where(col("d") >= k).select(col("v"))
        // both semi joins reference the IDENTICAL broadcast subtree
        // (same projection, different join condition), so Spark's
        // ReuseExchange builds the survivor broadcast once per round
        // instead of twice (r13; the old form aliased v to sa/sb
        // inside the broadcast, defeating the reuse match)
        edges = base
          .join(broadcast(keep), col("sa") === col("v"), "left_semi")
          .join(broadcast(keep), col("sb") === col("v"), "left_semi")
        deg = degreeTable(edges, "d").localCheckpoint()
        out += stats(r, deg)
      }
      out.reduce(_ unionAll _).orderBy(col("round"))
    },

    // Bounded-hop shortest paths (3 Bellman–Ford relaxations from
    // nation 0) over the trade graph, edge cost 1/weight — "how
    // cheaply does trade reach each market in ≤3 hops". Each
    // relaxation is one equi-join of the 25-row distance vector
    // against the edge list + a min aggregate: min is
    // association-free and each path cost is a FIXED-shape chain of
    // per-row IEEE additions, so three unrolled rounds are
    // bit-exact cross-engine with no quantization. The inter-round
    // wire is the node-sized distance vector (broadcast); at web
    // scale the same plan flips to a shuffle join on src — the
    // Pregel-in-relational-clothing pattern, same as PageRank.
    "q_graph_shortest_paths" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val supp = Tables(s, dir, "supplier")
      val nation = Tables(s, dir, "nation")
      // cached like PageRank's edge list: the distance vector
      // references it once per relaxation and the unrolled lineage
      // re-reads it ~2^rounds times without the cache
      val edges = graft.CachedPlans.cache(li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("src"),
          col("c_nationkey").as("dst"))
        .agg((lit(1.0) / count(lit(1))).as("cost")))
      val nodes = nation.select(col("n_nationkey").as("node"),
        col("n_name"))
      def merged(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =
        when(a.isNull, b).when(b.isNull, a)
          .otherwise(least(a, b))
      var dist = nodes.select(col("node"),
        when(col("node") === 0, lit(0.0)).as("dist"))
      for (_ <- 1 to 3) {
        val cand = edges
          .join(broadcast(dist.where(col("dist").isNotNull)),
            col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(min(col("dist") + col("cost")).as("cand"))
        dist = nodes
          .join(dist, Seq("node"))
          .join(cand, col("node") === col("dst"), "left")
          .select(col("node"), merged(col("dist"), col("cand"))
            .as("dist"))
      }
      nodes.join(dist, Seq("node"))
        .select(col("n_name"),
          round(col("dist"), 6).as("dist_3hop"),
          col("dist").isNotNull.as("reachable"))
        .orderBy(col("n_name"))
    })

  val oracles: Map[String, String] = Map(

    "q_graph_triangles" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
           FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
           GROUP BY 1, 2),
         thr AS (SELECT round(quantile_cont(w, 0.95), 6) AS thr FROM e0),
         e AS MATERIALIZED (SELECT sa, sb FROM e0, thr WHERE w >= thr),
         deg AS MATERIALIZED (
           SELECT v, count(*) AS deg FROM (
             SELECT sa AS v FROM e UNION ALL SELECT sb AS v FROM e)
           GROUP BY v),
         o AS MATERIALIZED (
           SELECT
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.sa < e.sb)
                  THEN e.sa ELSE e.sb END AS src,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.sa < e.sb)
                  THEN e.sb ELSE e.sa END AS dst
           FROM e JOIN deg da ON e.sa = da.v
                  JOIN deg db ON e.sb = db.v),
         wedge AS (
           SELECT p1.dst AS v, p2.dst AS w
           FROM o p1 JOIN o p2
             ON p1.src = p2.src AND p1.dst < p2.dst),
         closing AS (
           SELECT src AS v, dst AS w FROM o
           UNION ALL SELECT dst AS v, src AS w FROM o),
         tri AS (
           SELECT count(*) AS n_triangles
           FROM wedge JOIN closing USING (v, w)),
         stats AS (
           SELECT count(*) AS n_nodes,
             CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
             CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
           FROM deg)
         SELECT CAST(n_nodes AS BIGINT) AS n_nodes, n_edges, n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           round(3.0::DOUBLE * n_triangles / n_wedges, 6)
             AS clustering_coeff
         FROM stats, tri""",

    "q_graph_degree_dist" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem),
         e0 AS (
           SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
           FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
           GROUP BY 1, 2),
         thr AS (SELECT round(quantile_cont(w, 0.95), 6) AS thr FROM e0),
         e AS (SELECT sa, sb FROM e0, thr WHERE w >= thr),
         deg AS (
           SELECT v, count(*) AS deg FROM (
             SELECT sa AS v FROM e UNION ALL SELECT sb AS v FROM e)
           GROUP BY v)
         SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
           count(*) AS n_nodes,
           min(deg) AS min_deg, max(deg) AS max_deg
         FROM deg GROUP BY 1 ORDER BY bucket""",

    "q_graph_pagerank" ->
      """WITH e0 AS MATERIALIZED (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             count(*) AS w
           FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
         e AS MATERIALIZED (
           SELECT src, dst, w,
             sum(w) OVER (PARTITION BY src) AS outw
           FROM e0),
         n AS (SELECT n_nationkey AS node, n_name FROM nation),
         p0 AS (SELECT node, 0.04::DOUBLE AS pr FROM n),
         c1 AS (
           SELECT dst, CAST(sum(CAST(p.pr * e.w / e.outw
             AS DECIMAL(28,14))) AS DECIMAL(28,14)) AS contrib
           FROM e JOIN p0 p ON e.src = p.node GROUP BY dst),
         p1 AS MATERIALIZED (
           SELECT n.node,
             0.006 + 0.85 * coalesce(c1.contrib::DOUBLE, 0.0) AS pr
           FROM n LEFT JOIN c1 ON n.node = c1.dst),
         c2 AS (
           SELECT dst, CAST(sum(CAST(p.pr * e.w / e.outw
             AS DECIMAL(28,14))) AS DECIMAL(28,14)) AS contrib
           FROM e JOIN p1 p ON e.src = p.node GROUP BY dst),
         p2 AS MATERIALIZED (
           SELECT n.node,
             0.006 + 0.85 * coalesce(c2.contrib::DOUBLE, 0.0) AS pr
           FROM n LEFT JOIN c2 ON n.node = c2.dst),
         c3 AS (
           SELECT dst, CAST(sum(CAST(p.pr * e.w / e.outw
             AS DECIMAL(28,14))) AS DECIMAL(28,14)) AS contrib
           FROM e JOIN p2 p ON e.src = p.node GROUP BY dst),
         p3 AS (
           SELECT n.node,
             0.006 + 0.85 * coalesce(c3.contrib::DOUBLE, 0.0) AS pr
           FROM n LEFT JOIN c3 ON n.node = c3.dst)
         SELECT n.n_name, round(p3.pr, 6) AS pagerank
         FROM n JOIN p3 ON n.node = p3.node
         ORDER BY n.n_name""",

    "q_link_prediction" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
           FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
           GROUP BY 1, 2),
         thr AS (SELECT round(quantile_cont(w, 0.95), 6) AS thr FROM e0),
         e AS MATERIALIZED (SELECT sa, sb FROM e0, thr WHERE w >= thr),
         adj AS MATERIALIZED (
           SELECT sa AS c, sb AS v FROM e
           UNION ALL SELECT sb AS c, sa AS v FROM e),
         cand AS (
           SELECT a1.v AS a, a2.v AS b, count(*) AS cn
           FROM adj a1 JOIN adj a2 ON a1.c = a2.c AND a1.v < a2.v
           GROUP BY 1, 2),
         cand2 AS (
           SELECT c.a, c.b, c.cn FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM e
             WHERE e.sa = c.a AND e.sb = c.b)),
         deg AS MATERIALIZED (SELECT c, count(*) AS deg FROM adj GROUP BY 1)
         SELECT c2.a, c2.b, c2.cn,
           round(c2.cn / (da.deg + db.deg - c2.cn)::DOUBLE, 6)
             AS jaccard
         FROM cand2 c2
         JOIN deg da ON c2.a = da.c
         JOIN deg db ON c2.b = db.c
         ORDER BY cn DESC, a, b LIMIT 15""",

    // The peel chain e -> e1 -> e2 -> e3 references every CTE at
    // least twice (d_i reads e_i twice via UNION ALL; k_{i+1} reads
    // d_i twice via the IN pair). DuckDB inlines plain CTEs, so the
    // base pair join would re-execute O(3^rounds) times — at sf0.1
    // that spilled >35 GB and never finished. AS MATERIALIZED pins
    // each round to one evaluation (single-evaluation semantics the
    // Spark side gets from localCheckpoint).
    "q_k_core" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
           FROM lineitem),
         e0 AS MATERIALIZED (
           SELECT a.sk AS sa, b.sk AS sb, count(*) AS w
           FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
           GROUP BY 1, 2),
         thr AS (SELECT round(quantile_cont(w, 0.95), 6) AS thr FROM e0),
         e AS MATERIALIZED (SELECT sa, sb FROM e0, thr WHERE w >= thr),
         d0 AS MATERIALIZED (SELECT v, count(*) AS d FROM (
             SELECT sa AS v FROM e UNION ALL SELECT sb AS v FROM e)
           GROUP BY 1),
         r0 AS (SELECT CAST(0 AS BIGINT) AS round,
             count(*) AS n_nodes,
             coalesce(CAST(sum(d) / 2 AS BIGINT), 0) AS n_edges,
             CAST(coalesce(min(d), 0) AS BIGINT) AS min_deg
           FROM d0),
         k1 AS (SELECT v FROM d0 WHERE d >= 3),
         e1 AS MATERIALIZED (SELECT sa, sb FROM e
           WHERE sa IN (SELECT v FROM k1) AND sb IN (SELECT v FROM k1)),
         d1 AS MATERIALIZED (SELECT v, count(*) AS d FROM (
             SELECT sa AS v FROM e1 UNION ALL SELECT sb AS v FROM e1)
           GROUP BY 1),
         r1 AS (SELECT CAST(1 AS BIGINT) AS round,
             count(*) AS n_nodes,
             coalesce(CAST(sum(d) / 2 AS BIGINT), 0) AS n_edges,
             CAST(coalesce(min(d), 0) AS BIGINT) AS min_deg
           FROM d1),
         k2 AS (SELECT v FROM d1 WHERE d >= 3),
         e2 AS MATERIALIZED (SELECT sa, sb FROM e1
           WHERE sa IN (SELECT v FROM k2) AND sb IN (SELECT v FROM k2)),
         d2 AS MATERIALIZED (SELECT v, count(*) AS d FROM (
             SELECT sa AS v FROM e2 UNION ALL SELECT sb AS v FROM e2)
           GROUP BY 1),
         r2 AS (SELECT CAST(2 AS BIGINT) AS round,
             count(*) AS n_nodes,
             coalesce(CAST(sum(d) / 2 AS BIGINT), 0) AS n_edges,
             CAST(coalesce(min(d), 0) AS BIGINT) AS min_deg
           FROM d2),
         k3 AS (SELECT v FROM d2 WHERE d >= 3),
         e3 AS MATERIALIZED (SELECT sa, sb FROM e2
           WHERE sa IN (SELECT v FROM k3) AND sb IN (SELECT v FROM k3)),
         d3 AS MATERIALIZED (SELECT v, count(*) AS d FROM (
             SELECT sa AS v FROM e3 UNION ALL SELECT sb AS v FROM e3)
           GROUP BY 1),
         r3 AS (SELECT CAST(3 AS BIGINT) AS round,
             count(*) AS n_nodes,
             coalesce(CAST(sum(d) / 2 AS BIGINT), 0) AS n_edges,
             CAST(coalesce(min(d), 0) AS BIGINT) AS min_deg
           FROM d3)
         SELECT * FROM r0 UNION ALL SELECT * FROM r1
         UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
         ORDER BY round""",

    "q_graph_shortest_paths" ->
      """WITH e AS MATERIALIZED (
           SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(1.0 AS DOUBLE) / count(*) AS cost
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2),
         d0 AS (
           SELECT n_nationkey AS node,
             CASE WHEN n_nationkey = 0 THEN CAST(0.0 AS DOUBLE) END
               AS dist
           FROM nation),
         c1 AS (
           SELECT e.dst, min(d.dist + e.cost) AS cand
           FROM e JOIN d0 d ON e.src = d.node
           WHERE d.dist IS NOT NULL GROUP BY 1),
         d1 AS MATERIALIZED (
           SELECT d.node,
             CASE WHEN d.dist IS NULL THEN c.cand
                  WHEN c.cand IS NULL THEN d.dist
                  ELSE least(d.dist, c.cand) END AS dist
           FROM d0 d LEFT JOIN c1 c ON d.node = c.dst),
         c2 AS (
           SELECT e.dst, min(d.dist + e.cost) AS cand
           FROM e JOIN d1 d ON e.src = d.node
           WHERE d.dist IS NOT NULL GROUP BY 1),
         d2 AS MATERIALIZED (
           SELECT d.node,
             CASE WHEN d.dist IS NULL THEN c.cand
                  WHEN c.cand IS NULL THEN d.dist
                  ELSE least(d.dist, c.cand) END AS dist
           FROM d1 d LEFT JOIN c2 c ON d.node = c.dst),
         c3 AS (
           SELECT e.dst, min(d.dist + e.cost) AS cand
           FROM e JOIN d2 d ON e.src = d.node
           WHERE d.dist IS NOT NULL GROUP BY 1),
         d3 AS (
           SELECT d.node,
             CASE WHEN d.dist IS NULL THEN c.cand
                  WHEN c.cand IS NULL THEN d.dist
                  ELSE least(d.dist, c.cand) END AS dist
           FROM d2 d LEFT JOIN c3 c ON d.node = c.dst)
         SELECT n.n_name, round(d3.dist, 6) AS dist_3hop,
           d3.dist IS NOT NULL AS reachable
         FROM nation n JOIN d3 ON n.n_nationkey = d3.node
         ORDER BY n.n_name""")
}
