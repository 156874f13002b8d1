package graft

import org.apache.spark.sql.functions._

/** Gates for the graph family (GraphQueries): the triangle census is
  * cross-checked against an independent brute-force count on the
  * small SF, and PageRank against its conservation law (total mass
  * bounded by 1, every node holds at least the teleport floor).
  */
class GraphSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_graph_triangles: matches a brute-force adjacency count") {
    // sf0.01, not the default sf0.001: the tiny graph's pruned edge
    // list closes no triangles, which made the 0 == 0 cross-check
    // vacuous (a census regression could not fail it)
    val row = SparkEntry.queries("q_graph_triangles")(spark, sf("0.01"))
      .collect().head
    // independent recount: collect the strong-tie edges from the
    // shared builder and intersect adjacency sets per edge
    val edges = graft.queries.GraphQueries
      .coSupplyEdges(spark, sf("0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val bruteTri = edges.map { case (x, y) =>
      (adj(x) & adj(y)).size
    }.sum / 3 // each triangle counted once per edge
    // non-vacuity: an edge-builder regression that empties the graph
    // would make 0 == 0 pass (and NULL clustering_coeff unboxes to
    // 0.0, inside the range check)
    assert(edges.nonEmpty, "strong-tie edge fixture is empty")
    assert(bruteTri > 0, "fixture has no triangles — cross-check vacuous")
    assert(row.getAs[Long]("n_triangles") == bruteTri,
      s"triangle count ${row.getAs[Long]("n_triangles")} != brute $bruteTri")
    assert(row.getAs[Long]("n_edges") == edges.length)
    val cc = row.getAs[Double]("clustering_coeff")
    assert(cc >= 0.0 && cc <= 1.0, s"clustering coeff out of range: $cc")
  }

  test("q_graph_pagerank: teleport floor and bounded total mass") {
    val rows = q("q_graph_pagerank").collect()
    assert(rows.length == 25) // one per nation
    val prs = rows.map(_.getAs[Double]("pagerank"))
    // every node keeps at least the (1−d)/n teleport share
    assert(prs.forall(_ >= 0.006 - 1e-9), prs.min.toString)
    // dangling mass is dropped (simplified convention), never
    // created: teleport floor ≤ total ≤ 1
    assert(prs.sum <= 1.0 + 1e-6, s"mass ${prs.sum} > 1")
    assert(prs.sum >= 25 * 0.006 - 1e-6,
      s"mass ${prs.sum} below the teleport floor")
    // the propagation step must actually move mass: both degenerate
    // extremes pass the conservation law alone AND are perfectly
    // UNIFORM (zero iterations → every rank 0.04; every contribution
    // dropped → every rank at the 0.006 floor). The trade graph is
    // irregular, so real iterations must spread the ranks
    assert(prs.max > prs.min * 1.5,
      s"ranks uniform — propagation inert: [${prs.min}, ${prs.max}]")
    // and some node must sit strictly above the pure-teleport floor
    assert(prs.max > 0.006 * 1.5,
      s"all mass at the teleport floor: max ${prs.max}")
  }

  test("q_link_prediction: predictions are non-edges with valid scores") {
    val rows = q("q_link_prediction").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val edges = graft.queries.GraphQueries.coSupplyEdges(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      assert(a < b, s"pair not canonical: $r")
      assert(!edges.contains((a, b)),
        s"predicted pair is already an edge: $r")
      assert(r.getAs[Long]("cn") >= 1)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $r")
    }
    // ranked by common neighbors desc
    val cns = rows.map(_.getAs[Long]("cn"))
    assert(cns.zip(cns.tail).forall { case (x, y) => x >= y })
  }

  test("q_k_core: rounds replay the exact driver-side peel") {
    // Monotonicity alone cannot fail for a NO-OP peel (the dense
    // co-supply graph's 3-core is often the whole graph, so every
    // round legitimately repeats round 0 — and a broken survivor
    // filter produces the same picture). Replay the peel exactly on
    // the collected edge list and require all four round rows to
    // match bit-for-bit.
    val rows = q("q_k_core").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 4)
    val base = graft.queries.GraphQueries.coSupplyEdges(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(base.nonEmpty, "edge fixture is empty — replay vacuous")
    def degrees(es: Seq[(Long, Long)]): Map[Long, Long] =
      es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    var es = base
    val expected = (0 to 3).map { r =>
      if (r > 0) {
        val keep = degrees(es).filter(_._2 >= 3).keySet
        es = es.filter { case (a, b) => keep(a) && keep(b) }
      }
      val d = degrees(es)
      (r.toLong, d.size.toLong,
        if (d.isEmpty) 0L else d.values.sum / 2,
        if (d.isEmpty) 0L else d.values.min)
    }
    val got = rows.map(r => (r.getAs[Long]("round"),
      r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("min_deg"))).toSeq
    assert(got == expected,
      s"peel rounds diverge from the exact replay:\n got $got\n exp $expected")
  }

  test("q_graph_shortest_paths: distances replay 3 exact relaxations") {
    // The flag/zero/positivity checks alone could not fail a broken
    // relaxation (reachable mirrors the same expression it is
    // derived from). Collect the 25-node trade graph and run the
    // three Bellman–Ford rounds in plain Scala; every per-nation
    // distance must match to the query's 6-decimal rounding.
    val rows = q("q_graph_shortest_paths").collect()
    assert(rows.length == 25)
    val zero = rows.filter(r => !r.isNullAt(1) &&
      r.getAs[Double]("dist_3hop") == 0.0)
    assert(zero.length == 1, "exactly the source sits at distance 0")
    val li = Tables(spark, sf(), "lineitem")
    val edges = li
      .join(Tables(spark, sf(), "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sf(), "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf(), "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg((lit(1.0) / count(lit(1))).as("cost"))
      .collect().map(r => (r.getAs[Number]("src").intValue,
        r.getAs[Number]("dst").intValue, r.getAs[Double]("cost")))
    assert(edges.nonEmpty)
    var dist = Map(0 -> 0.0)
    for (_ <- 1 to 3) {
      val cand = edges.flatMap { case (s, d, c) =>
        dist.get(s).map(x => d -> (x + c))
      }.groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).min }
      dist = (dist.keySet ++ cand.keySet).map { n =>
        n -> math.min(dist.getOrElse(n, Double.MaxValue),
          cand.getOrElse(n, Double.MaxValue))
      }.toMap
    }
    val names = Tables(spark, sf(), "nation")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getAs[Number]("n_nationkey").intValue ->
        r.getAs[String]("n_name")).toMap
    rows.foreach { r =>
      val name = r.getAs[String]("n_name")
      val key = names.collectFirst { case (k, v) if v == name => k }.get
      val expected = dist.get(key)
      if (r.isNullAt(1)) {
        assert(expected.isEmpty, s"$name reachable in replay but null: $r")
        assert(!r.getAs[Boolean]("reachable"))
      } else {
        assert(expected.isDefined, s"$name unreachable in replay: $r")
        val got = r.getAs[Double]("dist_3hop")
        assert(math.abs(got -
            BigDecimal(expected.get).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"$name: got $got, replay ${expected.get}")
        assert(r.getAs[Boolean]("reachable"))
      }
    }
  }
}
