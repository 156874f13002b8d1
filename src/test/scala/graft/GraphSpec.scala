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
    val row = q("q_graph_triangles").collect().head
    // independent recount: collect the (small-SF) strong-tie edges
    // from the shared builder and intersect adjacency sets per edge
    val edges = graft.queries.GraphQueries
      .coSupplyEdges(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val bruteTri = edges.map { case (x, y) =>
      (adj(x) & adj(y)).size
    }.sum / 3 // each triangle counted once per edge
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

  test("q_k_core: monotone peeling, final core meets the degree bar") {
    val rows = q("q_k_core").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 4)
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.zip(nodes.tail).forall { case (x, y) => y <= x },
      s"node count must shrink: ${nodes.mkString(",")}")
    assert(edges.zip(edges.tail).forall { case (x, y) => y <= x },
      s"edge count must shrink: ${edges.mkString(",")}")
    val last = rows.last
    // after peeling at k=3 the surviving min degree can still dip
    // below k (peeling is iterative), but an EMPTY core reports 0s
    if (last.getAs[Long]("n_nodes") == 0) {
      assert(last.getAs[Long]("n_edges") == 0)
      assert(last.getAs[Long]("min_deg") == 0)
    } else {
      assert(last.getAs[Long]("min_deg") >= 1)
    }
  }

  test("q_graph_shortest_paths: source at 0, costs positive, monotone reach") {
    val rows = q("q_graph_shortest_paths").collect()
    assert(rows.length == 25)
    val bySrc = rows.filter(!_.isNullAt(1))
      .map(r => r.getAs[String]("n_name") -> r.getAs[Double]("dist_3hop"))
    assert(bySrc.nonEmpty)
    // the source nation itself must read 0 (nation 0 = ALGERIA)
    val zero = rows.filter(r => !r.isNullAt(1) &&
      r.getAs[Double]("dist_3hop") == 0.0)
    assert(zero.length == 1, "exactly the source sits at distance 0")
    rows.foreach { r =>
      val reach = r.getAs[Boolean]("reachable")
      assert(reach == !r.isNullAt(1),
        s"reachable flag must mirror non-null distance: $r")
      if (!r.isNullAt(1)) assert(r.getAs[Double]("dist_3hop") >= 0.0)
    }
  }
}
