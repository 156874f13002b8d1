package graft

import graft.plans.QualifySyntax

/** The injected QUALIFY sugar: rewrite mechanics, semantic agreement
  * with the explicit subquery formulation, clause ordering (ORDER
  * BY/LIMIT run after the filter), nesting, and loud failures.
  */
class QualifySpec extends SparkSpec {
  import spark.implicits._

  test("rewrite shape: wrap, flag column, clauses stay outside") {
    val got = QualifySyntax.rewrite(
      "SELECT a, b FROM t QUALIFY row_number() OVER (ORDER BY b) <= 2 ORDER BY a LIMIT 5")
    assert(got === "SELECT * EXCEPT (__graft_q) FROM (SELECT a, b , " +
      "(row_number() OVER (ORDER BY b) <= 2) AS __graft_q FROM t " +
      ") WHERE __graft_q ORDER BY a LIMIT 5")
  }

  test("rewrite leaves QUALIFY-free text and strings untouched") {
    val s1 = "SELECT 'QUALIFY' AS q FROM t -- QUALIFY rn <= 2"
    assert(QualifySyntax.rewrite(s1) === s1)
  }

  test("QUALIFY == explicit subquery + filter") {
    Tables.registerViews(spark, sf())
    val q = spark.sql("""
      SELECT o_orderstatus, o_orderkey
      FROM orders
      QUALIFY rank() OVER (PARTITION BY o_orderstatus
        ORDER BY o_totalprice DESC) <= 2
      ORDER BY o_orderstatus, o_orderkey""").collect()
    val manual = spark.sql("""
      SELECT o_orderstatus, o_orderkey FROM (
        SELECT o_orderstatus, o_orderkey,
          rank() OVER (PARTITION BY o_orderstatus
            ORDER BY o_totalprice DESC) AS rnk
        FROM orders) WHERE rnk <= 2
      ORDER BY o_orderstatus, o_orderkey""").collect()
    assert(q.sameElements(manual))
    assert(q.nonEmpty)
  }

  test("LIMIT applies after the qualify filter") {
    Tables.registerViews(spark, sf())
    val rows = spark.sql("""
      SELECT o_orderkey FROM orders
      QUALIFY row_number() OVER (ORDER BY o_orderkey) <= 10
      ORDER BY o_orderkey LIMIT 4""").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(0)).toSeq ==
      spark.sql("SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 4")
        .collect().map(_.getLong(0)).toSeq)
  }

  test("QUALIFY in a subquery wraps only that scope") {
    Tables.registerViews(spark, sf())
    val n = spark.sql("""
      SELECT count(*) AS n FROM (
        SELECT o_orderstatus FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_orderstatus
          ORDER BY o_orderkey) = 1)""").head().getLong(0)
    val statuses = spark.sql(
      "SELECT count(DISTINCT o_orderstatus) FROM orders").head().getLong(0)
    assert(n == statuses)
  }

  test("works over aggregates (post-GROUP BY window)") {
    Tables.registerViews(spark, sf())
    val top = spark.sql("""
      SELECT o_orderstatus, count(*) AS cnt FROM orders
      GROUP BY o_orderstatus
      QUALIFY rank() OVER (ORDER BY count(*) DESC) = 1""").collect()
    assert(top.length >= 1)
    val maxCnt = spark.sql(
      "SELECT count(*) c FROM orders GROUP BY o_orderstatus ORDER BY c DESC")
      .head().getLong(0)
    assert(top.forall(_.getLong(1) == maxCnt))
  }

  test("DISTINCT ON == groupBy max_by (latest-per-key grammar)") {
    Tables.registerViews(spark, sf())
    val got = spark.sql("""
      SELECT DISTINCT ON (user_id) user_id, event_id, value
      FROM events
      ORDER BY user_id, value DESC, event_id""").collect()
    val want = spark.sql("""
      SELECT user_id,
        min_by(event_id, struct(-value, event_id)) AS event_id,
        max(value) AS value
      FROM events GROUP BY user_id
      ORDER BY user_id, value DESC, event_id""").collect()
    assert(got.length == want.length)
    // per-key pick agrees with the aggregate formulation
    assert(got.map(r => (r.getLong(0), r.getLong(1)))
      .sameElements(want.map(r => (r.getLong(0), r.getLong(1)))))
  }

  test("DISTINCT ON without ORDER BY fails loudly") {
    val e = intercept[IllegalArgumentException](
      graft.plans.DistinctOnSyntax.rewrite(
        "SELECT DISTINCT ON (k) k, v FROM t"))
    assert(e.getMessage.contains("ORDER BY"))
    // plain DISTINCT (no ON) is untouched
    val s = "SELECT DISTINCT a FROM t ORDER BY a"
    assert(graft.plans.DistinctOnSyntax.rewrite(s) === s)
  }

  test("star-EXCLUDE maps to star-EXCEPT; identifiers untouched") {
    assert(graft.plans.ExcludeSyntax.rewrite(
      "SELECT * EXCLUDE (a, b) FROM t") ===
      "SELECT * EXCEPT (a, b) FROM t")
    assert(graft.plans.ExcludeSyntax.rewrite(
      "SELECT t.* EXCLUDE (a) FROM t") ===
      "SELECT t.* EXCEPT (a) FROM t")
    // a column named exclude stays a column
    val s = "SELECT exclude FROM t WHERE exclude > 1"
    assert(graft.plans.ExcludeSyntax.rewrite(s) === s)
    Tables.registerViews(spark, sf())
    val cols = spark.sql(
      "SELECT * EXCLUDE (o_totalprice, o_orderdate) FROM orders LIMIT 1")
      .columns.toSeq
    assert(!cols.contains("o_totalprice") && !cols.contains("o_orderdate")
      && cols.contains("o_orderkey"))
  }

  test("unsupported shapes fail loudly") {
    val dis = intercept[IllegalArgumentException](QualifySyntax.rewrite(
      "SELECT DISTINCT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"))
    assert(dis.getMessage.contains("DISTINCT"))
    val noFrom = intercept[IllegalArgumentException](QualifySyntax.rewrite(
      "SELECT 1 QUALIFY x = 1"))
    assert(noFrom.getMessage.contains("FROM"))
  }
}
