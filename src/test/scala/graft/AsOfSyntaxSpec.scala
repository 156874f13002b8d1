package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfSyntax

/** The injected `ASOF JOIN` SQL surface: text-level rewrite
  * correctness (quote/comment/paren awareness), semantic lowering
  * (inner vs left outer), agreement with the marker-function path,
  * and loud failure on the unsupported shapes.
  *
  * The shared test session is built with
  * `spark.sql.extensions=graft.GraftExtensions`, so `spark.sql` here
  * goes through [[graft.plans.GraftSqlParser]] exactly as a user
  * session would.
  */
class AsOfSyntaxSpec extends SparkSpec {
  import spark.implicits._

  private def events() = {
    Tables(spark, sf(), "events")
      .createOrReplaceTempView("asof_syn_events")
  }

  test("rewrite wraps the ON condition and drops ASOF") {
    val got = AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e ON p.k = e.k AND p.ts >= e.ts WHERE p.k > 0")
    assert(got ===
      "SELECT * FROM p  JOIN e ON asof_cond( p.k = e.k AND p.ts >= e.ts ) WHERE p.k > 0")
  }

  test("rewrite is quote-, comment- and paren-aware") {
    // 'ASOF JOIN' inside a string literal and a comment: untouched
    val s1 = "SELECT 'ASOF JOIN', x -- ASOF JOIN\nFROM t"
    assert(AsOfSyntax.rewrite(s1) === s1)
    // a relation actually named asof directly after FROM: untouched
    val s2 = "SELECT * FROM asof JOIN e ON asof.k = e.k"
    assert(AsOfSyntax.rewrite(s2) === s2)
    // left(...) the FUNCTION inside the condition must not end it
    val got = AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e ON left(p.k, 2) = left(e.k, 2) AND p.ts >= e.ts ORDER BY 1")
    assert(got.contains(
      "ON asof_cond( left(p.k, 2) = left(e.k, 2) AND p.ts >= e.ts )"))
    // condition ends at the subquery's closing paren
    val sub = AsOfSyntax.rewrite(
      "SELECT * FROM (SELECT * FROM p ASOF JOIN e ON p.k = e.k AND p.ts >= e.ts) q")
    assert(sub.contains("ON asof_cond( p.k = e.k AND p.ts >= e.ts) )"))
  }

  test("chained ASOF JOINs: the boundary edits compose, both rewrite") {
    // the first join's close-paren insert lands at exactly the
    // second join's ASOF-delete position — the stable pos-only sort
    // applied the insert first and the delete then swallowed it plus
    // half the keyword (")" lost, a stray "OF" left behind)
    val got = AsOfSyntax.rewrite(
      "SELECT * FROM a ASOF JOIN b ON a.k = b.k AND a.ts >= b.ts " +
        "ASOF JOIN c ON a.k = c.k AND a.ts >= c.ts")
    assert(!got.contains("OF "), s"corrupted rewrite: $got")
    assert(got.contains("JOIN b ON asof_cond( a.k = b.k AND a.ts >= b.ts ) ") &&
      got.contains("JOIN c ON asof_cond( a.k = c.k AND a.ts >= c.ts)"),
      s"got: $got")
    // and the chained query actually runs end-to-end
    events()
    val df = spark.sql(
      """SELECT q.event_id FROM asof_syn_events q
         ASOF JOIN asof_syn_events b ON q.user_id = b.user_id AND q.ts >= b.ts
         ASOF JOIN asof_syn_events c ON q.user_id = c.user_id AND q.ts >= c.ts
         LIMIT 5""")
    assert(df.count() == 5)
  }

  test("relation-name positions survive: AS asof alias, asof after open paren") {
    // aliased relation named asof: a plain equi-join, not ASOF syntax
    val s1 = "SELECT * FROM p AS asof JOIN e ON asof.k = e.k"
    assert(AsOfSyntax.rewrite(s1) === s1)
    // relation named asof directly after an opening paren (the lexer
    // emits no '(' token — the paren shows as a depth step, which
    // the old `prev != "("` comparison could never see)
    val s2 = "SELECT * FROM a JOIN (asof JOIN b ON asof.k = b.k) ON a.k = b.k"
    assert(AsOfSyntax.rewrite(s2) === s2)
  }

  test("ON condition terminates before NATURAL / LATERAL VIEW / PIVOT") {
    // NATURAL followed by another join-prefix word (INNER/CROSS/...)
    // previously got swallowed INTO the asof condition
    val nat = AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e ON p.k = e.k AND p.ts >= e.ts " +
        "NATURAL INNER JOIN c")
    assert(nat.contains(
      "ON asof_cond( p.k = e.k AND p.ts >= e.ts ) NATURAL INNER JOIN c"),
      s"NATURAL INNER swallowed: $nat")
    val lat = AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e ON p.k = e.k AND p.ts >= e.ts " +
        "LATERAL VIEW explode(xs) t AS x")
    assert(lat.contains(
      "ON asof_cond( p.k = e.k AND p.ts >= e.ts ) LATERAL VIEW"),
      s"LATERAL VIEW swallowed: $lat")
    val piv = AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e ON p.k = e.k AND p.ts >= e.ts " +
        "PIVOT (sum(v) FOR s IN ('a'))")
    assert(piv.contains(
      "ON asof_cond( p.k = e.k AND p.ts >= e.ts ) PIVOT"),
      s"PIVOT swallowed: $piv")
  }

  test("INNER JOIN with the asof_on marker == ASOF JOIN") {
    // the marker rewrite must accept Inner joins: on a plain session
    // EliminateOuterJoin can convert the LeftOuter marker join to
    // Inner before the rewrite runs (a null-filtering predicate
    // licenses it), and a user can also write INNER directly
    events()
    val viaMarker = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts AS err_ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id
      FROM p JOIN e ON asof_on(p.user_id = e.user_id, p.ts, e.err_ts)
      ORDER BY p.event_id""").collect()
    val viaAsof = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts AS err_ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id
      FROM p ASOF JOIN e ON p.user_id = e.user_id AND p.ts >= e.err_ts
      ORDER BY p.event_id""").collect()
    assert(viaMarker.nonEmpty && viaMarker.sameElements(viaAsof))
  }

  test("ASOF LEFT JOIN via SQL == the asof_on marker path") {
    events()
    val syntax = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id, unix_millis(e.ts) AS err_ms
      FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
      ORDER BY p.event_id""").collect()
    val marker = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts AS err_ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id, unix_millis(e.err_ts) AS err_ms
      FROM p LEFT JOIN e ON asof_on(p.user_id = e.user_id, p.ts, e.err_ts)
      ORDER BY p.event_id""").collect()
    assert(syntax.nonEmpty,
      "both lowering paths empty — the parity is vacuous")
    assert(syntax.sameElements(marker))
  }

  test("inner ASOF JOIN drops unmatched rows; mirrored <= works") {
    events()
    val inner = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id
      FROM p ASOF JOIN e ON e.ts <= p.ts AND p.user_id = e.user_id
      ORDER BY p.event_id""").collect()
    val outer = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id
      FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts
      ORDER BY p.event_id""").collect()
    assert(inner.sameElements(outer.filter(!_.isNullAt(1))))
    assert(inner.length < outer.length) // the data does have unmatched rows
  }

  test("unsupported shapes fail loudly") {
    events()
    def q(cond: String): Unit = spark.sql(s"""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id FROM p ASOF JOIN e ON $cond""").queryExecution.analyzed
    val fwd = intercept[IllegalArgumentException](
      q("p.user_id = e.user_id AND p.ts <= e.ts"))
    assert(fwd.getMessage.contains("forward-looking"))
    val noEq = intercept[IllegalArgumentException](
      q("p.ts >= e.ts"))
    assert(noEq.getMessage.contains("key equality"))
    val noIneq = intercept[IllegalArgumentException](
      q("p.user_id = e.user_id"))
    assert(noIneq.getMessage.contains("inequality"))
    val noOn = intercept[IllegalArgumentException](AsOfSyntax.rewrite(
      "SELECT * FROM p ASOF JOIN e WHERE x = 1"))
    assert(noOn.getMessage.contains("ON"))
  }

  test("stream-static asOfStatic == batch composition on events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables(spark, sf(), "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id").cast("string").as("err"))
    // batch truth via the union+window composition
    val purchasesB = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("tms"))
    val want = graft.operators.AsOfJoin.asOf(
        purchasesB, errors.withColumnRenamed("tms", "tms2")
          .withColumnRenamed("user_id", "uid2")
          .toDF("uid2", "tms2", "err")
          .select(col("uid2").as("user_id"), col("tms2").as("tms"),
            col("err")),
        "user_id", "tms", Seq("err"))
      .select(col("event_id"), col("err")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    // streamed through the broadcast index
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long)]
    val q = graft.operators.AsOfJoin.asOfStatic(
        input.toDF().toDF("event_id", "user_id", "tms"),
        errors, "user_id", "tms", "err", "err")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      input.addData(purchasesB.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
      q.processAllAvailable()
      val got = spark.table("asof_stream")
        .select(col("event_id"), col("err")).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      assert(got.sameElements(want))
      assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty))
    } finally q.stop()
  }

  test("asOfStatic fails fast on an oversized right side") {
    val ev = Tables(spark, sf(), "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id").cast("string").as("err"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("tms"))
    val oom = intercept[IllegalArgumentException](
      graft.operators.AsOfJoin.asOfStatic(
        purchases, errors, "user_id", "tms", "err", "err",
        maxRows = 1L))
    // the error is actionable: it names BOTH executor-side fallbacks
    assert(oom.getMessage.contains("envelope"),
      s"got: ${oom.getMessage}")
    assert(oom.getMessage.contains("AsOfJoin.asOf") &&
      oom.getMessage.contains("ASOF JOIN"), s"got: ${oom.getMessage}")
  }

  test("the lowered plan is the native merge exec (no cartesian)") {
    events()
    val df = spark.sql("""
      WITH p AS (SELECT event_id, user_id, ts FROM asof_syn_events
                 WHERE event_type = 'purchase'),
           e AS (SELECT user_id, ts, event_id AS err_id
                 FROM asof_syn_events WHERE event_type = 'error')
      SELECT p.event_id, e.err_id
      FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts""")
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("AsOfMergeJoin"), s"expected merge exec in:\n$exec")
    assert(!exec.contains("Cartesian"))
  }
}
