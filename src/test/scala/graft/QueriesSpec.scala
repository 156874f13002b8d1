package graft

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{
  GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.types._

/** Smoke-level regression: every declared query runs at sf0.001,
  * returns rows, and its oracle entry (if any) exists. Exact value
  * agreement with DuckDB is checked by the driver (and locally by
  * scripts/selfcheck.py) — this spec guards schema/runtime breakage.
  *
  * Output-type lint: no query may emit a DecimalType column. The
  * driver's hash canonicalization diverges from DuckDB on decimal128
  * result columns (round-7 verdict: 19 cell-exact queries failed
  * hash-only, every one with a DECIMAL output). The repo idiom is
  * DECIMAL *internally* (order-independent sums) and
  * round(cast(double), k) on the output surface; this lint makes the
  * discipline corpus-wide and permanent. Allowlist intentionally
  * empty.
  *
  * Sort-totality lint: the driver's compare is positional, so a
  * query's final ORDER BY must either be a total order over the
  * output or tie only on bit-identical rows — otherwise both engines
  * return valid-but-different orders and the hash diverges. This is
  * the sf1-soak class that hit q_scan_project/q_unpivot: the testdata
  * duplicates (l_orderkey, l_linenumber) pairs, and at sf<=0.1 both
  * engines *happened* to read one file in one stable order. The lint
  * is data-dependent (ties must exist at the tested SF to be seen),
  * so it complements — not replaces — the per-round large-SF soak.
  */
class QueriesSpec extends SparkSpec {

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType     => true
    case s: StructType      => s.fields.exists(f => hasDecimal(f.dataType))
    case a: ArrayType       => hasDecimal(a.elementType)
    case m: MapType         => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case _                  => false
  }

  /** The Sort that determines final output order, if any: the
    * outermost global Sort reachable through order-preserving nodes.
    */
  private def finalSort(p: LogicalPlan): Option[Sort] = p match {
    case s: Sort if s.global => Some(s)
    case pr: Project         => finalSort(pr.child)
    case gl: GlobalLimit     => finalSort(gl.child)
    case ll: LocalLimit      => finalSort(ll.child)
    case _                   => None
  }

  /** Structural equality for Row cells (Array[Byte] and nested
    * collections compare by value, not reference). */
  private def canon(v: Any): Any = v match {
    case b: Array[Byte]                  => b.toSeq
    case r: org.apache.spark.sql.Row     => r.toSeq.map(canon)
    case a: scala.collection.Seq[_]      => a.map(canon)
    case m: scala.collection.Map[_, _]   =>
      m.toSeq.map { case (k, x) => (canon(k), canon(x)) }
        .sortBy(_.toString())
    case x                               => x
  }

  /** None = no final Sort, or total order holds; Some(msg) = ties on
    * the final sort key contain non-identical rows. */
  private def sortTotalityViolation(
      df: org.apache.spark.sql.DataFrame,
      rows: Array[org.apache.spark.sql.Row]): Option[String] =
    finalSort(df.queryExecution.analyzed).flatMap { s =>
      sortsInspected += 1
      val outIdx = df.queryExecution.analyzed.output
        .map(_.exprId).zipWithIndex.toMap
      val keyIdx = s.order.map(_.child).collect {
        case a: Attribute if outIdx.contains(a.exprId) =>
          outIdx(a.exprId)
      }
      // order expressions that are computed or not in the output
      // can't anchor a positional compare mechanically; the sort
      // keys that ARE output columns must then carry the totality
      // on their own, so the check below (on keyIdx only) stays
      // conservative-correct: a hidden unique tiebreak column
      // would need an allowlist entry here, none exist today.
      val byKey = rows.groupBy(r => keyIdx.map(i => canon(r.get(i))))
      val badTies = byKey.filter { case (_, g) =>
        g.iterator.map(r => canon(r)).toSet.size > 1
      }
      if (badTies.isEmpty) None
      else Some(
        s"final ORDER BY is not a total order over the " +
          s"output — ${badTies.size} sort-key group(s) contain " +
          "non-identical rows (first key: " +
          s"${badTies.head._1.mkString(",").take(120)}). Extend " +
          "the ORDER BY (query AND oracle) to all output columns " +
          "or a unique key — the driver's compare is positional " +
          "(sf1-soak class 4, DESIGN.md)")
    }

  private var sortsInspected = 0

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sort-totality lint fires on a non-total ORDER BY " +
      "(negative control)") {
    import spark.implicits._
    val bad = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .orderBy("k")
    val v = sortTotalityViolation(bad, bad.collect())
    assert(v.isDefined, "lint missed a tie group with differing rows")
    val good = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .orderBy("k", "v")
    assert(sortTotalityViolation(good, good.collect()).isEmpty)
    // identical full rows tied on the key are interchangeable under
    // a positional compare — allowed, not flagged
    val dupOk = Seq((1, "a"), (1, "a")).toDF("k", "v").orderBy("k")
    assert(sortTotalityViolation(dupOk, dupOk.collect()).isEmpty)
    sortsInspected -= 3 // controls don't count toward corpus coverage
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs, returns rows, no DECIMAL output, " +
        "total final sort") {
      val df = fn(spark, sf())
      assert(df.columns.nonEmpty)
      val dec = df.schema.fields
        .filter(f => hasDecimal(f.dataType)).map(_.name)
      assert(dec.isEmpty,
        s"$name emits DECIMAL column(s) ${dec.mkString(", ")} — " +
          "cast the output to round(x.cast(\"double\"), k) in query " +
          "AND oracle (driver decimal-hash gate, VERDICT r7)")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      sortTotalityViolation(df, rows).foreach(v => fail(s"$name: $v"))
    }
  }

  // declared AFTER the per-query tests: ScalaTest runs tests in
  // declaration order, so the counter is final here. Guards the
  // finalSort traversal against plan-shape rot: if a Spark upgrade
  // (or a refactor) stops the pattern matching, every per-query lint
  // above silently becomes a no-op — this floor makes that loud.
  // 100 is far below the actual count (most corpus queries end in an
  // explicit orderBy) but far above the zero that rot would produce.
  test("sort-totality lint inspected a sane fraction of the corpus") {
    assert(sortsInspected >= 100,
      s"finalSort matched only $sortsInspected/240 queries — the " +
        "traversal no longer recognizes the corpus' plan shapes")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
