package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** Lint: a `Window` with no partition spec serializes its entire
  * input through ONE task — acceptable only on a bounded
  * micro-domain (a post-aggregate, a limit, or a literal-sized local
  * relation), never on a raw table. The six existing sites all
  * qualify (BH ladder ≤5 rows, χ² total 1 row, Lorenz deciles 10,
  * KMV merged sketch ≤2k, skyline distinct-price cummax, RRF
  * pre-limited ≤50 — VERDICT r8 §wrong #2); this gate stops a
  * seventh unbounded one from landing silently.
  */
class GlobalWindowLintSpec extends SparkSpec {

  /** True iff every leaf-to-here path in `p` passes through a
    * cardinality reducer (Aggregate / Limit / small local relation),
    * i.e. the subtree feeding a global window cannot be row-scale.
    * Deduplicate (logical DISTINCT) counts: it rewrites to Aggregate
    * only later in some paths.
    */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _: Deduplicate => true
    case l: LeafNode => l.maxRows.exists(_ <= 10000)
    // A join MULTIPLIES cardinality: two <=10k bounded inputs can
    // produce 1e8 rows, so "all children bounded" is not enough
    // (ADVICE r9). Bounded only when the node's own maxRows is known
    // small, when a semi/anti join's left side drives cardinality,
    // or when one side is provably single-row (a grand-total
    // aggregate) so the other side alone drives the output.
    case j: Join =>
      j.maxRows.exists(_ <= 10000) || (j.joinType match {
        case org.apache.spark.sql.catalyst.plans.LeftSemi |
             org.apache.spark.sql.catalyst.plans.LeftAnti =>
          bounded(j.left)
        case _ =>
          (j.left.maxRows.exists(_ <= 1) && bounded(j.right)) ||
          (j.right.maxRows.exists(_ <= 1) && bounded(j.left))
      })
    // A generator (explode/posexplode/inline) multiplies rows by an
    // unknown per-row factor — bounded only if Catalyst can bound
    // the node itself (it usually can't).
    case g: Generate => g.maxRows.exists(_ <= 10000)
    case other =>
      other.children.nonEmpty && other.children.forall(bounded)
  }

  private def unboundedGlobalWindows(p: LogicalPlan): Seq[Window] =
    p.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }

  test("lint detects a global window over a raw table (negative control)") {
    val raw = Tables(spark, sf(), "lineitem")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"))))
    val flagged = unboundedGlobalWindows(raw.queryExecution.optimizedPlan)
    assert(flagged.nonEmpty,
      "the lint must flag a partition-less window over a raw scan — " +
        "if this passes the corpus sweep below is vacuous")
    // ... and a post-aggregate global window is allowed
    val ok = Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("s"))))
    assert(unboundedGlobalWindows(ok.queryExecution.optimizedPlan).isEmpty,
      "post-aggregate global windows are the documented allowed shape")
  }

  test("lint flags a global window over a join of two bounded inputs") {
    // two <=10k-row limits joined: each child is "bounded" but the
    // join output can be up to 1e8 rows — the r9 bounded() passed
    // this shape silently (ADVICE r9); this control pins the fix
    val l = Tables(spark, sf(), "lineitem").limit(5000)
    val r = Tables(spark, sf(), "orders").limit(5000)
    val joined = l.join(r, l("l_orderkey") === r("o_orderkey"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("l_orderkey"))))
    assert(unboundedGlobalWindows(
      joined.queryExecution.optimizedPlan).nonEmpty,
      "a join of two bounded inputs multiplies cardinality — the " +
        "lint must flag a global window over it")
    // ... while a join against a provably one-row side (grand-total
    // aggregate) is still driven by the bounded side and allowed
    val total = Tables(spark, sf(), "lineitem")
      .agg(sum(col("l_quantity")).as("tot"))
    val ratio = Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      .crossJoin(total)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("s"))))
    assert(unboundedGlobalWindows(
      ratio.queryExecution.optimizedPlan).isEmpty,
      "join against a single-row grand total stays bounded")
    // ... and an explode over a bounded child is NOT bounded (the
    // generator multiplies rows by an unknown per-row factor)
    val gen = Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(collect_list(col("l_quantity")).as("qs"))
      .select(col("l_returnflag"), explode(col("qs")).as("q"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("q"))))
    assert(unboundedGlobalWindows(
      gen.queryExecution.optimizedPlan).nonEmpty,
      "explode over a bounded child must not count as bounded")
  }

  /** Every corpus query allowed to carry a partition-less Window at
    * all — each audited as a bounded micro-domain (VERDICT r8 §wrong
    * #2 + in-code comments at the sites). `bounded()` alone treats
    * ANY Aggregate as a reducer, which would also pass a row-scale
    * groupBy(user_id) — the allowlist closes that hole: a NEW query
    * with a global window fails here and must be audited (bounded
    * domain? then add it consciously) instead of landing silently.
    */
  private val auditedGlobalWindowQueries: Set[String] = Set(
    "q_fdr_bh",          // BH ladder over ≤5 test rows (StatsQueries)
    "q_lorenz_deciles",  // 10 decile rows post-aggregate
    "q_kmv_set_ops",     // merged KMV sketch ≤2k hashes
    "q_skyline",         // cummax over distinct prices (post-distinct)
    "q_hybrid_rrf",      // rank legs pre-limited ≤50
    "q_benford_audit",   // 9 leading-digit rows
    "q_text_zipf_fit",   // top-100 via TakeOrderedAndProject, then rank
    "q_shuffle_shards")  // ≤256-row bucket-offset prefix sum
  // (q_chi_square's one-row total no longer plans as a Window after
  // optimization — dropped from the r8 six-site list)

  test("no corpus query runs a global window over an unbounded input") {
    val withGlobal = scala.collection.mutable.ArrayBuffer.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf()).queryExecution.optimizedPlan
          catch { case e: Throwable =>
            fail(s"$name failed to plan: ${e.getMessage.take(120)}")
          }
        if (plan.collectFirst {
          case w: Window if w.partitionSpec.isEmpty => w
        }.nonEmpty) withGlobal += name
        val bad = unboundedGlobalWindows(plan)
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.size} global window(s) over " +
          s"unbounded input — partition it or aggregate first " +
          s"(first child: ${bad.head.child.nodeName})")
    }
    graft.CachedPlans.release()
    assert(offenders.isEmpty, offenders.mkString("\n"))
    assert(withGlobal.toSet == auditedGlobalWindowQueries,
      s"global-window query set drifted from the audited allowlist — " +
        s"new: ${withGlobal.toSet -- auditedGlobalWindowQueries}, " +
        s"gone: ${auditedGlobalWindowQueries -- withGlobal.toSet}. " +
        "Audit the new site's domain boundedness before allowing it.")
  }
}
