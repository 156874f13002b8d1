package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, IsNotNull, ScalarSubquery}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic bloom-filter join pruning — the optimizer-rule form of
  * [[graft.operators.BloomJoin]], and this library's analogue of
  * Spark's `InjectRuntimeFilter`: when a shuffle equi-join has one
  * side that is (a) small enough to summarize but (b) too big — or
  * disabled — for a broadcast hash join, and that side carries a
  * real filter (so its key set is selective), inject
  * `Filter(bloom_might_contain(probeKey, <scalar subquery>), probe)`
  * on the big side. The filter lands below the join's exchange, so
  * shuffle volume drops to the matching fraction plus the
  * (deterministic, md5-derived) false positives; the join itself
  * stays exact, so results are bit-identical with the rule on or
  * off — AutoBloomJoinSpec asserts both.
  *
  * Differences from `InjectRuntimeFilter`, on purpose: the bit set
  * is the engine-portable 63-bits-per-word md5 bloom (the repo's
  * oracle-exactness recipe — even the pruned row SET is
  * reproducible in DuckDB), and injection is a plain conf-gated
  * logical rule with no AQE dependency.
  *
  * Opt-in and bounded by conf:
  *   - `spark.graft.autoBloom.enabled`       (default false)
  *   - `spark.graft.autoBloom.maxBuildBytes` (default 256 MiB —
  *     above this, scanning the build side twice isn't worth it)
  *   - `spark.graft.autoBloom.minProbeRatio` (default 4 — probe must
  *     be at least this many times the build's estimated size)
  *   - `spark.graft.autoBloom.words`         (default 8192 → 516 096
  *     slots, 64 KiB — a one-row array the subquery broadcast carries)
  *
  * Fixed-point safe: an already-injected probe side (a
  * [[BloomMightContainExpr]] filter anywhere below the join) blocks
  * re-injection.
  */
object AutoBloomJoin extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private val Hashes = 3

  private def flag(key: String, default: String): String =
    conf.getConfString(s"spark.graft.autoBloom.$key", default)

  /** A filter that actually narrows the key set — not just the
    * IsNotNull conjuncts the optimizer infers for every join key.
    */
  private def hasSelectiveFilter(p: LogicalPlan): Boolean = p.exists {
    case Filter(cond, _) =>
      splitConjunctivePredicates(cond).exists {
        case _: IsNotNull => false
        // an injected bloom is not USER selectivity: counting it
        // would let one injection license a reverse second bloom on
        // a side that carries no real filter — a full extra scan of
        // the probe side (including the first bloom's subquery) for
        // no pruning value
        case c if c.exists(_.isInstanceOf[BloomMightContainExpr]) => false
        case _ => true
      }
    case _ => false
  }

  private def alreadyBloomed(p: LogicalPlan): Boolean = p.exists {
    case Filter(cond, _) =>
      cond.exists(_.isInstanceOf[BloomMightContainExpr])
    case _ => false
  }

  private def bloomSubquery(build: LogicalPlan, buildKey: Attribute,
      words: Int): Expression = {
    val spark = SparkSession.active
    val bits = graft.operators.BloomJoin.bloomBits(
      org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark, build),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(buildKey),
      words, Hashes)
    ScalarSubquery(bits.queryExecution.analyzed)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flag("enabled", "false").toBoolean) return plan
    val maxBuild = flag("maxBuildBytes", (256L << 20).toString).toLong
    val minRatio = flag("minProbeRatio", "4").toLong
    val words = flag("words", "8192").toInt
    plan.transform {
      case j @ Join(l, r, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi) && j.resolved =>
        val keys = splitConjunctivePredicates(cond).collectFirst {
          case EqualTo(a: Attribute, b: Attribute)
              if l.outputSet.contains(a) && r.outputSet.contains(b) => (a, b)
          case EqualTo(a: Attribute, b: Attribute)
              if l.outputSet.contains(b) && r.outputSet.contains(a) => (b, a)
        }
        keys match {
          case Some((lKey, rKey)) =>
            val lSize = l.stats.sizeInBytes
            val rSize = r.stats.sizeInBytes
            val bcBytes = conf.autoBroadcastJoinThreshold
            // candidate direction: prune the BIG side with the small
            // side's keys. For LeftSemi only the left is prunable.
            def inject(probe: LogicalPlan, probeKey: Attribute,
                build: LogicalPlan, buildKey: Attribute): Option[Filter] = {
              val bSize = build.stats.sizeInBytes
              val pSize = probe.stats.sizeInBytes
              val worth = bSize <= maxBuild &&
                pSize >= bSize * minRatio &&
                (bcBytes < 0 || bSize > bcBytes) && // broadcast wins else
                hasSelectiveFilter(build) && !alreadyBloomed(probe)
              if (!worth) None
              else Some(Filter(BloomMightContainExpr(
                // explicit timeZoneId: this Cast is injected into an
                // already-optimized plan, so no ResolveTimeZone pass
                // will ever fill it in — a timestamp probe key would
                // otherwise crash at execution (needsTimeZone → None.get)
                org.apache.spark.sql.catalyst.expressions.Cast(
                  probeKey, org.apache.spark.sql.types.StringType,
                  Some(org.apache.spark.sql.internal.SQLConf.get
                    .sessionLocalTimeZone)),
                bloomSubquery(build, buildKey, words), words, Hashes), probe))
            }
            val injected =
              if (jt == LeftSemi) inject(l, lKey, r, rKey)
                .map(f => j.copy(left = f))
              else if (lSize > rSize) inject(l, lKey, r, rKey)
                .map(f => j.copy(left = f))
              else inject(r, rKey, l, lKey)
                .map(f => j.copy(right = f))
            injected.getOrElse(j)
          case None => j
        }
    }
  }
}
