package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsQueries

/** The whale-user gate on the funnel operator: the collect_list+HOF
  * fold is the fast plan at healthy per-key cardinality, but one bot
  * key with millions of events concentrates an unbounded array in a
  * single task. `funnelStages` measures max events-per-key first and
  * swaps in the O(1)-per-key-state conditional-min formulation when
  * any key is a whale. This spec pins (1) the two formulations
  * row-identical (incl. the same-µs strict-`>` tie rule), (2) the
  * gate's flip, (3) the measured scale claim: the biggest single
  * task's shuffle read grows linearly with the whale under the fold
  * (the per-key array crosses the exchange) and stays flat under the
  * bounded formulation.
  */
class FunnelGateSpec extends SparkSpec {

  private def ev: DataFrame = Tables(spark, sf(), "events")
    .select(col("user_id"), col("ts"), col("event_type"))

  /** Planted users covering every funnel outcome, incl. the same-µs
    * tie: user 999999997's click lands at exactly the signup µs, so
    * strict `>` must hold it at stage 1 despite a later purchase
    * (purchase cannot advance stage 1).
    */
  private def planted: DataFrame = {
    val rows = Seq(
      (999999996L, 1000L, "click"), // no signup → stage 0
      (999999995L, 1000L, "signup"), // signup only → stage 1
      (999999994L, 1000L, "signup"), (999999994L, 2000L, "click"), // 2
      (999999997L, 1000L, "signup"), (999999997L, 1000L, "click"),
      (999999997L, 2000L, "purchase")) // tie: click not > t1 → 1
    import spark.implicits._
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
  }

  /** Real events + planted outcomes + one n-event whale user that
    * walks the full funnel (signup, then alternating clicks and
    * purchases).
    */
  private def whaleEv(n: Int = 100000): DataFrame = {
    val whale = spark.range(n).select(
      lit(999999999L).as("user_id"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      when(col("id") === 0, "signup")
        .when(col("id") % 2 === 1, "click")
        .otherwise("purchase").as("event_type"))
    ev.unionByName(planted).unionByName(whale)
  }

  private def collected(df: DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("bounded formulation == fold, row-identical, all stages") {
    val data = whaleEv(1000)
    val fold = collected(AnalyticsQueries.userStagesFold(data))
    val bounded = collected(AnalyticsQueries.userStagesBounded(data))
    assert(fold.nonEmpty && fold == bounded,
      s"${(fold.toSet diff bounded.toSet).take(3)} vs " +
        s"${(bounded.toSet diff fold.toSet).take(3)}")
    assert(fold(999999996L) == 0 && fold(999999995L) == 1 &&
      fold(999999994L) == 2 && fold(999999999L) == 3)
    assert(fold(999999997L) == 1,
      s"same-µs click must NOT advance (strict >): ${fold(999999997L)}")
  }

  test("gate flips on a measured per-key count") {
    // healthy data → the fold (collect_list visible in the plan)
    val healthy = AnalyticsQueries.funnelStages(ev)
    assert(healthy.queryExecution.analyzed.toString
      .contains("collect_list"), "expected the fold path")
    // whale data → the bounded path (no per-key array anywhere)
    val gated = AnalyticsQueries.funnelStages(whaleEv())
    assert(!gated.queryExecution.analyzed.toString
      .contains("collect_list"), "expected the bounded path")
    // forcing the threshold up re-selects the fold (explicit opt-in)
    val forced = AnalyticsQueries.funnelStages(whaleEv(),
      foldMaxPerUser = 1L << 30)
    assert(forced.queryExecution.analyzed.toString
      .contains("collect_list"))
  }

  test("whale decade: fold's biggest task grows linearly, bounded stays flat") {
    def maxRead(df: DataFrame): Long =
      maxTaskShuffleReadBytes(df.groupBy(col("stage")).count().collect())
    val fold10k = maxRead(AnalyticsQueries.userStagesFold(whaleEv(10000)))
    val fold100k = maxRead(AnalyticsQueries.userStagesFold(whaleEv(100000)))
    val b10k = maxRead(AnalyticsQueries.userStagesBounded(whaleEv(10000)))
    val b100k = maxRead(AnalyticsQueries.userStagesBounded(whaleEv(100000)))
    info(s"max single-task shuffle read: fold $fold10k -> $fold100k B, " +
      s"bounded $b10k -> $b100k B across a 10x whale")
    // the fold ships the whale's whole array into one reducer task
    assert(fold100k > fold10k * 3,
      s"expected the fold's biggest task to grow with the whale: " +
        s"$fold10k -> $fold100k")
    // the bounded path's per-task payload is independent of the whale
    assert(b100k < math.max(b10k * 2, b10k + 65536),
      s"bounded path's biggest task grew with the whale: $b10k -> $b100k")
    assert(b100k < fold100k / 2,
      s"bounded should read far less per task than the fold at 100k: " +
        s"$b100k vs $fold100k")
  }
}
