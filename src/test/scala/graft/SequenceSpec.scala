package graft

/** Gates for the behavioral-sequence / market-basket family
  * (SequenceQueries): conservation invariants (attribution must
  * account for every conversion, transition rows must normalize),
  * the apriori bound, and the plan shapes that keep the pair join an
  * equi-join rather than an item×item product.
  */
class SequenceSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_attribution_last_touch: every purchase is attributed exactly once") {
    val rows = q("q_attribution_last_touch").collect()
    val totalPurchases = Tables(spark, sf(), "events")
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum == totalPurchases)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(
      Set("click", "view", "signup", "unattributed")),
      s"unexpected channels: $channels")
  }

  test("q_attribution_last_touch: shuffle budget is one pass of the event table") {
    val n = Tables(spark, sf(), "events").count()
    val recs = shuffledRecords {
      q("q_attribution_last_touch").collect()
    }
    // one window shuffle on user_id (n rows) + the purchase rows into
    // the channel aggregate + map-side-combined partials (≤ a few
    // hundred) — anything near 2n would mean the table shuffled twice
    assert(recs < n + n / 2 + 1000,
      s"expected ~$n shuffled records, got $recs")
  }

  test("q_attribution_linear: credited revenue conserves total purchase revenue") {
    import org.apache.spark.sql.functions.{col, sum}
    val credited = q("q_attribution_linear").collect()
      .map(r => BigDecimal(r.getAs[Double]("credited_revenue"))).sum
    val total = Tables(spark, sf(), "events")
      .where(col("event_type") === "purchase")
      .select(sum(col("value").cast("decimal(18,6)"))).head
      .getDecimal(0)
    // per-credit quantization loses ≤ 5e-7 per (purchase, channel)
    // row — allow that envelope, nothing more
    val slack = BigDecimal("0.01")
    assert((credited - BigDecimal(total)).abs <= slack,
      s"credit leak: credited=$credited total=$total")
  }

  test("q_markov_transitions: rows per prev normalize to 1; chain length conserved") {
    val rows = q("q_markov_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (prev, rs) =>
      val mass = rs.map(_.getAs[Double]("p_transition")).sum
      assert(math.abs(mass - 1.0) < 0.01, s"$prev mass=$mass")
    }
    // transitions = events - first event of each active user
    val ev = Tables(spark, sf(), "events")
    import org.apache.spark.sql.functions.col
    val expected = ev.count() -
      ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q_rfm_segmentation: grid conserves users and revenue; no global window") {
    import org.apache.spark.sql.functions.{col, countDistinct, sum}
    val rows = q("q_rfm_segmentation").collect()
    val purchasers = Tables(spark, sf(), "events")
      .where(col("event_type") === "purchase")
    val nUsers = purchasers.select(countDistinct(col("user_id")))
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val revenue = rows.map(r => BigDecimal(
      r.getAs[Double]("segment_revenue"))).sum
    val total = BigDecimal(purchasers
      .select(sum(col("value").cast("decimal(18,6)"))).head
      .getDecimal(0))
    // cells are round(decimal→double, 6) on the output surface: each
    // carries ≤5e-7 of representation error into the sum — scale the
    // envelope to the cell count so a real sub-cent leak still fails
    val slack = BigDecimal(rows.length) * BigDecimal("0.0000005")
    assert((revenue - total).abs <= slack,
      s"revenue leak: $revenue != $total (slack $slack)")
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
    }
    // scores assign map-side against broadcast edges — no Window at all
    val p = withoutAqe(q("q_rfm_segmentation")
      .queryExecution.executedPlan.toString)
    assert(!p.contains("Window"), s"global ntile leaked back in:\n$p")
  }

  test("q_cooccur_rules: apriori bound and measure ranges hold") {
    val rows = q("q_cooccur_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nAb = r.getAs[Long]("n_ab")
      val nA = r.getAs[Long]("n_a")
      val nB = r.getAs[Long]("n_b")
      assert(nAb >= 3 && nAb <= math.min(nA, nB),
        s"apriori bound violated: $r")
      val cAb = r.getAs[Double]("conf_a_to_b")
      val cBa = r.getAs[Double]("conf_b_to_a")
      assert(cAb > 0 && cAb <= 1 && cBa > 0 && cBa <= 1)
      assert(r.getAs[Double]("lift") > 0)
      assert(r.getAs[Long]("item_a") < r.getAs[Long]("item_b"))
    }
  }

  test("q_cooccur_rules: pair generation is an equi-join on the basket key") {
    val p = withoutAqe(q("q_cooccur_rules")
      .queryExecution.executedPlan.toString)
    // the only nested-loop join allowed is the one-row totals cross
    val bnlj = p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin")
    assert(bnlj <= 1, s"item×item product leaked into the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
  }

  test("q_session_path_topk: 3-step paths ranked by user count") {
    val rows = q("q_session_path_topk").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.split(">").length == 3,
        s"path must have exactly 3 steps: $path")
      assert(r.getAs[Long]("n_users") >= 1)
    }
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "paths must be ranked by user count desc")
  }

  test("q_interpurchase_gap: order statistics coherent, gaps positive") {
    val r = q("q_interpurchase_gap").collect().head
    assert(r.getAs[Long]("n_gaps") >= r.getAs[Long]("n_repeat_users"),
      "every repeat user contributes at least one gap")
    val med = r.getAs[Double]("median_gap_hours")
    val p90 = r.getAs[Double]("p90_gap_hours")
    val mx = r.getAs[Double]("max_gap_hours")
    assert(med > 0 && med <= p90 + 1e-9 && p90 <= mx + 1e-9)
    assert(r.getAs[Double]("avg_gap_hours") > 0)
  }

  test("q_session_path_topk: per-user window is group-limit pruned") {
    val p = q("q_session_path_topk")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rn<=3 should prune map-side via WindowGroupLimit:\n$p")
  }
}
