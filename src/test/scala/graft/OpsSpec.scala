package graft

import org.apache.spark.sql.functions._

/** Gates for the pipeline-ops family (OpsQueries + q_l_diversity):
  * diff-class conservation, weighted-sample bias direction, KMV
  * set-algebra error bounds against exact ground truth, and the
  * plan shapes (single full-outer join for the diff, top-k without a
  * global sort for the sample).
  */
class OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_snapshot_diff: classes partition both snapshots; deltas only from changes") {
    val rows = q("q_snapshot_diff").collect()
      .map(r => r.getAs[String]("change_type") -> r).toMap
    val o = Tables(spark, sf(), "orders")
    val v1 = o.where(col("o_orderkey") % 10 =!= 3).count()
    val v2 = o.where(col("o_orderkey") % 10 =!= 7).count()
    def n(c: String) = rows.get(c).map(_.getAs[Long]("n")).getOrElse(0L)
    // |v1| = removed + changed + unchanged; |v2| = added + changed + unchanged
    assert(n("removed") + n("changed") + n("unchanged") == v1)
    assert(n("added") + n("changed") + n("unchanged") == v2)
    // unchanged rows contribute zero delta; changed rows reprice UP
    assert(rows("unchanged").getAs[Double]("price_delta") == 0.0)
    assert(rows("changed").getAs[Double]("price_delta") > 0.0)
  }

  test("q_snapshot_diff: exactly one join, and it is a full outer equi-join") {
    val p = withoutAqe(q("q_snapshot_diff")
      .queryExecution.executedPlan.toString)
    val joins = p.sliding("Join".length).count(_ == "Join")
    assert(p.contains("FullOuter"), s"expected full outer join:\n$p")
    assert(joins == 1, s"expected exactly 1 join, got $joins:\n$p")
  }

  test("q_sample_weighted: plans as TakeOrderedAndProject and biases toward long docs") {
    val df = q("q_sample_weighted")
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted top-k must not global-sort:\n$p")
    val sampleMean = df.agg(avg(col("n_chars"))).head.getDouble(0)
    val popMean = Tables(spark, sf(), "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    // weight = n_chars ⇒ the sample mean length must exceed the
    // population mean (size-biased sampling), by a clear margin
    assert(sampleMean > popMean * 1.05,
      s"no size bias: sample=$sampleMean pop=$popMean")
  }

  test("q_kmv_set_ops: estimates within 3 KMV standard errors of exact") {
    val r = q("q_kmv_set_ops").head
    val ev = Tables(spark, sf(), "events")
    def users(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id")).distinct()
    val a = users("purchase").count().toDouble
    val b = users("click").count().toDouble
    val inter = users("purchase").intersect(users("click"))
      .count().toDouble
    val union = a + b - inter
    // KMV relative error ~ 1/sqrt(k-2) ≈ 0.127 at k=64; allow 3σ
    val tol = 3.0 / math.sqrt(62)
    def ok(est: Double, exact: Double) =
      math.abs(est - exact) <= tol * exact + 1e-9
    assert(ok(r.getAs[Double]("est_purchase_users"), a), s"$r vs a=$a")
    assert(ok(r.getAs[Double]("est_click_users"), b), s"$r vs b=$b")
    assert(ok(r.getAs[Double]("est_union"), union), s"$r vs u=$union")
    // intersection compounds two estimators, but the old 2·tol·union
    // band (±0.76·union) admitted an estimator returning 0 or nearly
    // the whole union — binomial jackknife SE at the observed overlap
    // fraction, 3σ, is the principled width (~0.19·union here)
    val pHat = math.max(0.05, math.min(0.95, inter / union))
    val interBand = 3.0 * math.sqrt(pHat * (1 - pHat) / 64) * union
    assert(math.abs(r.getAs[Double]("est_intersection") - inter)
      <= interBand + 1e-9,
      s"$r vs i=$inter (band ±$interBand)")
  }

  test("q_l_diversity: rows replay an independent driver-side recount") {
    // the old bounds (n_low_diversity <= n_groups, min_diversity
    // >= 1) hold by construction of ANY groupBy — wrong l, wrong QI
    // bucketing, or a swapped sensitive column all stayed green.
    // Recount every output cell from the raw rows in plain Scala.
    val raw = Tables(spark, sf(), "events")
      .select(col("event_type"),
        floor(col("value") / 10).cast("long").as("vb"),
        expr("unix_micros(ts) div 604800000000").as("wk"),
        col("user_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = raw.groupBy(t => (t._1, t._2, t._3)).toSeq
      .map { case ((et, _, _), rs) =>
        (et, rs.length.toLong, rs.map(_._4).distinct.length.toLong)
      }
      .groupBy(_._1).map { case (et, gs) =>
        et -> ((gs.length.toLong,
          gs.count(_._3 < 3).toLong,
          gs.filter(_._3 < 3).map(_._2).sum,
          gs.map(_._3).min.toDouble))
      }
    val got = q("q_l_diversity").collect().map(r =>
      r.getAs[String]("event_type") -> ((r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_low_diversity"),
        r.getAs[Long]("n_rows_at_risk"),
        r.getAs[Double]("min_diversity")))).toMap
    assert(got == expected,
      s"l-diversity mismatch:\n got $got\n exp $expected")
  }

  test("q_duplicate_payments: tolerance bounds hold; pairs canonical") {
    val rows = q("q_duplicate_payments").collect()
    assert(rows.nonEmpty, "synthetic data should flag some pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("ok_a") < r.getAs[Long]("ok_b"))
      assert(r.getAs[Long]("day_gap") <= 30)
      assert(r.getAs[Double]("pct_diff") <= 0.05 + 1e-9)
    }
    // no duplicate pairs in the output
    val keys = rows.map(r => (r.getAs[Long]("ok_a"), r.getAs[Long]("ok_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("q_duplicate_payments: equi-join on custkey carries the pair space") {
    val p = withoutAqe(q("q_duplicate_payments")
      .queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pair screen must equi-join on the customer key:\n$p")
  }

  test("q_ledger_reconcile: verdict classes partition the order count") {
    val rows = q("q_ledger_reconcile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val parts = r.getAs[Long]("n_no_lines") +
        r.getAs[Long]("n_matched") + r.getAs[Long]("n_over") +
        r.getAs[Long]("n_under")
      assert(parts == n,
        s"match/over/under/no-lines must partition the orders: $r")
      assert(r.getAs[Double]("max_abs_diff") >= 0.0)
    }
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables(spark, sf(), "orders").count())
  }

  test("q_order_aging: buckets partition orders; ages within bucket bounds") {
    val rows = q("q_order_aging").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables(spark, sf(), "orders").count(),
      "status × bucket cells must partition the order table")
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_age")
      r.getAs[String]("age_bucket") match {
        case "000-030" => assert(mx <= 30)
        case "031-060" => assert(mx > 30 && mx <= 60)
        case "061-090" => assert(mx > 60 && mx <= 90)
        case "090+"    => assert(mx > 90)
      }
    }
  }

  test("q_shuffle_shards: recovers the exact global shuffle order with no global sort") {
    val rows = q("q_shuffle_shards").collect()
    val nDocs = Tables(spark, sf(), "documents").count()
    // shards are contiguous 0..n-1; every shard is exactly 64 docs
    // except the tail; doc count conserves
    assert(rows.map(_.getAs[Long]("shard")).toSeq ==
      (0L until rows.length).toSeq)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.init.foreach(r => assert(r.getAs[Long]("n_docs") == 64L))
    assert(rows.last.getAs[Long]("n_docs") <= 64L)
    // the hash spans tile: shard i's max_hash < shard i+1's min_hash
    // — the bucket-offset rank IS the global md5 order, proven
    // without ever running a global sort
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[String]("max_hash") < b.getAs[String]("min_hash"),
        s"shard spans overlap: ${a} vs ${b}")
      case _ => ()
    }
    // plan gate: the doc-domain window is PARTITIONED (bkt); the
    // only unpartitioned window runs on the ≤256-row bucket
    // aggregate — so no Sort node ever sees the full doc domain in
    // one partition
    val p = withoutAqe(q("q_shuffle_shards")
      .queryExecution.executedPlan.toString)
    assert(p.contains("windowspecdefinition(bkt"),
      s"expected the per-bucket partitioned window:\n$p")
    // the plan shape alone cannot catch DATA degeneracy (a bucket
    // derivation collapsing to a constant keeps the same plan but
    // routes every doc through one window task): the per-task skew
    // ratio is the measured form, as in ScalingSpec's pareto gate
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val (peak, total) = try {
      spark.conf.set(key, "16")
      withoutAqe {
        shuffleReadSkew { q("q_shuffle_shards").count() }
      }
    } finally spark.conf.set(key, prev)
    info(f"shuffle-shards widest task reads $peak%dB of $total%dB " +
      f"(${peak.toDouble / total}%.2f)")
    assert(total > 0 && peak.toDouble / total < 0.3,
      f"one task serialized the shard ranking: " +
        f"${peak.toDouble / total}%.2f of the wire")
  }
}
