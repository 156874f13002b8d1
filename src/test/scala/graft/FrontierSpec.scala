package graft

import org.apache.spark.sql.functions._

/** Semantic gates for q_skyline, q_text_ngram_lm, and q_ewma — the
  * invariants an oracle row-hash doesn't state: the skyline IS the
  * brute-force Pareto frontier, smoothed probabilities are proper,
  * and the EWMA is a convex combination of its window.
  */
class FrontierSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_skyline: equals the brute-force Pareto frontier") {
    val parts = Tables(spark, sf(), "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expected = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).toSet
    val got = q("q_skyline").collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expected,
      s"frontier mismatch: missing=${expected -- got} extra=${got -- expected}")
  }

  test("q_skyline: paying more must buy strictly more size (staircase)") {
    val rows = q("q_skyline").collect()
      .map(r => (r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    rows.zip(rows.tail).foreach { case ((p1, s1), (p2, s2)) =>
      assert(p1 <= p2 && (p1 == p2 || s2 > s1),
        s"not a frontier staircase: ($p1,$s1) then ($p2,$s2)")
    }
  }

  test("q_text_ngram_lm: probabilities proper, context totals bound counts") {
    val rows = q("q_text_ngram_lm").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val ctx = r.getAs[Long]("n_ctx")
      val p = r.getAs[Double]("p_smoothed")
      assert(ctx >= n, s"context total below trigram count: $r")
      assert(p > 0 && p < 1, s"improper probability: $r")
    }
    // top-30 is count-descending
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q_sessionize: ONE data shuffle — the session groupBy reuses the window's user partitioning") {
    val p = withoutAqe(q("q_sessionize")
      .queryExecution.executedPlan.toString)
    // exactly one hash exchange (window + groupBy share the user_id
    // partitioning); the only other exchange is the presentation
    // sort's range partitioning
    val hashEx = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    val allEx = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(hashEx == 1 && allEx <= 2,
      s"expected 1 hash shuffle (+1 output sort), got $hashEx/$allEx:\n$p")
  }

  test("q_sessionize: sessions partition every event; durations under the gap bound") {
    val rows = q("q_sessionize").collect()
    val total = Tables(spark, sf(), "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val durMs = r.getAs[Long]("duration_ms")
      assert(r.getAs[Long]("session_seq") >= 1)
      assert(n >= 1 && r.getAs[Long]("n_types") <= math.min(n, 5))
      // n events chained by gaps ≤ 6 h bound the session span
      assert(durMs <= (n - 1) * 21600000L,
        s"session longer than its max chained span: $r")
      if (n == 1) assert(durMs == 0)
    }
  }

  test("q_bpe_merge_round: pairs are adjacent 2-grams with descending mass") {
    val rows = q("q_bpe_merge_round").collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[String]("pair").length == 2))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // the corpus is lowercase words — the argmax pair must be
    // alphabetic and its count must dominate the 20th
    assert(rows.head.getAs[String]("pair").forall(_.isLetter))
    assert(ns.head >= ns.last)
  }

  test("q_changepoint_cusum: one scan of events; changepoint inside the data range") {
    val df = q("q_changepoint_cusum")
    val p = withoutAqe(df.queryExecution.executedPlan.toString)
    val scans = p.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans == 1,
      s"totals must come from windows, not a re-scan: got $scans scans\n$p")
    val ev = Tables(spark, sf(), "events")
    val (lo, hi) = {
      val r = ev.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head
      (r.getDate(0), r.getDate(1))
    }
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("changepoint_day")
      assert(!day.before(lo) && !day.after(hi), s"day outside range: $r")
      assert(r.getAs[Double]("max_abs_cusum") >= 0.0)
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("q_ewma: convex combination of the user's window, bounded by extremes") {
    val ev = Tables(spark, sf(), "events")
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getLong(3))).toMap
    val rows = q("q_ewma").collect()
    assert(rows.length == bounds.size, "one row per user")
    rows.foreach { r =>
      val (lo, hi, n) = bounds(r.getAs[Long]("user_id"))
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-4 && e <= hi + 1e-4,
        s"ewma outside value range: $r vs [$lo,$hi]")
      assert(r.getAs[Long]("n_events") == n)
    }
  }
}
