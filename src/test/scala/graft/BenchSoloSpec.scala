package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the bench self-healing machinery (VERDICT r9 #1):
  * the in-run contention detectors and the most-inflated-query
  * selection that decides what the solo phase re-measures. The live
  * end-to-end control (load during corpus, released before solo) is
  * scripts/solo_control.py — these tests pin the decision logic it
  * rests on, so a threshold or ranking regression fails fast without
  * a 10-minute load run.
  */
class BenchSoloSpec extends AnyFunSuite {

  private def corpus(n: Int, base: Double): Map[String, Double] =
    (1 to n).map(i => f"q_$i%03d" -> (base + i * 0.01)).toMap

  test("probe detector: trips at 2x warm floor, not below") {
    val clean = Bench.detectorsTripped(0.10, 0.17, -1, -1, Map.empty, Map.empty)
    assert(clean.isEmpty, s"clean probes must not trip: $clean")
    assert(Bench.detectorsTripped(0.36, 0.10, -1, -1, Map.empty, Map.empty)
      .contains("probe"), "pre-probe at 2x floor must trip")
    assert(Bench.detectorsTripped(0.10, 0.50, -1, -1, Map.empty, Map.empty)
      .contains("probe"), "post-probe contention must trip too")
  }

  test("eff_cores detector: 1.5x skew either direction, -1 sentinel inert") {
    assert(Bench.detectorsTripped(0.1, 0.1, 3.7, 2.0, Map.empty, Map.empty)
      .contains("eff_cores"))
    assert(Bench.detectorsTripped(0.1, 0.1, 2.0, 3.7, Map.empty, Map.empty)
      .contains("eff_cores"))
    assert(Bench.detectorsTripped(0.1, 0.1, 3.7, 3.2, Map.empty, Map.empty)
      .isEmpty, "sub-threshold skew must not trip")
    assert(Bench.detectorsTripped(0.1, 0.1, -1.0, 3.7, Map.empty, Map.empty)
      .isEmpty, "the JMX -1 sentinel must never read as a skew")
  }

  test("median-wall detector: corpus-wide inflation trips, one mover does not") {
    val prev = corpus(40, 0.5)
    val inflated = prev.view.mapValues(_ * 1.4).toMap
    assert(Bench.detectorsTripped(0.1, 0.1, -1, -1, prev, inflated)
      .contains("median_wall"),
      "a 1.4x corpus-wide shift is the box, must trip")
    val oneMover = prev.map { case (k, v) =>
      k -> (if (k == "q_001") v * 5 else v) }
    assert(Bench.detectorsTripped(0.1, 0.1, -1, -1, prev, oneMover)
      .isEmpty, "a single real regression must NOT read as contention")
    val few = corpus(10, 0.5)
    assert(Bench.detectorsTripped(0.1, 0.1, -1, -1, few,
      few.view.mapValues(_ * 2).toMap).isEmpty,
      "under 20 comparable queries the median is noise — detector off")
  }

  test("median-wall detector ignores micro-queries below 0.2s prev") {
    // 30 micro-queries inflated 3x + 25 real queries flat: the
    // median over the >=0.2s subset must stay clean
    val prevMicro = (1 to 30).map(i => f"m_$i%03d" -> 0.05).toMap
    val prevReal = corpus(25, 0.5)
    val curr = prevMicro.view.mapValues(_ * 3).toMap ++ prevReal
    assert(Bench.detectorsTripped(0.1, 0.1, -1, -1,
      prevMicro ++ prevReal, curr).isEmpty)
  }

  test("selectInflated ranks by ratio desc and caps at n") {
    val prev = corpus(30, 0.5)
    val curr = prev.map { case (k, v) =>
      val boost = k match {
        case "q_003" => 4.0; case "q_007" => 3.0; case "q_011" => 2.0
        case _ => 1.05
      }
      k -> v * boost
    }
    val picked = Bench.selectInflated(prev, curr, 2)
    assert(picked == Seq("q_003", "q_007"),
      s"must pick the two most inflated in order, got $picked")
    val all = Bench.selectInflated(prev, curr, 12)
    assert(all == Seq("q_003", "q_007", "q_011"),
      "only queries >= 1.3x inflated rank when any exist; got " + all)
  }

  test("selectInflated: flat corpus still heals top-ratio queries (probe-only trip)") {
    val prev = corpus(30, 0.5)
    val curr = prev.view.mapValues(_ * 1.02).toMap
    val picked = Bench.selectInflated(prev, curr, 5)
    assert(picked.size == 5,
      "probe-tripped but flat corpus: still return n for cheap insurance")
  }

  test("selectInflated ignores micro-queries and absent-prev queries") {
    val prev = Map("q_micro" -> 0.05, "q_real" -> 1.0)
    val curr = Map("q_micro" -> 0.5, "q_real" -> 1.5, "q_new" -> 9.0)
    val picked = Bench.selectInflated(prev, curr, 12)
    assert(picked == Seq("q_real"),
      s"micro (prev<0.2s) and no-prior queries must not rank: $picked")
  }

  test("detector thresholds stay in lockstep with bench_diff.py") {
    // WarmFloor is duplicated in scripts/bench_diff.py (python reads
    // no scala); pin the literal so a one-sided edit fails here
    val py = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("scripts/bench_diff.py")), "UTF-8")
    assert(py.contains("WARM_FLOOR = " + Bench.WarmFloor),
      s"bench_diff.py WARM_FLOOR must equal Bench.WarmFloor=${Bench.WarmFloor}")
  }
}
