package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Regression gate for bench_diff.py's solo-healed path (VERDICT r10
  * #5): the committed fixture pair under src/test/resources/bench/ is
  * a LIVE capture from scripts/solo_control.py --save-fixture — an
  * idle reference leg plus a genuinely-loaded leg (48 spinners
  * released at the corpus-done marker) whose clean solo map bench_diff
  * must prefer over the contended corpus numbers. BenchSoloSpec pins
  * the in-run detector logic; this spec pins the diff-side branch the
  * healed numbers flow through, against real artifacts rather than
  * hand-built ones, so a threshold/field rename in either Bench's
  * writer or bench_diff's reader fails here without a 10-minute load
  * run. Tampered variants prove the branch is not vacuously green:
  * a 3x solo regression must exit 1, a dirty solo bracket or a
  * contended PREV (the ADVICE r10 gating fix) must stay inconclusive.
  */
class BenchDiffFixtureSpec extends AnyFunSuite {

  private val fixtureDir = Paths.get("src/test/resources/bench")
  private val idle = fixtureDir.resolve("idle.json")
  private val tripped = fixtureDir.resolve("tripped_healed.json")
  private val om = new ObjectMapper()

  private def runDiff(prev: Path, curr: Path): (Int, String) = {
    val pb = new ProcessBuilder(
      "python3", "scripts/bench_diff.py", prev.toString, curr.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    (code, out)
  }

  private def tampered(mutate: ObjectNode => Unit): Path = {
    val root = om.readTree(Files.readAllBytes(tripped))
      .asInstanceOf[ObjectNode]
    mutate(root)
    val f = Files.createTempFile("bench_fixture_", ".json")
    f.toFile.deleteOnExit()
    Files.write(f, om.writeValueAsBytes(root))
    f
  }

  test("fixture pair is committed and is a live solo_control capture") {
    assert(Files.exists(idle) && Files.exists(tripped),
      s"missing committed fixture under $fixtureDir — re-capture with " +
        "scripts/solo_control.py --save-fixture src/test/resources/bench")
    val i = om.readTree(Files.readAllBytes(idle))
    val t = om.readTree(Files.readAllBytes(tripped))
    // idle leg: clean probes (the control exits 2 otherwise)
    val ical = i.get("calibration")
    assert(ical != null &&
      math.max(ical.get("pre").asDouble, ical.get("post").asDouble) < 0.36,
      "idle fixture leg must carry clean probes")
    // tripped leg: a non-empty solo map with its own clean bracket and
    // a recorded trip — the exact artifact shape Bench emits when the
    // in-run detectors fire and the re-measure runs on a released box
    val solo = t.get("solo")
    assert(solo != null && solo.fieldNames().hasNext,
      "tripped fixture leg must carry a solo map")
    val scal = t.get("solo_cal")
    assert(scal != null &&
      math.max(scal.get("pre").asDouble, scal.get("post").asDouble) < 0.36,
      "solo bracket in the fixture must be clean")
    assert(t.get("solo_trips") != null, "solo_trips must be recorded")
    // the load must have bitten, else the fixture proves nothing
    var it0 = 0.0; var lt0 = 0.0
    i.get("queries").fields().forEachRemaining(e => it0 += e.getValue.asDouble)
    t.get("queries").fields().forEachRemaining(e => lt0 += e.getValue.asDouble)
    assert(lt0 >= 1.25 * it0,
      f"fixture load did not bite: loaded $lt0%.1f vs idle $it0%.1f")
  }

  test("healed path: clean solo map over a contended corpus exits 0") {
    val (code, out) = runDiff(idle, tripped)
    assert(code == 0, s"expected healed exit 0, got $code:\n$out")
    assert(out.contains("healed for"),
      s"stdout must show the healed branch fired:\n$out")
    assert(out.contains("numbers of record"),
      s"healed values must be declared numbers of record:\n$out")
  }

  test("a 3x solo regression is caught as real (exit 1)") {
    // tamper relative to the PREV value, not the solo value: a live
    // capture's solo legs can sit far below the idle leg (cold-cache
    // idle reference), so 3x solo alone need not cross the 2x gate
    val prevQ = om.readTree(Files.readAllBytes(idle)).get("queries")
    val f = tampered { root =>
      val solo = root.get("solo").asInstanceOf[ObjectNode]
      val q = solo.fieldNames().next()
      solo.put(q, prevQ.get(q).asDouble * 3.0)
    }
    val (code, out) = runDiff(idle, f)
    assert(code == 1, s"3x solo regression must exit 1, got $code:\n$out")
    assert(out.contains("solo-healed regression >2x"), out)
  }

  test("dirty solo bracket stays inconclusive (exit 3)") {
    val f = tampered { root =>
      root.get("solo_cal").asInstanceOf[ObjectNode].put("post", 0.9)
    }
    val (code, out) = runDiff(idle, f)
    assert(code == 3, s"dirty solo bracket must exit 3, got $code:\n$out")
  }

  test("contended PREV gates the healed path off (exit 3, ADVICE r10)") {
    // clean solo values vs an inflated prior would read a real
    // regression as 'ok' — the healed branch must require a clean PREV
    val root = om.readTree(Files.readAllBytes(idle)).asInstanceOf[ObjectNode]
    root.get("calibration").asInstanceOf[ObjectNode].put("pre", 0.5)
    val f = Files.createTempFile("bench_fixture_prev_", ".json")
    f.toFile.deleteOnExit()
    Files.write(f, om.writeValueAsBytes(root))
    val (code, out) = runDiff(f, tripped)
    assert(code == 3, s"contended prev must stay exit 3, got $code:\n$out")
    assert(out.contains("PREV artifact is"), out)
  }

  test("a solo map healing zero comparable queries is no evidence (exit 3)") {
    val f = tampered { root =>
      val solo = root.get("solo").asInstanceOf[ObjectNode]
      val vals = om.createObjectNode()
      solo.fieldNames().forEachRemaining(q => vals.put(s"${q}_absent", 1.0))
      root.set[ObjectNode]("solo", vals)
    }
    val (code, out) = runDiff(idle, f)
    assert(code == 3, s"empty healed evidence must exit 3, got $code:\n$out")
    assert(out.contains("heals 0 comparable queries"), out)
  }
}
