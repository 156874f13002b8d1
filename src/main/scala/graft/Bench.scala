package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Contract: the LAST stdout line is one JSON object
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},...}`.
  *
  * The driver captures only the last 2000 chars of stdout, and the
  * full 94-query map is ~2.4 KB even at millisecond precision — it
  * cannot fit. So the stdout line is budgeted: per-query entries are
  * added slowest-first until the line would exceed the capture
  * window, with `queries_omitted` recording the (fast) remainder.
  * The COMPLETE per-query artifact — every query, full precision —
  * is always written to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_full.json` in the working directory) for round-over-round
  * regression diffs, and mirrored to the round-stamped
  * `BENCH_r{N}.json` (round from PROGRESS.jsonl) on full-set runs so
  * the per-round record is never the truncated tail.
  */
object Bench {
  /** Stdout-line budget: the driver's tail capture is 2000 chars;
    * leave headroom for the trailing newline and any interleaved
    * stray output. */
  private val StdoutBudget = 1900

  /** Idle-box ceiling for the calibration probe (BASELINE.md r9:
    * measured warm range 0.08-0.18s). A probe at >= 2x this floor
    * means the box was contended during the bracketed phase. Kept in
    * lockstep with scripts/bench_diff.py WARM_FLOOR. */
  private[graft] val WarmFloor = 0.18

  /** Contention detectors, same three classes bench_diff.py applies
    * after the fact — evaluated IN-RUN so the artifact can heal
    * itself (VERDICT r9 #1): three rounds of official artifacts were
    * contended, and detection without repair left no per-query
    * numbers of record. Returns the tripped detector names (empty =
    * clean). prevQ/prevEff come from the committed prior full
    * artifact; absent prior (first round, renamed file) degrades to
    * the probe detector alone. */
  private[graft] def detectorsTripped(
      calPre: Double, calPost: Double,
      prevEff: Double, currEff: Double,
      prevQ: Map[String, Double],
      currQ: Map[String, Double]): Seq[String] = {
    val trips = scala.collection.mutable.ArrayBuffer.empty[String]
    if (math.max(calPre, calPost) >= 2 * WarmFloor) trips += "probe"
    if (prevEff > 0 && currEff > 0 &&
        math.max(prevEff, currEff) / math.min(prevEff, currEff) >= 1.5)
      trips += "eff_cores"
    // corpus-wide median wall ratio (>=0.2s prev so micro-query
    // jitter can't move it): a code change moves the queries it
    // touched, not the median of a 240-query corpus
    val common = (prevQ.keySet & currQ.keySet).toSeq
      .filter(q => prevQ(q) >= 0.2)
    if (common.size >= 20) {
      val rs = common.map(q => currQ(q) / prevQ(q)).sorted
      val med = rs(rs.size / 2)
      if (med >= 1.25 || med <= 0.8) trips += "median_wall"
    }
    trips.toSeq
  }

  /** The N queries most inflated vs the prior artifact (ratio desc,
    * prev >= 0.2s so the ranking is not micro-query noise). Queries
    * >= 1.3x inflated rank first; if nothing clears that bar (probe
    * tripped but the corpus reads flat) the top-ratio queries are
    * still healed — a clean solo number for them is cheap insurance
    * either way. */
  private[graft] def selectInflated(
      prevQ: Map[String, Double],
      currQ: Map[String, Double], n: Int): Seq[String] = {
    val ranked = (prevQ.keySet & currQ.keySet).toSeq
      .filter(q => prevQ(q) >= 0.2)
      .map(q => (currQ(q) / prevQ(q), q))
      .sortBy { case (r, q) => (-r, q) }
    val inflated = ranked.filter(_._1 >= 1.3)
    (if (inflated.nonEmpty) inflated else ranked).map(_._2).take(n)
  }

  /** What a record-hygiene check needs to know about an existing
    * full artifact: its per-query map, the worst calibration probe
    * (-1 when the artifact predates probes), and which SF it ran. */
  private[graft] final case class ArtifactMeta(
      queries: Map[String, Double], calWorst: Double, sf: String)

  /** Record-hygiene rule (VERDICT r10 #4): the committed
    * BENCH_full.json is the best idle leg — the number of record —
    * and three rounds running, an end-of-round driver leg has
    * silently overwritten it with a slightly-worse one. A new run
    * may only replace the record when it IMPROVES it; otherwise it
    * is diverted to a candidate file and promotion is an explicit
    * copy. Preserve (divert) when, without SPARK_GRAFT_BENCH_FORCE=1:
    *   - the existing artifact is provably clean (probes present and
    *     under the contention threshold) — a contended record is not
    *     worth defending — and ran the same SF (cross-SF totals are
    *     incomparable), and EITHER
    *   - the query sets match and the existing total is strictly
    *     better (the best-leg rule), OR
    *   - the current run timed a strict SUBSET of the record's
    *     queries (a SPARK_GRAFT_ONLY iteration must never shrink the
    *     240-query record to its filter).
    * A changed corpus (new/renamed queries) always overwrites: the
    * record must track the corpus. */
  private[graft] def preserveRecord(
      prev: Option[ArtifactMeta], currQ: Map[String, Double],
      currSf: String, force: Boolean, runs: Int = 3): Boolean =
    !force && prev.exists { p =>
      // a min-of-<3 leg is never a number of record, whatever its
      // total: min-of-1 rides single-pass luck the record never gets
      runs < 3 ||
      (p.calWorst >= 0 && p.calWorst < 2 * WarmFloor && p.sf == currSf && (
        (p.queries.keySet == currQ.keySet &&
          p.queries.values.sum < currQ.values.sum) ||
        (currQ.keySet.subsetOf(p.queries.keySet) &&
          currQ.keySet != p.queries.keySet)
      ))
    }

  /** Corpus timing with one end-of-corpus retry per failed query
    * (VERDICT r11 #1). `attempt` is one full min-of-runs measurement:
    * Right(timing) on success, Left(reason) when every run threw. A
    * query whose first attempt fails gets exactly ONE more attempt
    * after the whole corpus drains — transient environment (the r11
    * q_text_readability case: threw 3×, passed solo minutes later on
    * the identical jar) usually clears by then, and one flake must
    * not invalidate a ~15-minute artifact. Returns (timings,
    * stillFailed name→reason, retriedOk names). */
  private[graft] def timeCorpus[T](
      names: Seq[String], attempt: String => Either[String, T])
      : (Map[String, T], Map[String, String], Seq[String]) = {
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val retriedOk = scala.collection.mutable.ArrayBuffer.empty[String]
    val first = names.flatMap { n =>
      attempt(n) match {
        case Right(t) => Some(n -> t)
        case Left(reason) => failed(n) = reason; None
      }
    }
    val retried = failed.keys.toSeq.flatMap { n =>
      System.err.println(s"[bench] retrying $n once at corpus end")
      attempt(n) match {
        case Right(t) => failed.remove(n); retriedOk += n; Some(n -> t)
        case Left(reason) => failed(n) = reason; None
      }
    }
    ((first ++ retried).toMap, failed.toMap, retriedOk.toSeq)
  }

  /** Distinct diverted-leg filename (VERDICT r11 #2): the fixed
    * `_candidate.json` let any stray Bench invocation clobber a full
    * candidate (live-observed: a 1-query judge repro replaced the
    * r11 240-query leg). Timestamp + query count make each diverted
    * leg un-losable; promotion to the record stays an explicit
    * copy. */
  private[graft] def candidatePath(
      outPath: String, stamp: String, nQueries: Int): String =
    (if (outPath.endsWith(".json")) outPath.dropRight(5) else outPath) +
      s"_candidate_${stamp}_n$nQueries.json"

  /** Reader for the record-hygiene check. None when the file is
    * missing/corrupt (nothing to defend — write proceeds). */
  private[graft] def readArtifactMeta(path: String): Option[ArtifactMeta] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) None
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(java.nio.file.Files.readAllBytes(p))
        val b = Map.newBuilder[String, Double]
        Option(root.get("queries")).foreach { q =>
          val it = q.fields()
          while (it.hasNext) {
            val e = it.next(); b += e.getKey -> e.getValue.asDouble()
          }
        }
        val cal = Option(root.get("calibration")).map(c =>
          math.max(Option(c.get("pre")).map(_.asDouble()).getOrElse(99.0),
            Option(c.get("post")).map(_.asDouble()).getOrElse(99.0)))
          .getOrElse(-1.0)
        val sf = Option(root.get("sf")).map(_.asText()).getOrElse("")
        Some(ArtifactMeta(b.result(), cal, sf))
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not read artifact meta $path: $e")
      None
    }

  /** queries map + eff_cores of a prior Bench full artifact (Jackson
    * ships with Spark). Missing/corrupt file degrades to empty — the
    * solo machinery then rests on the probe detector alone. */
  private def readPrevArtifact(path: String): (Map[String, Double], Double) =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) (Map.empty, -1.0)
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(java.nio.file.Files.readAllBytes(p))
        val b = Map.newBuilder[String, Double]
        Option(root.get("queries")).foreach { q =>
          val it = q.fields()
          while (it.hasNext) {
            val e = it.next(); b += e.getKey -> e.getValue.asDouble()
          }
        }
        val eff = Option(root.get("cpu_wall"))
          .flatMap(c => Option(c.get("eff_cores")))
          .map(_.asDouble()).getOrElse(-1.0)
        (b.result(), eff)
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not read prior artifact $path: $e")
      (Map.empty, -1.0)
    }

  /** Whole-JVM process CPU seconds. local[32] runs every task thread
    * in this JVM, so (ΔprocessCpu / Δwall) is the effective core
    * count the run actually got: ~10-30 on an idle 32-core box,
    * collapsing toward 1-4 when co-tenant processes steal cores.
    * That ratio — not wall time alone — is what separates "the query
    * got slower" from "the box was loaded" (the r8 203s-vs-101s
    * identical-code spread). -1 if the JMX bean is unavailable. */
  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Fixed calibration probe: a CPU-bound parallel sum over a
    * constant range, no I/O, no shuffle variability — its idle-box
    * time is a stable constant for a given JVM/Spark version, so a
    * probe reading far above its companion run's floor means the box
    * was contended DURING this bench and the corpus numbers carry
    * the same inflation. Run before and after the corpus (min-of-3
    * each) so contention that starts mid-run is visible as pre/post
    * skew. */
  private def calibrationProbe(spark: SparkSession): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .selectExpr("sum(id * 3 + 1) as s").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classloading warmup on the smallest SF so the first timed
    // queries don't absorb JVM startup (3-4 s skew otherwise).
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // Three passes, report min per query: steady-state timing. A
    // single pass swings ±40% on this box (GC phase, page-cache
    // state, JIT tiers) — larger than any per-query difference worth
    // measuring; min-of-3 also rides out one-off GC pauses that
    // min-of-2 still caught.
    // SPARK_GRAFT_RUNS: decade-soak legs at sf>=100 can't afford 3
    // full passes (a single sf100 pass is ~1h); min-of-1 is noisier
    // but the decade ratios it feeds are x4-13, far above the noise.
    // Defensive parse like SOLO_N; the record-hygiene gate below
    // refuses to let a non-min-of-3 leg replace the record.
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .filter(r => r >= 1 && r <= 9).getOrElse(3)
    // Local-iteration filter (mirrors Verify's 3rd arg): the driver
    // never sets it, so driver rounds always time the full set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val timed = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter(q => names(q._1)))
    // Per-query grouping (not interleaved corpus passes): each
    // query's 3 runs go back-to-back — run 2/3 still measure the
    // warm steady state (its own caches populated) — and the
    // query's CachedPlans entries are RELEASED before the next
    // query starts. The old interleaved shape kept every query's
    // eager caches resident through passes 2-3 (dozens of
    // MEMORY_AND_DISK tables at once), and that storage-memory
    // pressure was a measured chunk of the corpus-vs-solo
    // contention band documented in BASELINE.md.
    // A failed query must NOT masquerade as a timing: the old catch
    // recorded elapsed-time-to-throw (often ~1 ms) as a legitimate
    // min-of-3, so a breakage read as a large performance win.
    // Failures are excluded from the timing map, named in a separate
    // "failed" key (additive — the driver's metric/value/queries
    // reads are unaffected), and shouted to stderr. NonFatal only:
    // an OOM must abort the run, not cascade ~0s timings through
    // the remaining corpus in a corrupted JVM.
    def failureSummary(e: Throwable): String =
      s"${e.getClass.getSimpleName}: " +
        Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(200)
    val calPre = calibrationProbe(spark)
    val wallStart = System.nanoTime()
    val cpuStart = processCpuSec()
    // honor the documented -1 sentinel end-to-end: without the bean,
    // deltas of two -1 snapshots would read as a plausible 0.0
    val cpuOk = cpuStart >= 0
    // Each run records (wall, processCpuDelta); the reported pair is
    // the min-wall run's, so cpu/wall stays internally consistent
    // (mixing min-wall with another run's cpu would fake ratios).
    // One attempt = min-of-`runs` wall/cpu; Left(reason) when every
    // run threw (last exception's one-line summary).
    def attempt(name: String): Either[String, (Double, Double)] = {
      var lastErr = "unknown"
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val c0 = processCpuSec()
        try {
          timed(name)(spark, sfDir).count()
          Some(((System.nanoTime() - t0) / 1e9,
            if (cpuOk) processCpuSec() - c0 else -1.0))
        } catch { case scala.util.control.NonFatal(e) =>
          lastErr = failureSummary(e)
          System.err.println(s"[bench] $name failed: $lastErr")
          None
        }
      }
      graft.CachedPlans.release()
      if (times.isEmpty) Left(lastErr) else Right(times.minBy(_._1))
    }
    val (results, failed, retriedOk) =
      timeCorpus(timed.keys.toSeq, attempt)
    val cpuCorpus = if (cpuOk) processCpuSec() - cpuStart else -1.0
    val wallCorpus = (System.nanoTime() - wallStart) / 1e9
    val calPost = calibrationProbe(spark)
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val wallByName = results.view.mapValues(_._1).toMap

    // Phase marker for the solo-healing negative-control harness
    // (scripts/solo_control.py): the corpus phase just ended, so an
    // external load generator watching this file can release its
    // load before the solo re-measure below begins.
    sys.env.get("SPARK_GRAFT_PHASE_MARKER").foreach { mp =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(mp),
        "corpus_done\n".getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }

    // Self-healing solo re-measure (VERDICT r9 #1): if the in-run
    // contention detectors trip, re-run the most-inflated queries
    // (vs the committed prior full artifact) back-to-back min-of-3
    // NOW — contention is usually transient co-tenant load, and a
    // min over three later tries rides out what the corpus pass
    // absorbed. The solo phase carries its own calibration bracket
    // (solo_cal) so a reader — and bench_diff.py — can tell whether
    // the healed numbers were themselves taken on a clean box.
    val effCorpus = if (cpuOk && wallCorpus > 0) cpuCorpus / wallCorpus else -1.0
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", outPath)
    val (prevQ, prevEff) = readPrevArtifact(prevPath)
    // degrade-gracefully parse (ADVICE r10): a malformed value here
    // would throw AFTER the full corpus ran but BEFORE any artifact
    // was written, discarding a 30+ minute run
    val soloN = sys.env.get("SPARK_GRAFT_SOLO_N")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(12)
    val trips = detectorsTripped(calPre, calPost, prevEff, effCorpus,
      prevQ, wallByName)
    val soloNames: Seq[String] = sys.env.get("SPARK_GRAFT_FORCE_SOLO") match {
      // explicit list: the control harness pins exactly which
      // queries to heal regardless of detector state
      case Some(list) if list.nonEmpty && list != "auto" =>
        list.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case Some(_) => selectInflated(prevQ, wallByName, soloN)
      // auto path: only on full-set runs (a filtered SPARK_GRAFT_ONLY
      // run has no corpus to diagnose) with a tripped detector
      case None if trips.nonEmpty && only.isEmpty =>
        selectInflated(prevQ, wallByName, soloN)
      case None => Seq.empty
    }
    var soloCalPre = -1.0
    var soloCalPost = -1.0
    val soloResults: Seq[(String, Double)] =
      if (soloNames.isEmpty) Seq.empty
      else {
        System.err.println(s"[bench] contention detectors tripped " +
          s"[${trips.mkString(",")}] — solo re-measure (min-of-$runs) " +
          s"of ${soloNames.size} queries: ${soloNames.mkString(", ")}")
        soloCalPre = calibrationProbe(spark)
        val rs = soloNames.flatMap { name =>
          val fn = SparkEntry.queries(name)
          val times = (1 to runs).flatMap { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case scala.util.control.NonFatal(_) => None }
          }
          graft.CachedPlans.release()
          if (times.isEmpty) None else Some(name -> times.min)
        }
        soloCalPost = calibrationProbe(spark)
        rs
      }

    // JSON string escape shared with the name/path interpolations —
    // locale-pinned float formatting (a de_DE default locale would
    // print decimal COMMAS and break the driver's parse)
    def fmt(prec: Int, v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${prec}f",
        Double.box(v))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // `failed` is {name: reason} (was a bare name list through r11):
    // the reason must live IN the artifact, not on stderr that gets
    // tail-truncated. bench_diff.py prints the entry verbatim either
    // way; the driver reads only metric/value/queries.
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":${failed.map { case (k, v) =>
        jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")}"""
    val retriedJson =
      if (retriedOk.isEmpty) ""
      else s""","retried_ok":${retriedOk.map(jstr).mkString("[", ",", "]")}"""
    // Contention self-check (VERDICT r8 #1): calibration probe
    // timings bracket the corpus, and effective-cores = ΔprocessCpu
    // / Δwall over the whole corpus. BASELINE.md states the discount
    // rule a reader applies before calling any delta a regression.
    val contentionJson =
      s""","calibration":{"pre":${fmt(3, calPre)},"post":${fmt(3, calPost)}}""" +
      s""","cpu_wall":{"cpu_sec":${fmt(1, cpuCorpus)},"wall_sec":${fmt(1, wallCorpus)},"eff_cores":${fmt(1, if (cpuOk && wallCorpus > 0) cpuCorpus / wallCorpus else -1.0)}}"""
    def entries(rs: Seq[(String, Double)], prec: Int): Seq[String] =
      rs.map { case (k, v) => jstr(k) + ":" + fmt(prec, v) }
    def jsonLine(qs: String, extra: String): String =
      s"""{"metric":"total","value":${fmt(3, total)},"unit":"sec","queries":$qs$extra$failedJson$retriedJson$contentionJson,"sf":${jstr(sfDir)},"runs":$runs,"n_queries":${results.size}}"""

    // full artifact to file first (every query, full precision,
    // plus per-query process-CPU seconds for the min-wall run) —
    // never truncated
    val cpuJson = s""","cpu":${entries(
      results.toSeq.map { case (k, (_, c)) => (k, c) }.sortBy(_._1), 3)
      .mkString("{", ",", "}")}"""
    // solo map only when the healing phase actually ran; solo_cal
    // brackets it so the healed values carry their own cleanliness
    // evidence, solo_trips records WHY the phase fired
    val soloJson =
      if (soloResults.isEmpty) ""
      else s""","solo":${entries(soloResults.sortBy(_._1), 9)
          .mkString("{", ",", "}")}""" +
        s""","solo_cal":{"pre":${fmt(3, soloCalPre)},"post":${fmt(3, soloCalPost)}}""" +
        s""","solo_trips":${trips.map(jstr).mkString("[", ",", "]")}"""
    val fullJson = jsonLine(
      entries(wallByName.toSeq.sortBy(_._1), 9).mkString("{", ",", "}"),
      cpuJson + soloJson)
    // record hygiene (VERDICT r10 #4): never silently replace a
    // better-and-clean record — divert worse/partial legs to a
    // candidate file; promotion to the record is an explicit copy
    val force = sys.env.get("SPARK_GRAFT_BENCH_FORCE").contains("1")
    val actualOut =
      if (preserveRecord(readArtifactMeta(outPath), wallByName, sfDir,
          force, runs)) {
        val stamp = new java.text.SimpleDateFormat("yyyyMMdd'T'HHmmss")
          .format(new java.util.Date())
        val cand = candidatePath(outPath, stamp, results.size)
        System.err.println(s"[bench] $outPath holds a clean, " +
          "better (or fuller) record for this SF — this leg goes to " +
          s"$cand; promote explicitly or re-run with " +
          "SPARK_GRAFT_BENCH_FORCE=1")
        cand
      } else outPath
    try java.nio.file.Files.write(java.nio.file.Paths.get(actualOut),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $actualOut: $e") }
    // ... and to the round-stamped artifact (BENCH_r{N}.json, round
    // from PROGRESS.jsonl) so the per-round record carries every
    // query — the stdout tail capture is 2000 chars and 135 query
    // names alone exceed it, so the budgeted line below can never be
    // the complete record. Skipped for SPARK_GRAFT_ONLY partial runs
    // (a filtered map must not masquerade as the round's numbers).
    if (only.isEmpty) {
      try {
        val progress = java.nio.file.Paths.get("PROGRESS.jsonl")
        if (java.nio.file.Files.exists(progress)) {
          val last = java.nio.file.Files.readAllLines(progress)
            .toArray(Array.empty[String]).reverse
            .find(_.trim.nonEmpty)
          val round = last.flatMap(l =>
            """"round"\s*:\s*(\d+)""".r.findFirstMatchIn(l))
            .map(_.group(1).toInt)
          round.foreach { n =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(f"BENCH_r$n%02d.json"),
              (fullJson + "\n").getBytes("UTF-8"))
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not stamp round artifact: $e") }
    }

    // stdout contract line: slowest queries first, greedily packed
    // under the driver's capture budget
    val bySlowest = entries(wallByName.toSeq.sortBy(-_._2), 3)
    val fixedOverhead = jsonLine("{}",
      s""","queries_omitted":${results.size},"full":"$actualOut"""").length +
      24 // headroom for the optional solo_n tail below
    var used = fixedOverhead
    val kept = bySlowest.takeWhile { e =>
      val fits = used + e.length + 1 <= StdoutBudget
      if (fits) used += e.length + 1
      fits
    }
    val omitted = results.size - kept.size
    // solo_n on the stdout tail too: a totals-only reader learns the
    // artifact self-healed without opening the full file
    val soloTail = if (soloResults.isEmpty) ""
      else s""","solo_n":${soloResults.size}"""
    val line = jsonLine(kept.mkString("{", ",", "}"),
      s""","queries_omitted":$omitted,"full":"$actualOut"$soloTail""")
    println(line)
    graft.CachedPlans.release()
    spark.stop()
    // A totals-only consumer diffing `value` round-over-round would
    // read dropped-from-results failures as a speedup; make the
    // breakage impossible to miss (ADVICE r8): loud marker + nonzero
    // exit. The JSON line above is already printed, so a driver that
    // only tails stdout still gets the (partial) numbers.
    if (failed.nonEmpty) {
      System.err.println(
        s"[bench] *** ${failed.size} QUERIES FAILED (after one retry " +
        s"each) — totals cover only ${results.size} queries: " +
        failed.map { case (k, v) => s"$k [$v]" }.mkString(", ") + " ***")
      sys.exit(2)
    }
  }
}
