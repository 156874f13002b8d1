package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decade-scale skew gates (VERDICT r9 #3): the uniform 10-copy
  * decade hides the skew real track fleets have — one entity posting
  * 100-1000x more points than the median (the reference's per-key
  * upsert concentrates exactly this way, task.ts:148). SkewSpec
  * plants micro-skew on toy ranges; these tests run the actual
  * corpus queries over Zipf-hot TWINS of sf0.01/sf0.1 (same rule as
  * `scale_testdata.py --hot`): top-1% users carry 100x their events,
  * top-1% orders gain 10x fresh co-suppliers (whale orders = hubs in
  * the co-supply graph). Gates are metric-based (shuffle records /
  * max-task read share), not wall-clock, so they hold on a loaded
  * box.
  */
class SkewScalingSpec extends SparkSpec {

  private val EvMult = 100 // hot-user event multiplicity
  private val LiMult = 10  // whale-order co-supplier multiplicity
  private val Sub = 100000000L

  /** Zipf-hot twin of a testdata dir, synthesized once per /tmp
    * lifetime (marker file). Untouched tables are byte-copied so any
    * corpus query runs against the twin unmodified. */
  private def hotDir(sfd: String): String = {
    val dir = s"/tmp/graft_skew_v1_sf$sfd"
    val marker = new java.io.File(s"$dir/_SYNTH_DONE")
    if (!marker.exists) {
      new java.io.File(dir).mkdirs()
      def reps(m: Int) = spark.range(1, m).select(col("id").as("rep"))
      val e = Tables(spark, sf(sfd), "events")
      val evExtra = e.filter(col("user_id") % 100 === 0)
        .crossJoin(reps(EvMult))
        .select((col("event_id") + col("rep") * lit(Sub)).as("event_id"),
          // +rep seconds: replicas are a dense burst, not a
          // same-instant stack that would degenerate sessionization
          (col("ts").cast("long") + col("rep")).cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      e.unionByName(evExtra.select(e.columns.map(col).toSeq: _*))
        .coalesce(4).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val li = Tables(spark, sf(sfd), "lineitem")
      val liExtra = li.filter(col("l_orderkey") % 100 === 0)
        .crossJoin(reps(LiMult))
        .select(li.columns.map {
          case "l_suppkey" =>
            (col("l_suppkey") + col("rep") * lit(Sub)).as("l_suppkey")
          case c => col(c)
        }.toSeq: _*)
      li.unionByName(liExtra).coalesce(4).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "documents", "embeddings"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(sf(sfd), s"$t.parquet"),
          java.nio.file.Paths.get(dir, s"$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      marker.createNewFile()
    }
    dir
  }

  private def queryRows(name: String, d: String): Long = {
    val n = shuffledRecords(SparkEntry.queries(name)(spark, d).count())
    graft.CachedPlans.release()
    n
  }

  test("hot twins: planted skew is real (synthesis sanity)") {
    // if the synthesis rots, every gate below measures uniform data
    // and passes vacuously — pin the skew first
    val ev = Tables(spark, hotDir("0.01"), "events")
    val topShare = ev.groupBy(col("user_id")).count()
      .agg((max(col("count")) /
        percentile_approx(col("count"), lit(0.5), lit(1000))).as("r"))
      .head.getDouble(0)
    assert(topShare > 20,
      f"hot user only $topShare%.0fx the median — skew not planted")
    val li = Tables(spark, hotDir("0.01"), "lineitem")
    val supsPerOrder = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("k"))
    val (hotK, medK) = {
      val r = supsPerOrder.agg(max(col("k")),
        percentile_approx(col("k"), lit(0.5), lit(1000))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(hotK >= LiMult * medK,
      s"whale orders have $hotK suppliers vs median $medK — hub not planted")
  }

  test("sessionize skew decade: shuffle tracks rows, hot user stays one-task-bounded") {
    // a window per user cannot split a key, so the gate is (a) the
    // wire grows with ROWS across the decade (no skew-triggered
    // amplification), (b) no task reads an outsized share — the hot
    // user's whole burst is still a sliver of the corpus. The
    // max-task share is only meaningful at cluster-like partition
    // granularity: at the suite default of 4 shuffle partitions the
    // fair share is already 25%, drowning any whale signal.
    val small = queryRows("q_sessionize", hotDir("0.01"))
    val big = queryRows("q_sessionize", hotDir("0.1"))
    val growth = big.toDouble / small
    info(f"sessionize skew decade: $small -> $big (x$growth%.1f)")
    assert(growth < 20, f"sessionize wire superlinear under skew: x$growth%.1f")
    // A window can never split a key, so the irreducible skew floor
    // is the HASH PLACEMENT of the hot keys into buckets — computed
    // here with the same Murmur3+pmod Spark's HashPartitioning uses.
    // The gate pins that the PLAN adds no concentration beyond that
    // floor (no global window, no single-reducer stage). The floor
    // itself is a small-N artifact: 15 hot keys into 32 buckets
    // stack badly (measured ~0.4 max-bucket share), but at cluster
    // scale (millions of keys, 10^4-10^5 partitions) placement
    // concentrates to uniform — the failure mode that DOESN'T vanish
    // is exactly the plan-added kind this asserts against.
    // AQE's small-partition coalescing re-concentrates a 3.6MB toy
    // shuffle into ~1MB tasks (minPartitionSize) — correct at this
    // scale, pure noise for the placement measurement; off for the
    // probe, exactly like SkewSpec's join gate.
    val skewConfs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prevConfs = skewConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val keyShare = Tables(spark, hotDir("0.1"), "events")
        .groupBy(pmod(hash(col("user_id")), lit(32)).as("b"))
        .agg(count(lit(1)).as("n"))
        .agg((max(col("n")).cast("double") / sum(col("n"))).as("s"))
        .head.getDouble(0)
      val (maxTask, total) = shuffleReadSkew(
        SparkEntry.queries("q_sessionize")(spark, hotDir("0.1")).count())
      graft.CachedPlans.release()
      val share = maxTask.toDouble / total
      info(f"sessionize max-task share $share%.3f vs hash-placement " +
        f"floor $keyShare%.3f (32 partitions)")
      assert(share <= keyShare * 1.5 + 0.05,
        f"task share $share%.3f exceeds the key-placement floor " +
          f"$keyShare%.3f — the plan concentrates beyond hash placement")
    } finally prevConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("funnel skew decade: map-side combine absorbs the hot burst") {
    // funnel steps are min/conditional aggregates — partial
    // aggregation collapses the hot user's 100x rows to one row per
    // (user, grouping) BEFORE the wire, so the skewed corpus must
    // shuffle barely more than the uniform one despite ~2x the rows
    val uniform = queryRows("q_funnel_steps", sf("0.1"))
    val skewed = queryRows("q_funnel_steps", hotDir("0.1"))
    val ratio = skewed.toDouble / uniform
    info(f"funnel wire: uniform $uniform vs skewed $skewed (x$ratio%.2f)")
    assert(ratio < 1.5,
      f"funnel wire grew x$ratio%.2f under skew — partial aggregation " +
        "is not absorbing the hot keys map-side")
  }

  test("self-join on the hot decade: AQE splits the whale user at runtime") {
    // the attribution/overlap family shape (events self-joined on
    // user) — the hot user's pair space is EvMult^2 x the median's;
    // without the AQE split one task serializes it
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // 64 reduce partitions: at the suite default of 4, the 15 hot
      // users average out across partitions and no partition ever
      // clears the factor — exactly how a too-coarse production
      // shuffle hides a whale until the task OOMs. At 64 the
      // partition holding the largest user is ~3x the median.
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val e = Tables(spark, hotDir("0.1"), "events").repartition(16)
        .select(col("user_id"), col("event_id"), col("ts"))
      val left = e.select(col("user_id"), col("event_id").as("ea"))
      val right = e.select(col("user_id"), col("event_id").as("eb"))
      val joined = left.join(right, "user_id")
      val qe = joined.queryExecution
      qe.executedPlan.execute().foreachPartition(_ => ())
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(400))
      assert(plan.contains("skew=true"),
        s"AQE did not split the planted whale user:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---------------------------------------------------------------
  // sf1-hot leg (VERDICT r10 #6): the gates above measure hot keys of
  // ~10^3-10^4 rows; this leg re-measures them where one key carries
  // >= 10^6 rows — the "one entity posting 1000x more points" regime
  // the reference's per-key upsert actually sees at fleet scale. It
  // needs the soak-synthesized sf1 dir (scripts/scale_testdata.py,
  // ~180MB) and several minutes at local[4], so it is env-gated:
  // `scripts/skew_sf1.sh` synthesizes + runs it; unset, the tests
  // CANCEL (visible, never a vacuous pass).
  // ---------------------------------------------------------------

  private val Sf1Dir = "target/sfsynth/sf1"
  private val MegaUser = 100L // copy-0 hot user promoted to megawhale

  private def sf1Gate(): Unit = {
    val gated = sys.env.contains("SPARK_GRAFT_SKEW_SF1")
    assume(gated,
      "sf1-hot leg runs via scripts/skew_sf1.sh (SPARK_GRAFT_SKEW_SF1)")
    val synthed = new java.io.File(s"$Sf1Dir/lineitem.parquet").exists
    assume(synthed, s"$Sf1Dir missing — run scripts/scale_testdata.py first")
  }

  /** sf1-hot twin: %100 hot users at x100 as in the small twins, PLUS
    * one megawhale key replicated until it carries >= 1e6 rows. The
    * sf1 base has copy-offset ids up to ~9e9, so replica event_ids
    * come from monotonically_increasing_id into disjoint 1e12 blocks
    * (the +rep*Sub scheme of the small twins would land inside the
    * next copy's base block — the exact collision ADVICE r10 found in
    * scale_testdata.py).
    */
  private def sf1HotDir(): String = {
    val dir = "/tmp/graft_skew_sf1hot_v1"
    val marker = new java.io.File(s"$dir/_SYNTH_DONE")
    if (!marker.exists) {
      new java.io.File(dir).mkdirs()
      val e = Tables(spark, Sf1Dir, "events")
      def reps(m: Long) = spark.range(1, m).select(col("id").as("rep"))
      def fresh(block: Long) =
        (monotonically_increasing_id() + lit(block)).as("event_id")
      val hotExtra = e.filter(col("user_id") % 100 === 0)
        .crossJoin(reps(EvMult))
        .select(fresh(1000000000000L),
          (col("ts").cast("long") + col("rep")).cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      val megaBase = e.filter(col("user_id") === MegaUser)
      val baseCnt = megaBase.count()
      val megaMult = math.max(2L, (1050000L + baseCnt - 1) / baseCnt)
      val megaExtra = megaBase.crossJoin(reps(megaMult))
        .select(fresh(2000000000000L),
          (col("ts").cast("long") + col("rep")).cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      e.unionByName(hotExtra.select(e.columns.map(col).toSeq: _*))
        .unionByName(megaExtra.select(e.columns.map(col).toSeq: _*))
        .coalesce(8).write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      val li = Tables(spark, Sf1Dir, "lineitem")
      val liExtra = li.filter(col("l_orderkey") % 100 === 0)
        .crossJoin(reps(LiMult))
        .select(li.columns.map {
          case "l_suppkey" =>
            // suppkey only needs freshness per (order, rep); base
            // suppkeys are < 1e10, so a 1e12 block is disjoint
            (col("l_suppkey") + col("rep") * lit(Sub)
              + lit(1000000000000L)).as("l_suppkey")
          case c => col(c)
        }.toSeq: _*)
      li.unionByName(liExtra).coalesce(8).write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "documents", "embeddings"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(Sf1Dir, s"$t.parquet"),
          java.nio.file.Paths.get(dir, s"$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      marker.createNewFile()
    }
    dir
  }

  test("sf1-hot synthesis sanity: one key carries a million rows") {
    sf1Gate()
    val ev = Tables(spark, sf1HotDir(), "events")
    val mega = ev.filter(col("user_id") === MegaUser).count()
    val medianRows = ev.groupBy(col("user_id")).count()
      .agg(percentile_approx(col("count"), lit(0.5), lit(1000)))
      .head.getLong(0)
    info(s"megawhale user $MegaUser: $mega rows, median user $medianRows")
    assert(mega >= 1000000L,
      s"megawhale only $mega rows — the sf1-hot leg is not measuring " +
        "the million-row-key regime")
    assert(mega >= 1000L * medianRows,
      s"megawhale $mega vs median $medianRows — <1000x, skew too weak")
    val ids = ev.agg(count(lit(1)), countDistinct(col("event_id"))).head
    assert(ids.getLong(0) == ids.getLong(1),
      s"replica event_ids collided: ${ids.getLong(0)} rows, " +
        s"${ids.getLong(1)} distinct")
  }

  test("sf1-hot sessionize: million-row key stays at the hash-placement floor") {
    sf1Gate()
    val dir = sf1HotDir()
    // same rubric as the sf0.1 leg: the irreducible floor is the hash
    // placement of the keys into 32 buckets — with one key owning
    // ~1/3 of the corpus the floor itself is large, and the gate pins
    // that the PLAN adds no concentration beyond it (no global
    // window, no single-reducer stage between scan and result)
    val skewConfs = Seq(
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prevConfs = skewConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val keyShare = Tables(spark, dir, "events")
        .groupBy(pmod(hash(col("user_id")), lit(32)).as("b"))
        .agg(count(lit(1)).as("n"))
        .agg((max(col("n")).cast("double") / sum(col("n"))).as("s"))
        .head.getDouble(0)
      val (maxTask, total) = shuffleReadSkew(
        SparkEntry.queries("q_sessionize")(spark, dir).count())
      graft.CachedPlans.release()
      val share = maxTask.toDouble / total
      info(f"sf1-hot sessionize max-task share $share%.3f vs " +
        f"hash-placement floor $keyShare%.3f (32 partitions)")
      assert(share <= keyShare * 1.5 + 0.05,
        f"task share $share%.3f exceeds the key-placement floor " +
          f"$keyShare%.3f — the plan concentrates beyond hash placement")
    } finally prevConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sf1-hot funnel: map-side combine absorbs the megawhale") {
    sf1Gate()
    // measured live: a cross-LAYOUT wire ratio is the wrong gate —
    // partial-agg output is (input splits x groups present per
    // split), and the twin has ~2x the uniform dir's splits, so the
    // wire read x2.01 with the combine working perfectly. The gate
    // that expresses "the burst is absorbed" is the REDUCTION factor:
    // the megawhale's 1e6 rows must collapse map-side, so the wire is
    // orders of magnitude under the row count (a plan that shuffles
    // raw events reads ~1x here and fails loudly).
    val dir = sf1HotDir()
    val rows = Tables(spark, dir, "events").count()
    val wire = queryRows("q_funnel_steps", dir)
    val reduction = rows.toDouble / wire
    info(f"sf1-hot funnel: $rows rows -> $wire wire " +
      f"(x$reduction%.1f map-side reduction)")
    assert(reduction > 5,
      f"funnel wire $wire for $rows input rows (x$reduction%.1f) — " +
        "partial aggregation is not absorbing the megawhale map-side")
  }

  test("sf1-hot triangle: wire stays on the intrinsic pair+wedge space") {
    sf1Gate()
    // measured live: the naive cross-decade wire ratio read x42 not
    // x10 — NOT a leak (edges/wedges/max-outdeg scale exactly x10,
    // duckdb-verified) but a plan transition: at sf0.1-hot the
    // closing-edge join broadcasts, so wedges never hit the wire; at
    // sf1-hot the 1.48M-edge list outgrows the broadcast threshold
    // and the wedge stream shuffles ONCE for the sort-merge closing
    // join — the expected cost shape at cluster scale. The honest
    // gate bounds the wire by the graph's INTRINSIC sizes, both
    // computed from the same pruned edge list the query derives:
    // pairs (the weighted aggregate input) + wedges (the oriented
    // out-degree pair space), allowing each to cross the wire at
    // most ~twice (groupBy + join sides).
    val dir = sf1HotDir()
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val pairs = li.groupBy(col("ok"))
      .agg(count(lit(1)).as("k"))
      .agg(sum(col("k") * (col("k") - 1) / 2)).head.getDouble(0)
    val e = graft.queries.GraphQueries.coSupplyEdges(spark, dir)
    val deg = e.select(col("sa").as("v"))
      .unionAll(e.select(col("sb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val da = deg.select(col("v").as("sa"), col("deg").as("dega"))
    val db = deg.select(col("v").as("sb"), col("deg").as("degb"))
    val wedges = e.join(da, "sa").join(db, "sb")
      .select(when(col("dega") < col("degb") ||
        (col("dega") === col("degb") && col("sa") < col("sb")),
        col("sa")).otherwise(col("sb")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * (col("d") - 1) / 2)).head.getDouble(0)
    graft.CachedPlans.release()
    val wire = queryRows("q_graph_triangles", dir)
    val bound = 2.0 * (pairs + wedges)
    info(f"sf1-hot triangle: pairs=$pairs%.0f wedges=$wedges%.0f " +
      f"wire=$wire (bound 2x(p+w)=$bound%.0f)")
    assert(wire <= bound,
      f"triangle wire $wire exceeds 2x the intrinsic pair+wedge " +
        f"space $bound%.0f — work beyond the pruned wedge space")
  }

  test("triangle census skew decade: whale orders stay on the pruned wedge space") {
    // whale orders multiply the per-order co-supply pair space
    // (LiMult^2 x); the p95 weight pruning + degree-ordered wedges
    // must keep the decade exponent near the hot-order growth (x10),
    // not the pair-space blowup
    val small = queryRows("q_graph_triangles", hotDir("0.01"))
    val big = queryRows("q_graph_triangles", hotDir("0.1"))
    val growth = big.toDouble / small
    info(f"triangle skew decade: $small -> $big (x$growth%.1f)")
    assert(growth < 25,
      f"triangle wire x$growth%.1f across the skewed decade — hub " +
        "pair space leaking past the pruning")
  }
}
