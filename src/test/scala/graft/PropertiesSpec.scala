package graft

import org.apache.spark.sql.functions._
import graft.operators.TrackPipeline

/** Algebraic laws of the pipeline operators (SURVEY.md §5.3):
  * latest-per-key == sort-desc-then-first, retention idempotence,
  * upsert/dedup absorption — checked over seeded random inputs
  * (deterministic across runs).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private type Row4 = (Long, java.sql.Timestamp, Long, Double)

  /** Seeded random batches; ids unique within a batch. */
  private def genRows(seed: Long, n: Int = 40): List[Row4] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      (1L + rng.nextInt(5),
        new java.sql.Timestamp(1700000000000L + rng.nextInt(100000)),
        i * 1000L + seed, // unique tie-break id
        rng.nextDouble() * 200 - 100)
    }.toList
  }

  private val trials = 1L to 15L

  test("latestPerKey == sort-desc-then-first per key") {
    trials.foreach { seed =>
      val rows = genRows(seed)
      val got = TrackPipeline
        .latestPerKey(rows.toDF("key", "ts", "id", "v"), "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.maxBy(r => (r._2.getTime, r._3))._3
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("retention filter is idempotent") {
    trials.foreach { seed =>
      val df = genRows(seed).toDF("key", "ts", "id", "v")
      val cutoff = lit("2023-11-14 22:13:30").cast("timestamp")
      val once = TrackPipeline.retained(df, "ts", cutoff)
      val twice = TrackPipeline.retained(once, "ts", cutoff)
      assert(once.count() == twice.count(), s"seed=$seed")
    }
  }

  test("upsert(snapshot, fresh) == latestPerKey(snapshot ∪ fresh)") {
    trials.foreach { seed =>
      val snap = genRows(seed).toDF("key", "ts", "id", "v")
      val fresh = genRows(seed + 1000).toDF("key", "ts", "id", "v")
      val viaUpsert = TrackPipeline.upsert(snap, fresh, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val direct = TrackPipeline
        .latestPerKey(snap.unionByName(fresh), "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      assert(viaUpsert == direct, s"seed=$seed")
    }
  }

  test("last-write-wins absorbs duplicate delivery") {
    trials.foreach { seed =>
      val df = genRows(seed).toDF("key", "ts", "id", "v")
      val doubled = df.unionByName(df)
      val a = TrackPipeline.latestPerKey(doubled, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      val b = TrackPipeline.latestPerKey(df, "key", "ts", "id")
        .select($"key", $"latest.id").as[(Long, Long)].collect().toMap
      assert(a == b, s"seed=$seed")
    }
  }

  test("jaccard pair invariants: symmetry-free ids, bounded overlap") {
    val docs = Tables(spark, sf(), "documents")
    val pairs = graft.operators.Dedup
      .jaccardShinglePairs(docs, "doc_id", "text", 3, 0.3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, common, na, nb, j) =>
      assert(a < b, s"pair not canonical: ($a,$b)")
      assert(common >= 1 && common <= math.min(na, nb),
        s"overlap out of bounds: $common vs ($na,$nb)")
      assert(j >= 0.3 && j <= 1.0, s"jaccard out of range: $j")
      assert(math.abs(j - common.toDouble / (na + nb - common)) < 1e-12)
    }
    // no duplicate pairs
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("jaccard threshold is monotone: tighter threshold ⊆ looser") {
    val docs = Tables(spark, sf(), "documents")
    def ids(t: Double): Set[(Long, Long)] = graft.operators.Dedup
      .jaccardShinglePairs(docs, "doc_id", "text", 3, t)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val loose = ids(0.3)
    val tight = ids(0.6)
    assert(tight.subsetOf(loose),
      s"tight threshold found pairs the loose one missed: ${tight -- loose}")
    assert(loose.nonEmpty)
  }

  test("LSH candidates are a superset of no false-negative band collisions") {
    // any pair the exact jaccard marks ≥ 0.9 must collide in ≥1 of 32
    // bands with overwhelming probability — at band size r=4,
    // P(miss) = (1-j^4)^32 ≤ 3e-3 at j=0.9; the fixed corpus has no
    // miss (deterministic given the fixed hash family)
    val docs = Tables(spark, sf(), "documents")
    val strong = graft.operators.Dedup
      .jaccardShinglePairs(docs, "doc_id", "text", 3, 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = graft.operators.Dedup
      .minhashLshPairs(docs, "doc_id", "text", 3, 128, 32, 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    assert(strong.subsetOf(lsh),
      s"LSH missed strong pairs: ${strong -- lsh}")
  }

  test("connectedComponents == brute-force reachability on random graphs") {
    trials.foreach { seed =>
      val rng = new scala.util.Random(seed)
      val n = 20 + rng.nextInt(20)
      val pairs = (1 to n).map { _ =>
        (rng.nextInt(25).toLong, rng.nextInt(25).toLong)
      }.filter { case (a, b) => a != b }.distinct
      if (pairs.nonEmpty) {
        // brute force: repeated relaxation to the transitive min
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        var label = nodes.map(x => x -> x).toMap
        val sym = pairs ++ pairs.map(_.swap)
        var changed = true
        while (changed) {
          changed = false
          sym.foreach { case (a, b) =>
            if (label(b) < label(a)) { label += a -> label(b); changed = true }
          }
        }
        val want = label
        val got = graft.operators.Dedup
          .connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("native as-of == per-row argmax scan on random fixtures") {
    trials.take(8).foreach { seed =>
      val rng = new scala.util.Random(seed)
      def t(ms: Int) = new java.sql.Timestamp(1700000000000L + ms.toLong)
      val left = (1 to 30).map { i =>
        (rng.nextInt(4).toLong, t(rng.nextInt(1000)), i.toLong) }
      // unique right timestamps: equal (key, ts) right rows have no
      // defined winner in ANY as-of formulation (sort tie), so the
      // generator avoids them rather than asserting on chance
      val rightTs = rng.shuffle((0 until 1000).toList).take(30)
      val right = rightTs.zipWithIndex.map { case (ms, i) =>
        (rng.nextInt(4).toLong, t(ms), 100L + i) }
      // brute-force truth: newest right at-or-before each left row
      val want = left.map { case (k, ts, lid) =>
        val m = right.filter(r => r._1 == k && !r._2.after(ts))
        lid -> (if (m.isEmpty) None
                else Some(m.maxBy(r => r._2.getTime)._3))
      }.toMap
      val got = graft.plans.AsOfJoinNative.asOfMerge(
          left.toDF("k", "ts", "lid"),
          right.toDF("k", "ts", "rid"), "k", "ts")
        .select($"lid", $"rid").as[(Long, Option[Long])]
        .collect().toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("SQ8 with an unpruned shortlist degenerates to exact brute force") {
    // Quantization error lives ONLY in shortlist selection (the
    // re-rank reads raw floats), so annSq8 with shortlist = corpus
    // must reproduce brute force EXACTLY on any input — scores,
    // ranks and ties included. Seeded random corpora push this
    // through the real operator end-to-end; a violation would mean
    // the re-rank leaked quantized values or dropped candidates.
    trials.take(5).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val vecs = (0L until 40L).map { id =>
        (id, Seq.fill(8)((rng.nextDouble() * 4 - 2).toFloat))
      }
      val df = vecs.toDF("vec_id", "embedding")
      val qs = df.filter($"vec_id" < 3)
      val full = graft.operators.Similarity
        .annSq8(df, qs, "vec_id", "embedding", k = 5, shortlist = 40)
        .select($"q_id", $"rank", $"id").as[(Long, Int, Long)]
        .collect().toSet
      val brute = graft.operators.Similarity
        .topKBruteForce(df, qs, "vec_id", "embedding", k = 5)
        .select($"q_id", $"rank", $"id").as[(Long, Int, Long)]
        .collect().toSet
      assert(full == brute,
        s"seed=$seed: unpruned SQ8 must equal brute force")
    }
  }

  test("substring spans: verbatim copies score frac 1.0, unique docs absent") {
    // a doc duplicated verbatim shares EVERY 10-token span with its
    // copy; a doc with a globally unique vocabulary shares none
    val d = Tables(spark, sf(), "documents").select($"doc_id", $"text")
      .filter(length($"text") > 200).limit(5)
    val uniq = Seq((777000L,
      (1 to 40).map(i => s"uniqtok$i").mkString(" "))).toDF("doc_id", "text")
    val corpus = d
      .unionByName(d.select(($"doc_id" + 500000).as("doc_id"), $"text"))
      .unionByName(uniq)
    // the SHIPPED q_dedup_substring_spans pipeline on the
    // constructed corpus (an inline re-implementation here pinned
    // nothing about the product code)
    val fracs = graft.queries.TextQueries.substringSpanFracs(corpus)
      .select($"doc_id", $"dup_span_frac")
      .as[(Long, Double)].collect().toMap
    d.select($"doc_id").as[Long].collect().foreach { id =>
      assert(fracs.get(id).contains(1.0),
        s"verbatim copy of $id must be fully flagged: ${fracs.get(id)}")
      assert(fracs.get(id + 500000).contains(1.0))
    }
    assert(!fracs.contains(777000L),
      "globally unique doc must not be flagged")
  }

  test("BM25: adding an unmatched query term never changes doc ranking") {
    val d = Tables(spark, sf(), "documents")
    // the SHIPPED q_text_bm25 scoring pipeline, parameterized by
    // query terms (an inline copy of the math here could not fail
    // for a regression in the product query)
    def top(terms: Seq[String]): Seq[Long] = {
      val q = terms.map((1, _)).toDF("query_id", "term")
      graft.queries.TextQueries.bm25Rank(d, q)
        .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    }
    val base = top(Seq("spark", "join"))
    val withGhost = top(Seq("spark", "join", "zzznotaword"))
    assert(base.nonEmpty && base == withGhost,
      s"unmatched term changed ranking: $base vs $withGhost")
  }

  test("chunker boundary arithmetic: exact chunk counts at the edges") {
    // n tokens → 1 + max(0, ceil((n-64)/48)) chunks; when n > 64 the
    // last chunk holds 17..64 tokens — never a degenerate suffix
    // shorter than the 16-token overlap (those would duplicate
    // content already fully covered by the previous chunk)
    def expectChunks(n: Int): Int =
      1 + math.max(0, math.ceil((n - 64.0) / 48).toInt)
    def lastLen(n: Int): Int =
      n - 48 * (expectChunks(n) - 1)
    Seq(1, 16, 63, 64, 65, 111, 112, 113, 160, 161, 500).foreach { n =>
      val c = expectChunks(n)
      val l = lastLen(n)
      assert(c >= 1 && (n <= 64 || l >= 17) && l <= 64,
        s"n=$n chunks=$c last=$l violates the boundary contract")
    }
    // and every real-corpus doc obeys the same closed form — via an
    // OUTER join with coverage checks: the old inner join let a
    // chunker that drops docs (or returns nothing) pass with bad==0
    val chunked = graft.queries.TextQueries
      .defs("q_chunk_sliding")(spark, sf())
    val perDoc = chunked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("chunks"),
        max_by(col("chunk_tokens"), col("chunk_id")).as("last_len"))
    val joined = Tables(spark, sf(), "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .join(perDoc, Seq("doc_id"), "left")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Int]("n")
      assert(!r.isNullAt(r.fieldIndex("chunks")),
        s"doc ${r.getAs[Long]("doc_id")} dropped by the chunker")
      val chunks = r.getAs[Number]("chunks").longValue
      assert(chunks == expectChunks(n),
        s"doc ${r.getAs[Long]("doc_id")}: $chunks chunks for $n tokens")
      // the last chunk must hold 17..64 tokens when n > 64 (never a
      // degenerate suffix inside the previous chunk's overlap)
      val last = r.getAs[Number]("last_len").longValue
      assert(last == lastLen(n),
        s"doc ${r.getAs[Long]("doc_id")}: last chunk $last != " +
          s"${lastLen(n)} for $n tokens")
    }
  }

  test("boilerplate ratio bounded; shingle totals match the token count") {
    val rows = graft.queries.TextQueries
      .defs("q_text_boilerplate")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val toks = Tables(spark, sf(), "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio out of range: $r")
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_shingles"))
      // positions = tokens − 4 for every doc with ≥5 tokens
      val n = toks(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_shingles") == n - 4,
        s"position count mismatch for $r (tokens=$n)")
    }
  }

  test("vocab growth: both curves strictly monotone, vocab ≤ tokens") {
    val rows = graft.queries.TextQueries
      .defs("q_text_vocab_growth")(spark, sf()).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val vs = rows.map(_.getAs[Long]("vocab_size"))
    val ts = rows.map(_.getAs[Long]("n_tokens"))
    assert(vs.zip(vs.tail).forall { case (a, b) => b >= a })
    assert(ts.zip(ts.tail).forall { case (a, b) => b > a })
    rows.foreach { r =>
      assert(r.getAs[Long]("vocab_size") <= r.getAs[Long]("n_tokens"))
      val beta = r.getAs[Double]("heaps_beta")
      assert(beta > 0 && beta < 1, s"Heaps exponent out of (0,1): $r")
    }
  }

  test("keyness: LLR non-negative and zero iff proportional counts") {
    val rows = graft.queries.TextQueries
      .defs("q_text_keyness")(spark, sf()).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      // Dunning LLR is a deviance — never negative (up to rounding)
      assert(r.getAs[Double]("llr") >= -1e-6, s"negative LLR: $r")
      assert(r.getAs[Long]("n_target") + r.getAs[Long]("n_rest") > 0)
    }
    val llrs = rows.map(_.getAs[Double]("llr"))
    assert(llrs.zip(llrs.tail).forall { case (a, b) => a >= b },
      "top-20 not LLR-descending")
  }
}
