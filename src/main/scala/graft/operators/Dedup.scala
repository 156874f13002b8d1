package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.plans.Sketches

/** Document deduplication operators (BASELINE.json north star).
  *
  * Scale design, in order of cost at 100 TB:
  *  - [[exactGroups]] / [[dropExact]]: one hash-groupBy shuffle on a
  *    16-byte digest — the cheapest possible full-corpus dedup.
  *  - [[jaccardShinglePairs]]: inverted-index self-join on shingles —
  *    never materializes the O(n²) pair space, only pairs that share
  *    ≥1 shingle. Hot (stop-phrase) shingles are the skew risk:
  *    `maxShingleDocFreq` drops shingles appearing in more than that
  *    many docs (standard df-pruning; a shingle shared by half the
  *    corpus carries no near-dup signal but dominates the join).
  *  - [[minhashLshCandidates]] / [[minhashLshPairs]]: the 100 TB path.
  *    Signature size is constant per doc (k hashes) regardless of doc
  *    length; candidate generation joins on (band, bandHash) buckets,
  *    so the shuffle volume is k/r keys per doc, and verification
  *    runs per-candidate-pair as a codegen'd array intersection.
  *  - [[simhashPairs]]: constant 8-byte sketch per doc; banding on
  *    8-bit chunks (pigeonhole: hamming ≤ 7 ⇒ some chunk equal)
  *    keeps candidate generation to 8 equality joins.
  *
  * The sketches themselves are native Catalyst expressions
  * ([[graft.plans.Sketches]]) — the HOF formulations in TextFunctions
  * are interpreted and hash every shingle k times (~400 s/query at
  * sf0.1); the native ones hash once per shingle (sub-second).
  */
object Dedup {

  /** Exact-duplicate groups keyed by md5(text): group digest, copy
    * count, canonical (minimum) id.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  /** Exact dedup: keep the minimum-id row per distinct text. */
  def dropExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as(idCol))
      .drop("text_md5")

  /** Exact n-gram Jaccard near-dup pairs via an inverted-index
    * self-join on distinct shingles. Returns
    * (id_a, id_b, common, n_a, n_b, jaccard) for jaccard ≥ threshold.
    */
  def jaccardShinglePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(wordShingles(col(textCol), n))).as("sh"))
    val pruned = (maxShingleDocFreq match {
      case Some(maxDf) =>
        val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select("sh")
        sh.join(broadcast(hot), Seq("sh"), "left_anti")
      case None => sh
      // persisted: the exploded shingle index feeds the self-join
      // (twice) and the per-doc counts — 3 reuses of one scan
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = pruned.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val pairs = pruned.as("a")
      .join(pruned.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(cnt).as("ca"), col("id_a") === col("ca.id"))
      .join(broadcast(cnt).as("cb"), col("id_b") === col("cb.id"))
      .select(col("id_a"), col("id_b"), col("common"),
        col("ca.n_sh").as("n_a"), col("cb.n_sh").as("n_b"),
        (col("common").cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - col("common")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + LSH candidate pairs: band the k-slot signature into
    * `bands` buckets of k/bands rows each and join docs that share
    * any (band, bandHash) bucket.
    */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must be a multiple of bands")
    val r = k / bands
    val sigs = docs.select(col(idCol).as("id"),
      Sketches.minhashSignature(
        array_distinct(wordShingles(col(textCol), n)), k).as("sig"))
    // persist the (tiny: bands rows per doc) band table — both sides
    // of the self-join would otherwise recompute shingling+signatures
    val bandKeys = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => hash(j, slice(col("sig"), j * lit(r) + lit(1), lit(r)))))
        .as(Seq("band", "band_hash")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs: LSH candidates verified with the
    * exact per-pair Jaccard (codegen'd array_intersect — no shuffle;
    * the quadratic space is never touched, only LSH survivors).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val shingleSets = docs.select(col(idCol).as("id"),
      array_distinct(wordShingles(col(textCol), n)).as("shs"))
    minhashLshCandidates(docs, idCol, textCol, n, k, bands)
      .join(shingleSets.as("sa"), col("id_a") === col("sa.id"))
      .join(shingleSets.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa.shs"), col("sb.shs"))).cast("double") /
          size(array_union(col("sa.shs"), col("sb.shs")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit sketch per doc over word
    * 3-gram shingles (shingles, not tokens — order-sensitivity makes
    * unrelated docs decorrelate to hamming ≈ 32 even on a shared
    * vocabulary), banded on the eight 8-bit chunks (pigeonhole: any
    * pair at hamming ≤ 7 must agree on at least one chunk), exact
    * hamming verification on candidates.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 7): DataFrame = {
    val sketched = docs.select(col(idCol).as("id"),
      Sketches.simhash64(wordShingles(col(textCol), 3)).as("sim"))
    // shiftright needs a literal shift in the Scala DSL; chunk in SQL.
    // Persisted: 8 small rows per doc, reused by both self-join sides.
    val chunked = sketched.select(col("id"), col("sim"),
      posexplode(expr(
        "transform(sequence(0, 7), j -> (shiftright(sim, j * 8) & 255L))"))
        .as(Seq("chunk", "chunk_val")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.TextFunctions.hamming64(col("a.sim"), col("b.sim"))
          .as("hamming"))
      // verify BEFORE dedup: the hamming filter kills ~99.9% of the
      // banding candidates, so the distinct only shuffles survivors
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup pairs within a blocking key (e.g. a cluster
    * label or LSH bucket): exact double-precision cosine on the
    * blocked pair space. Blocking keeps the join linear-ish; the
    * cosine itself is a codegen'd higher-order fold.
    */
  def embeddingPairsCosine(vecs: DataFrame, idCol: String, vecCol: String,
      blockCol: String): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).as("vec"))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.plans.CosineSimExpr
          .cosine_native(col("a.vec"), col("b.vec")).as("cos"))
  }
}
