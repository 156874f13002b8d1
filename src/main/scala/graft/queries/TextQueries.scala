package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Text-analysis + deduplication corpus over `documents` and
  * `embeddings` (north-star extensions, BASELINE.json). Approximate
  * operators (MinHash-LSH, SimHash) have no SQL oracle — the driver
  * records a rows-only check and DedupSpec verifies them against the
  * exact-Jaccard ground truth instead.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    // fanOut (r13): every text query's tokenize/shingle/score work
    // otherwise runs inside the single-row-group scan's one task.
    // Safe for all consumers — no order-sensitive aggregate
    // (collect_list/first/last) exists in this file; no-op at scale.
    graft.Tables.fanOut(Tables(s, dir, "documents"), col("doc_id"))

  /** The q_dedup_substring_spans pipeline over any (doc_id, text)
    * corpus: per doc, the fraction of its 10-token spans shared with
    * at least one OTHER doc. `private[graft]` so PropertiesSpec can
    * drive the SHIPPED pipeline with a constructed corpus (verbatim
    * copies must score 1.0, globally unique docs must be absent) —
    * an inline test copy would pin nothing about this code.
    */
  private[graft] def substringSpanFracs(corpus: DataFrame): DataFrame = {
    val sp = graft.CachedPlans.cache(corpus
      .select(col("doc_id"),
        explode(wordShingles(col("text"), 10)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h")))
    val shared = sp.distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2)
    val nsp = sp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    sp.join(shared, "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
      .join(nsp, "doc_id")
      .select(col("doc_id"), col("n_dup_spans"), col("n_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 4)
          .as("dup_span_frac"))
  }

  /** The q_text_bm25 scoring pipeline over any corpus and query-term
    * table: top-10 (query_id, rank, doc_id, score). `private[graft]`
    * so PropertiesSpec can pin the ghost-term invariant (an
    * unmatched term never changes ranking) on the SHIPPED math.
    */
  private[graft] def bm25Rank(corpus: DataFrame,
      qterms: DataFrame): DataFrame = {
    val toks = corpus.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val gl = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(((col("n_docs") - col("df")).cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0)
      .cast("decimal(18,6)").cast("double")
    val tfPart = (col("tf").cast("double") * 2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), col("tok") === col("term"))
      .join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(gl))
      .select(col("query_id"), col("doc_id"),
        (idf * tfPart).cast("decimal(18,6)").as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score").cast("double"), 4).as("score"))
  }

  /** documents ∪ planted copies of doc_id<20 (id-shifted) — gives the
    * exact-dedup queries real duplicate groups to find. The shift is
    * an IN-PLAN offset (max(doc_id)+1, one-row broadcast — the
    * erCorpus precedent): a fixed constant would silently collide
    * with real ids once the corpus outgrows it, corrupting the
    * min(doc_id) canonical groups with the oracle agreeing on the
    * same wrong answer.
    */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val off = d.agg((max(col("doc_id")) + 1).as("off"))
    d.unionByName(d.filter(col("doc_id") < 20)
      .crossJoin(broadcast(off))
      .select((col("doc_id") + col("off")).as("doc_id"), col("text")))
  }

  /** Shared quality sub-expressions (mirrored in oracle SQL). */
  private def qualityCols = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val stops = size(filter(toks,
      x => array_contains(array(lit("the"), lit("a")), x)))
    (nTok, stops.cast("double") / nTok)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Word-trigram language model with add-α smoothing: trigram
    // counts, their (w1 w2) context totals DERIVED from the trigram
    // counts themselves (so numerator and denominator can never
    // disagree about tokenization edges), and the smoothed
    // conditional p(w3 | w1 w2) = (c+α)/(ctx+α·V). Shape: one
    // explode of per-doc trigram arrays into a hash aggregate
    // (map-side combined — the n-gram zipf head collapses early),
    // a second tiny aggregate per context, the vocabulary size as a
    // one-row broadcast, and a TakeOrderedAndProject top-30. This is
    // the counting backbone of KN/Stupid-Backoff LMs used for
    // perplexity-based quality filtering at corpus scale.
    "q_text_ngram_lm" -> { (s, dir) =>
      val alpha = 0.5
      // materialize the token array BEFORE the HOF lambda: lambdas
      // evaluate interpreted per element, and an element_at over the
      // raw split() EXPRESSION re-splits the whole document for
      // every trigram position (measured 4.1 s → 1.2 s at sf0.1)
      val tri = docs(s, dir)
        .select(split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(explode(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2))))
          .as("trigram"))
        .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
      val vocab = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      // context totals as a FULL-PARTITION window over the trigram
      // table — a self-join back to a second aggregate re-runs the
      // corpus explode (Catalyst does not dedupe the renamed
      // subtree); measured 3.7 s → this shape at sf0.1
      tri.withColumn("context",
          concat_ws(" ", slice(split(col("trigram"), " "), 1, 2)))
        .withColumn("n_ctx", sum(col("n"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("context"))))
        .crossJoin(broadcast(vocab))
        .select(col("trigram"), col("n"), col("n_ctx"),
          round((col("n") + alpha) / (col("n_ctx") + col("v") * alpha),
            6).as("p_smoothed"))
        .orderBy(col("n").desc, col("trigram")).limit(30)
    },

    // One BPE vocabulary-induction round: the most frequent adjacent
    // character pairs across the corpus — the argmax of round 1 of
    // byte-pair-encoding training. The zipf trick that makes BPE
    // training tractable at corpus scale: pair counting runs over
    // the DISTINCT-WORD DICTIONARY weighted by word frequency
    // (dictionary ≪ corpus; the corpus-sized explode happens once,
    // collapses map-side into word counts, and every later stage is
    // dictionary-sized). Top-20 via TakeOrderedAndProject.
    "q_bpe_merge_round" -> { (s, dir) =>
      val words = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .where(length(col("word")) >= 2)
        .groupBy(col("word")).agg(count(lit(1)).as("n_w"))
      words
        // materialize chars before the lambda (same re-split-per-
        // element trap as q_text_ngram_lm, dictionary-sized here)
        .select(col("n_w"), split(col("word"), "").as("chars"))
        .select(col("n_w"), explode(
          transform(sequence(lit(1), size(col("chars")) - 1),
            i => concat(element_at(col("chars"), i),
              element_at(col("chars"), i + 1))))
          .as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("n_w")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(20)
    },

    // The end-to-end corpus-curation flow an LLM-data pipeline runs:
    // planted-dup corpus → exact dedup (keep first) → quality gate →
    // language-ID → per-language corpus stats. One declarative plan:
    // Catalyst fuses the per-row stages; the only shuffles are the
    // dedup groupBy and the final language aggregate.
    "q_curation_pipeline" -> { (s, dir) =>
      val aug = docsWithDups(s, dir)
      val survivors = Dedup.dropExact(aug, "doc_id", "text")
        .join(docs(s, dir), Seq("doc_id"))
      val (nTok, stopRatio) = qualityCols
      survivors
        .withColumn("n_tokens", nTok)
        .withColumn("quality",
          least(lit(1.0), nTok.cast("double") / 100.0) *
            (lit(1.0) - stopRatio))
        .filter(col("quality") >= 0.3 && col("n_tokens") >= 20)
        .withColumn("lang_pred", langId(col("text")))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("quality")), 4).as("avg_quality"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy(col("lang_pred"))
    },

    // Deterministic stratified sample: per-language keep-fractions
    // decided by an md5 Bernoulli trial per doc — identical survivors
    // in any engine, so the oracle recomputes the exact same sample
    // (the seeded-RNG variant stays in Sampling.stratified +
    // SamplingSpec; RNG streams are engine-specific).
    "q_sample_stratified" -> { (s, dir) =>
      graft.operators.Sampling.hashStratified(docs(s, dir), "lang",
          "doc_id", Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.75,
            "fr" -> 0.5, "zh" -> 0.1))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("lang"))
    },

    // Deterministic train/valid/test hash split — pure function of
    // doc_id (md5 bucket), reproducible anywhere; the oracle
    // recomputes the same buckets from the same md5.
    "q_hash_split" -> { (s, dir) =>
      graft.operators.Sampling.hashSplit(docs(s, dir), "doc_id", 80, 10)
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"))
    },

    // Token counting: whitespace + regex ("BPE-ish" word-run) tokens.
    "q_text_token_stats" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      docs(s, dir).select(
        col("doc_id"),
        size(toks).as("n_ws"),
        regexp_count(col("text"), lit("[a-z]+")).as("n_re"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4)
          .as("distinct_ratio"))
        .orderBy(col("doc_id"))
    },

    // Repetition quality signals (the Gopher/Rae-et-al-style filters
    // an LLM curation pipeline gates on): duplicate word-2-gram
    // ratio, most-frequent-2-gram mass, duplicate word ratio. All
    // per-row array arithmetic over the shared shingle expression —
    // no shuffle except the output order.
    "q_text_repetition" -> { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), wordShingles(col("text"), 2).as("shs"),
          split(col("text"), " ").as("t"))
        .filter(size(col("shs")) > 0)
        .select(col("doc_id"),
          size(col("shs")).cast("long").as("n_grams"),
          round(lit(1.0) - size(array_distinct(col("shs"))).cast("double")
            / size(col("shs")), 4).as("dup_gram_ratio"),
          round(array_max(transform(array_distinct(col("shs")),
              x => size(filter(col("shs"), y => y === x)))).cast("double")
            / size(col("shs")), 4).as("top_gram_frac"),
          round(lit(1.0) - size(array_distinct(col("t"))).cast("double")
            / size(col("t")), 4).as("dup_word_ratio"))
        .orderBy(col("doc_id"))
    },

    // PII redaction — the curation step every shipped corpus runs.
    // The synthetic corpus carries no PII, so deterministic
    // addresses/numbers are planted per doc first, then redacted:
    // the redaction pipeline (count + replace, email then phone) is
    // the operator under test, as pure codegen'd regexp functions.
    "q_text_pii_redact" -> { (s, dir) =>
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      docs(s, dir)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("txt"))
        .select(col("doc_id"),
          regexp_count(col("txt"), lit(email)).as("n_emails"),
          regexp_count(col("txt"), lit(phone)).as("n_phones"),
          regexp_replace(regexp_replace(col("txt"), lit(email),
            lit("<EMAIL>")), lit(phone), lit("<PHONE>")).as("redacted"))
        .orderBy(col("doc_id"))
    },

    // Context-window packing: concatenate-then-chunk token budgeting
    // (which 2048-token training chunk does each doc start in, at
    // what offset). Packing is PER SOURCE — a partition-parallel
    // running sum (one shuffle on source), not a global single-
    // partition window; sources are the natural pack unit exactly as
    // shards are in a production pipeline.
    "q_pack_context" -> { (s, dir) =>
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("source"), col("n_tok"),
          floor((col("cum") - col("n_tok")) / lit(2048.0)).cast("long")
            .as("chunk_id"),
          ((col("cum") - col("n_tok")) % 2048).as("chunk_offset"))
        .orderBy(col("doc_id"))
    },

    // Source-mixture weighting: per-source token shares and the
    // up/down-sampling weight that flattens the mixture to uniform
    // across sources, capped at 4 epochs — the static data-mixture
    // step (DoReMi-style reweighting reduces to supplying a target
    // share vector; uniform here). One tiny aggregate + a one-row
    // broadcast of the totals: no second scan, no wide shuffle.
    "q_mix_weights" -> { (s, dir) =>
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
      val perSource = docs(s, dir)
        .select(col("source"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      val totals = perSource.agg(
        sum(col("n_tokens")).cast("double").as("tot_tokens"),
        count(lit(1)).cast("double").as("n_sources"))
      perSource.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
            .as("share"),
          round(least(lit(4.0),
            (col("tot_tokens") / col("n_sources")) /
              col("n_tokens").cast("double")), 6).as("weight"))
        .orderBy(col("source"))
    },

    // BPE-ish tokenization: a GPT-2-style pretokenizer regex
    // (contraction suffixes | space-prefixed word | space-prefixed
    // number | punctuation run) — the token-count heuristic an LLM
    // data pipeline budgets by. Pure regexp_extract_all: codegen'd,
    // scan-speed, no UDF.
    "q_text_bpe_tokens" -> { (s, dir) =>
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .as("n_bpe"),
        length(col("text")).as("n_chars"))
        .withColumn("chars_per_tok",
          round(col("n_chars").cast("double") / col("n_bpe"), 4))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: length/stopword/short-token heuristics.
    "q_text_quality" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val stops = size(filter(toks,
        x => array_contains(array(lit("the"), lit("a")), x)))
      val stopRatio = stops.cast("double") / nTok
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        round((length(col("text")) - nTok + 1).cast("double") / nTok, 4)
          .as("avg_tok_len"),
        round(stopRatio, 4).as("stop_ratio"),
        round(least(lit(1.0), nTok.cast("double") / 100.0) *
          (lit(1.0) - stopRatio), 4).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Flesch readability scored per document, audited per source —
    // the classic surface-level difficulty screen a curation
    // pipeline runs next to stopword/length quality gates. Words =
    // whitespace tokens (the repo-wide tokenizer contract),
    // syllables ≈ vowel-group runs (one regexp_count over the raw
    // text — codegen'd, no explode), sentences = terminal-punct runs
    // floored at 1. Per-doc scores are per-row IEEE arithmetic;
    // per-source means go through the DECIMAL-sum/ n idiom so the
    // cross-row reduction is exact. One scan, one aggregate.
    "q_text_readability" -> { (s, dir) =>
      val words = size(split(col("text"), " ")).cast("double")
      val syll = greatest(
        regexp_count(col("text"), lit("[aeiouy]+")), lit(1))
        .cast("double")
      val sent = greatest(
        regexp_count(col("text"), lit("[.!?]+")), lit(1))
        .cast("double")
      val flesch = lit(206.835) - lit(1.015) * (words / sent) -
        lit(84.6) * (syll / words)
      val grade = lit(0.39) * (words / sent) +
        lit(11.8) * (syll / words) - lit(15.59)
      docs(s, dir)
        .select(col("source"),
          flesch.cast("decimal(18,6)").as("f"),
          grade.cast("decimal(18,6)").as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f")).cast("decimal(28,6)").as("sf"),
          sum(col("g")).cast("decimal(28,6)").as("sg"),
          min(col("f")).as("minf"), max(col("f")).as("maxf"))
        .select(col("source"), col("n_docs"),
          round(col("sf").cast("double") / col("n_docs"), 4)
            .as("avg_flesch"),
          round(col("sg").cast("double") / col("n_docs"), 4)
            .as("avg_fk_grade"),
          round(col("minf").cast("double"), 4).as("min_flesch"),
          round(col("maxf").cast("double"), 4).as("max_flesch"))
        .orderBy(col("source"))
    },

    // Fixed-weight logistic quality classifier — batch model
    // inference as an engine operator: score = σ(w·x) over cheap
    // text features (length saturation, stopword ratio, vocabulary
    // diversity), keep-gate at 0.5. This is the shape of every
    // model-based curation filter (fastText-style quality, toxicity,
    // LM-filter): per-row feature extraction + dot product + sigmoid
    // inside whole-stage codegen, then one aggregate for the audit
    // readout per language. exp() is per-row IEEE (the q_fdr_bh
    // precedent); the mean score goes through the DECIMAL-sum idiom.
    // At 100 TB the scoring pass is embarrassingly parallel and the
    // aggregate is map-side-partial — nothing here shuffles more
    // than the |lang| audit rows.
    "q_quality_logistic" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      val x1 = least(lit(1.0), nTok / lit(100.0))
      val x2 = size(filter(toks, x =>
        array_contains(array(lit("the"), lit("a")), x)))
        .cast("double") / nTok
      val x3 = size(array_distinct(toks)).cast("double") / nTok
      val z = lit(-1.0) + lit(2.5) * x1 - lit(3.0) * x2 +
        lit(2.0) * x3
      val score = lit(1.0) / (lit(1.0) + exp(-z))
      docs(s, dir)
        .select(col("lang"), score.as("score"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0.5, 1L).otherwise(0L))
            .as("n_keep"),
          sum(col("score").cast("decimal(18,8)"))
            .cast("decimal(28,8)").as("ss"))
        .select(col("lang"), col("n_docs"), col("n_keep"),
          round(col("n_keep") / col("n_docs").cast("double"), 4)
            .as("keep_rate"),
          round(col("ss").cast("double") / col("n_docs"), 4)
            .as("avg_score"))
        .orderBy(col("lang"))
    },

    // Language-ID heuristic: marker-word scoring + argmax.
    "q_text_langid" -> { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    },

    // Rolling-hash document fingerprint (mod 1e9+7 polynomial).
    "q_text_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },

    // Exact dedup: md5 groups over the planted-duplicate corpus.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exactGroups(docsWithDups(s, dir), "doc_id", "text")
        .filter(col("n_copies") > 1)
        .orderBy(col("canonical_id"))
    },

    // Exact dedup, keep-first: surviving ids after dropping copies.
    "q_dedup_keep_first" -> { (s, dir) =>
      Dedup.dropExact(docsWithDups(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // BM25 retrieval: top-10 docs per keyword query — the sparse
    // complement to the dense ANN operators (every data pipeline
    // needs "find the docs about X" next to "find similar docs").
    // Okapi BM25, k1 = 1.2, b = 0.75. Plan: tf/dl/df are one
    // aggregation pass each over the exploded token stream; the
    // query-term list and corpus-level stats broadcast; scoring is
    // map-side; only the per-(query, doc) sum and the top-k window
    // shuffle, and WindowGroupLimit prunes the rank filter map-side.
    // Determinism: idf's ln() quantizes to DECIMAL(18,6) (ln is not
    // bit-portable), per-term contributions quantize likewise and
    // sum as exact decimals, so ranking compares identical numbers
    // in both engines.
    "q_text_bm25" -> { (s, dir) =>
      import s.implicits._
      val qterms = Seq((1, "spark"), (1, "hash"), (1, "join"),
        (2, "window"), (2, "agg"), (2, "query"),
        (3, "fast"), (3, "scan"), (3, "filter")).toDF("query_id", "term")
      bm25Rank(docs(s, dir), qterms)
        .orderBy(col("query_id"), col("rank"))
    },

    // Perplexity filtering (the CCNet/Wenzek-et-al curation step): a
    // bigram LM is built from the corpus itself (c(a,b)/c(a,·) — no
    // smoothing needed: every observed bigram has nonzero counts) and
    // each doc is scored by its mean negative log-prob. Production
    // would broadcast a fixed external LM; the self-trained variant
    // exercises the same plan (LM build = two shuffles, scoring = one
    // co-shuffled join on the bigram key). Determinism: ln() is not
    // bit-identical across engines, so per-instance log-probs are
    // quantized to DECIMAL(18,6) — identical in both engines, and
    // the decimal sum is order-independent (a double sum would not
    // be), then the mean rounds to 4 decimals.
    "q_text_perplexity" -> { (s, dir) =>
      val bi = docs(s, dir).select(col("doc_id"),
        explode(wordShingles(col("text"), 2)).as("bg"))
      val cab = bi.groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      val ca = bi.select(split(col("bg"), " ").getItem(0).as("a"))
        .groupBy(col("a")).agg(count(lit(1)).as("c_a"))
      bi.join(cab, "bg")
        .withColumn("a", split(col("bg"), " ").getItem(0))
        .join(ca, "a")
        .select(col("doc_id"),
          log(col("c_ab").cast("double") / col("c_a"))
            .cast("decimal(18,6)").as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          round((-col("slp") / col("n_bigrams")).cast("double"), 4)
            .as("cross_entropy"))
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: docs sharing any 3-gram with the
    // held-out benchmark slice (doc_id ≡ 0 mod 11), reported with
    // overlap fractions. The benchmark shingle set broadcasts; the
    // training corpus never shuffles.
    "q_text_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      Dedup.ngramContamination(
          d.filter(col("doc_id") % 11 =!= 0),
          d.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // Exact 3-gram Jaccard near-dup pairs (inverted-index join).
    "q_dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.jaccardShinglePairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), col("common"),
          col("n_a"), col("n_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Jaccard with document-frequency pruning: shingles present in
    // >10% of docs carry no near-dup signal but dominate the inverted
    // index join — dropping them is the hot-key mitigation at scale.
    // Jaccard is then computed over the PRUNED shingle sets (the
    // oracle mirrors the same pruning). The 10% threshold is derived
    // in-plan (one-row aggregate, broadcast) — no driver-side count.
    "q_dedup_jaccard_pruned" -> { (s, dir) =>
      Dedup.jaccardShinglePairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, maxShingleDocFreqDivisor = Some(10))
        .select(col("id_a"), col("id_b"), col("common"),
          col("n_a"), col("n_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Pairs -> clusters: connected components over the exact-jaccard
    // near-dup graph (min-label propagation; oracle = recursive CTE
    // transitive closure). The step that picks one canonical doc per
    // duplicate group.
    "q_dedup_clusters" -> { (s, dir) =>
      val pairs = Dedup.jaccardShinglePairs(docs(s, dir), "doc_id",
        "text", n = 3, threshold = 0.5)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .orderBy(col("id"))
    },

    // Pairs -> clusters, LSH edition — THE 100 TB dedup pipeline:
    // constant-per-doc minhash signatures -> band-bucket candidate
    // join -> exact verify on survivors -> min-label clustering.
    // Shuffle volume is k/bands keys per doc regardless of doc
    // length (ScalingSpec: ×14.5 at a 10× corpus vs ×98 for the
    // exact inverted index), so this — not q_dedup_clusters — is the
    // canonical corpus-scale dedup; the exact-Jaccard variant stays
    // as ground truth. md5-portable sketches keep the oracle EXACT:
    // DuckDB replays signatures, banding, verification, and the
    // transitive closure (recursive CTE) bit-for-bit. NOTE: cluster
    // collapse is inherently iterative — building this query runs
    // one eager |edges| count (layout sizing) plus one job per
    // propagation round, unlike the pure-plan queries.
    "q_dedup_clusters_lsh" -> { (s, dir) =>
      val pairs = Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, k = 128, bands = 32, threshold = 0.5)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .orderBy(col("id"))
    },

    // MinHash-LSH near-dups. The sketch hashing is engine-portable
    // (md5-based), so this carries an EXACT DuckDB oracle that
    // replays signature + banding + verification bit-for-bit.
    "q_dedup_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4)
          .as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Span-level duplication (the Lee-et-al exact-substring signal,
    // at fixed span length): per doc, how many of its 10-token spans
    // also occur verbatim in ANOTHER doc — the boilerplate/template
    // detector that doc-level near-dup misses. Spans are
    // xxhash64-narrowed instances; a span is "shared" when its
    // distinct-doc count ≥ 2. Same inverted-index shape (and the
    // same df-bounded scale envelope) as the Jaccard family.
    "q_dedup_substring_spans" -> { (s, dir) =>
      substringSpanFracs(docs(s, dir)).orderBy(col("doc_id"))
    },

    // Incremental dedup — the production ingest path: a new batch
    // (doc_id ≡ 4 mod 5) matched against the indexed rest of the
    // corpus via band-key lookup + exact verify. Shuffle is O(batch),
    // not O(corpus); same md5-portable sketches ⇒ exact oracle.
    "q_dedup_incremental" -> { (s, dir) =>
      val d = docs(s, dir)
      Dedup.minhashLshIncremental(
          d.filter(col("doc_id") % 5 === 4),
          d.filter(col("doc_id") % 5 =!= 4),
          "doc_id", "text", n = 3, k = 128, bands = 32, threshold = 0.5)
        .select(col("new_id"), col("corpus_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("new_id"), col("corpus_id"))
    },

    // SimHash near-dups — portable 60-bit sketch, exact DuckDB oracle.
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 7)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Embedding near-dup: top-20 most-similar same-label pairs,
    // exact double-precision cosine (label acts as the blocking key).
    "q_embed_near_pairs" -> { (s, dir) =>
      Dedup.embeddingPairsCosine(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
        .limit(20)
    },

    // Semantic dedup clusters (SemDeDup-style): embedding-cosine
    // pairs above threshold collapse into groups via the same
    // connected-components step as the text pipelines. The threshold
    // compare is on the RAW double cosine — safe cross-engine because
    // CosineSimExpr and the oracle use identical left-to-right double
    // accumulation (bit-equal sums, not just close).
    "q_dedup_clusters_embed" -> { (s, dir) =>
      val pairs = Dedup.embeddingPairsCosine(
          Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .filter(col("cos") >= 0.35)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .orderBy(col("id"))
    },

    // Hybrid retrieval fusion — the RAG-stack pattern of fusing a
    // sparse keyword ranking with a dense embedding ranking by
    // Reciprocal Rank Fusion: rrf = Σ 1/(60 + rank_leg), absent leg
    // contributes 0. Each leg ranks independently (term-frequency
    // sum over the token stream; cosine against a broadcast query
    // vector — one-row crossJoin, never a shuffle of the corpus),
    // keeps its top-50 via orderBy+limit — TakeOrderedAndProject,
    // i.e. map-side partial top-k, so the corpus NEVER reaches a
    // single-partition window (Spark does not infer WindowGroupLimit
    // for empty-partition windows; a rank<=50 filter alone would
    // ship every row to one reducer) — then ranks the ≤50 survivors
    // with a global window that touches 50 rows by construction
    // (same shape as k-means seeding). Only ≤100 rows meet in the
    // full-outer fuse. RRF only reads RANKS, so the fused scores are
    // engine-exact even though the leg scores are floats.
    "q_hybrid_rrf" -> { (s, dir) =>
      import graft.functions.VectorFunctions
      val toks = split(col("text"), " ")
      val tf = Seq("spark", "hash", "join")
        .map(t => size(filter(toks, x => x === t)))
        .reduce(_ + _)
      val sparse = docs(s, dir)
        .select(col("doc_id"), tf.as("tf")).filter(col("tf") > 0)
        .orderBy(col("tf").desc, col("doc_id")).limit(50)
        .withColumn("rank_s", row_number().over(
          Window.orderBy(col("tf").desc, col("doc_id"))))
      val emb = Tables(s, dir, "embeddings")
      val qv = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv")))
      val dense = emb.crossJoin(qv)
        .select(col("vec_id").as("doc_id"),
          VectorFunctions.cosine(col("embedding"), col("qv")).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(50)
        .withColumn("rank_d", row_number().over(
          Window.orderBy(col("cos").desc, col("doc_id"))))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          round(coalesce(lit(1.0) / (lit(60) + col("rank_s")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("rank_d")), lit(0.0)),
            6).as("rrf"),
          col("rank_s"), col("rank_d"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },

    // Sliding token-window chunking with overlap — the document →
    // training-sample step every pretraining/RAG pipeline runs
    // before tokenization proper. Chunk starts advance by `stride`
    // (= size − overlap); the final chunk starts at the last
    // stride-multiple < n and truncates, so 1 + ceil((n−size)/stride)
    // chunks cover every token with no degenerate suffix chunk that
    // is fully contained in its predecessor. Pure per-row HOF
    // arithmetic (sequence → slice under transform → posexplode):
    // zero shuffle beyond the deterministic output order, so at
    // 100 TB this runs at scan speed and the only cost is the
    // ~n/stride output-row multiplier every chunker pays.
    "q_chunk_sliding" -> { (s, dir) =>
      val cLen = 64; val cStride = 48
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).as("n"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), greatest(lit(0),
              ceil((col("n") - lit(cLen)).cast("double") / cStride)
                .cast("int"))),
            i => slice(col("t"), i * cStride + 1, lit(cLen)))))
        .select(col("doc_id"), col("pos").as("chunk_id"),
          size(col("col")).as("chunk_tokens"),
          array_join(col("col"), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // Boilerplate detection by shingle document-frequency — the
    // web-corpus curation step that strips navigation chrome and
    // templated passages before training. A 5-gram occurring in ≥ 5
    // distinct docs is template material, and each doc reports the
    // fraction of its 5-gram positions covered by such shingles.
    // Shape: native shingling (one pass, no interpreted lambdas) →
    // per-(doc, shingle) position counts → the shingle's doc
    // frequency as a count-window OVER THE AGGREGATE (one row per
    // doc-shingle, so the window input is |distinct pairs|, never
    // positions) → per-doc rollup. Three shuffles, all on aggregates.
    "q_text_boilerplate" -> { (s, dir) =>
      import graft.plans.Sketches
      val pos = docs(s, dir)
        .select(col("doc_id"),
          Sketches.wordShingles(col("text"), 5).as("shs"))
        .where(size(col("shs")) > 0)
        .select(col("doc_id"), explode(col("shs")).as("sh"))
      val g = pos.groupBy(col("doc_id"), col("sh"))
        .agg(count(lit(1)).as("c"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("sh"))))
      g.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_shingles"),
          sum(when(col("df") >= 5, col("c")).otherwise(0L))
            .as("n_boiler"))
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          round(col("n_boiler") / col("n_shingles"), 6)
            .as("boiler_ratio"))
        .orderBy(col("doc_id"))
    },

    // Keyness: which words characterize source `src0` against the
    // rest of the corpus — Dunning's log-likelihood ratio (the
    // standard corpus-linguistics keyword statistic, robust at low
    // counts where χ² misbehaves). One word-count aggregate carries
    // both arms as conditional sums (the q_ab_ttest discipline), the
    // corpus totals are a one-row broadcast, and the top-20 is
    // TakeOrderedAndProject on the rounded score. Per-word ln() is
    // scalar IEEE math; the round-4 contract pins the quotient.
    "q_text_keyness" -> { (s, dir) =>
      val w = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " "))
          .as("word"))
      val counts = w.groupBy(col("word")).agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("b"))
      val tot = counts.agg(sum(col("a")).as("ta"),
        sum(col("b")).as("tb"))
      val ea = col("ta") * (col("a") + col("b")) / (col("ta") + col("tb"))
      val eb = col("tb") * (col("a") + col("b")) / (col("ta") + col("tb"))
      // ln is NOT bit-portable across libm implementations — the
      // repo contract (bm25/perplexity) quantizes every ln before it
      // can decide an ordering or a rounding boundary
      val termA = when(col("a") > 0, col("a") *
        log(col("a") / ea).cast("decimal(18,8)").cast("double"))
        .otherwise(lit(0.0))
      val termB = when(col("b") > 0, col("b") *
        log(col("b") / eb).cast("decimal(18,8)").cast("double"))
        .otherwise(lit(0.0))
      counts.crossJoin(broadcast(tot))
        .select(col("word"), col("a").as("n_target"),
          col("b").as("n_rest"),
          round(lit(2.0) * (termA + termB), 4).as("llr"))
        .orderBy(col("llr").desc, col("word")).limit(20)
    },

    // TF-IDF top-3 characteristic terms per document — the classic
    // retrieval/feature weight (BM25's simpler sibling, kept for its
    // role as a per-doc keyword extractor rather than a query
    // scorer). One (doc, word) aggregate feeds everything: doc length
    // as a doc-window sum, document frequency as a word-window count
    // (both windows run over the aggregate, never positions), corpus
    // size as a one-row broadcast. tf·idf = (c/len)·ln(N/df): the
    // quotients are IEEE-identical across engines, and the ln —
    // which is NOT bit-portable across libm builds — is
    // DECIMAL(18,8)-quantized before it can decide the per-doc
    // row_number cut (WindowGroupLimit-pruned) or a round(·,6)
    // boundary.
    "q_text_tfidf" -> { (s, dir) =>
      val g = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " "))
          .as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("c"))
        .withColumn("doc_len",
          sum(col("c")).over(Window.partitionBy(col("doc_id"))))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("word"))))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val scored = g.crossJoin(broadcast(n))
        .withColumn("tfidf", (col("c") / col("doc_len")) *
          log(col("n_docs") / col("df"))
            .cast("decimal(18,8)").cast("double"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word"))
      scored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("word"), col("c").as("tf_count"),
          col("df"), round(col("tfidf"), 6).as("tfidf"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // Vocabulary growth (Heaps' law): distinct-word count and token
    // count at ten doc-id milestones — the curve that says how much
    // NEW vocabulary another shard of corpus buys (and therefore
    // whether tokenizer/vocab budgets are saturated). Each word
    // contributes at its FIRST doc (min doc_id), so the cumulative
    // vocabulary at milestone m is one conditional sum over the
    // per-doc first-occurrence aggregate — doc-domain-sized joins
    // against a 10-row broadcast milestone spine; the fact-scale
    // explode happens exactly once.
    // Zipf-law fit — the rank-frequency power law every natural
    // corpus should follow (and synthetic corpora visibly don't):
    // OLS of ln(freq) on ln(rank) over the top-100 words. Ranks come
    // from one window over the WORD AGGREGATE (vocab-bounded, never
    // token rows); the fit reuses the closed-form DECIMAL-sum OLS
    // idiom (retention half-life, elasticity). Healthy text sits
    // near slope −1 — the number a corpus-quality dashboard tracks.
    "q_text_zipf_fit" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val freq = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("f"))
      // top-100 FIRST via sort+limit (TakeOrderedAndProject — map-
      // side pruned, vocab never single-partitions), THEN rank the
      // 100 survivors; identical ranks, bounded serial window.
      val ranked = freq
        .orderBy(col("f").desc, col("word")).limit(100)
        .withColumn("r", row_number().over(
          Window.orderBy(col("f").desc, col("word"))))
        .select(log(col("r").cast("double")).cast("decimal(18,8)")
            .as("x"),
          log(col("f").cast("double")).cast("decimal(18,8)")
            .as("y"))
      val g = ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(28,8)").as("sx"),
        sum(col("y")).cast("decimal(28,8)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(38,16)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(38,16)").as("sx2"),
        sum(col("y") * col("y")).cast("decimal(38,16)").as("sy2"),
        min(col("y")).as("miny"), max(col("y")).as("maxy"))
      val covn = col("n") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")
      val varx = col("n") * col("sx2").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val vary = col("n") * col("sy2").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      // Degenerate fit: if all top-100 frequencies tie (the sf10
      // disjoint-salted synthesis makes 100 same-f copies of the top
      // word), vary is exactly 0 and ANSI Spark throws on the double
      // division (4.1 raises DIVIDE_BY_ZERO even for doubles).
      // Guard on the EXACT decimal min==max test, not vary==0.0
      // (double cancellation could miss): slope of a flat line is 0,
      // r² of a zero-variance response is undefined → NULL. Same
      // CASE in the oracle.
      val flat = col("maxy") === col("miny")
      g.select(col("n").as("n_ranks"),
        when(flat, lit(0.0))
          .otherwise(round(covn / varx, 4)).as("zipf_slope"),
        when(flat, lit(null).cast("double"))
          .otherwise(round(covn * covn / (varx * vary), 4)).as("r2"))
    },

    // Hapax legomena ratio per source — the vocabulary-richness
    // companion to Heaps/Zipf: the share of each source's vocabulary
    // seen exactly once. Two hash aggregates over the word aggregate
    // (token explode → (source, word) counts → type/hapax rollup).
    "q_text_hapax" -> { (s, dir) =>
      docs(s, dir)
        .select(col("source"),
          explode(split(col("text"), " ")).as("word"))
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("f")).as("n_tokens"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          col("n_hapax"),
          round(col("n_hapax") / col("n_types").cast("double"), 4)
            .as("hapax_ratio"))
        .orderBy(col("source"))
    },

    "q_text_vocab_growth" -> { (s, dir) =>
      val words = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " "))
          .as("word"))
      val newPerDoc = words.groupBy(col("word"))
        .agg(min(col("doc_id")).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("nw"))
      val tokPerDoc = words.groupBy(col("doc_id").as("d"))
        .agg(count(lit(1)).as("nt"))
      val ms = docs(s, dir).agg(max(col("doc_id")).as("mx"))
        .select(explode(sequence(lit(1), lit(10))).as("i"), col("mx"))
        .select(col("i").cast("long").as("decile"),
          floor(col("mx") * col("i") / 10).cast("long").as("m"))
      val vocab = broadcast(ms).join(newPerDoc, col("d") <= col("m"))
        .groupBy(col("decile"), col("m"))
        .agg(sum(col("nw")).as("vocab_size"))
      val toks = broadcast(ms).join(tokPerDoc, col("d") <= col("m"))
        .groupBy(col("decile").as("decile2"))
        .agg(sum(col("nt")).as("n_tokens"))
      vocab.join(toks, col("decile") === col("decile2"))
        .select(col("decile"), col("m").as("doc_id_cutoff"),
          col("n_tokens"), col("vocab_size"),
          round(log(col("vocab_size")) / log(col("n_tokens")), 4)
            .as("heaps_beta"))
        .orderBy(col("decile"))
    },

    // Containment (asymmetric Jaccard): |A∩B|/|A| — catches a doc
    // whose shingle set mostly LIVES INSIDE another (quote pages,
    // partial scrapes, chunk-of-document dups) that symmetric
    // Jaccard misses when the container is much larger. Same
    // inverted-index pair machinery as the Jaccard family (the
    // intersection IS the pair count); only the acceptance predicate
    // changes, so the scale shape is unchanged. A zero Jaccard
    // threshold disables the prefix filter, so the df-pruning lever
    // (drop shingles in >10% of docs) carries the hot-key control
    // instead — measured 5.3 s → 2.3 s at sf0.1, and at corpus scale
    // it is the difference between a bounded inverted index and a
    // stop-phrase key that joins half the corpus to itself. Runs on
    // the planted-duplicate corpus so full containment provably
    // exists.
    "q_dedup_containment" -> { (s, dir) =>
      Dedup.jaccardShinglePairs(docsWithDups(s, dir), "doc_id",
          "text", n = 3, threshold = 0.0,
          maxShingleDocFreqDivisor = Some(20))
        .withColumn("cont_a_in_b", col("common") / col("n_a"))
        .withColumn("cont_b_in_a", col("common") / col("n_b"))
        .where(greatest(col("cont_a_in_b"), col("cont_b_in_a"))
          >= 0.8)
        .select(col("id_a"), col("id_b"), col("common"),
          col("n_a"), col("n_b"),
          round(col("cont_a_in_b"), 4).as("cont_a_in_b"),
          round(col("cont_b_in_a"), 4).as("cont_b_in_a"))
        .orderBy(col("id_a"), col("id_b"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_bpe_merge_round" ->
      """WITH w AS (
           SELECT word, count(*) AS n_w FROM (
             SELECT unnest(string_split(text, ' ')) AS word
             FROM documents)
           WHERE len(word) >= 2 GROUP BY word),
         p AS (
           SELECT n_w, unnest(list_transform(
               generate_series(1, len(word) - 1),
               i -> string_split(word, '')[i]
                    || string_split(word, '')[i+1])) AS pair
           FROM w)
         SELECT pair, CAST(sum(n_w) AS BIGINT) AS n
         FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",

    "q_text_ngram_lm" ->
      """WITH t AS (
           SELECT string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         tri AS (
           SELECT unnest(list_transform(
                    generate_series(1, len(w) - 2),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                  AS trigram
           FROM t),
         tc AS (SELECT trigram, count(*) AS n FROM tri GROUP BY trigram),
         ctx AS (
           SELECT array_to_string((string_split(trigram, ' '))[1:2], ' ')
                    AS context,
             sum(n) AS n_ctx
           FROM tc GROUP BY 1),
         v AS (
           SELECT count(DISTINCT w) AS v FROM (
             SELECT unnest(string_split(text, ' ')) AS w
             FROM documents))
         SELECT tc.trigram, tc.n, CAST(ctx.n_ctx AS BIGINT) AS n_ctx,
           round((tc.n + 0.5) / (ctx.n_ctx + 0.5 * v.v), 6)
             AS p_smoothed
         FROM tc
         JOIN ctx ON array_to_string(
           (string_split(tc.trigram, ' '))[1:2], ' ') = ctx.context, v
         ORDER BY tc.n DESC, tc.trigram LIMIT 30""",

    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_sampled FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000
           < CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 2500
                       WHEN 'de' THEN 7500 WHEN 'fr' THEN 5000
                       WHEN 'zh' THEN 1000 ELSE -1 END
         GROUP BY lang ORDER BY lang""",

    "q_hash_split" ->
      """WITH b AS (
           SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 100 AS bucket
           FROM documents)
         SELECT CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'valid'
                     ELSE 'test' END AS split,
                count(*) AS n
         FROM b GROUP BY 1 ORDER BY split""",

    "q_curation_pipeline" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
             AS doc_id, text
           FROM documents WHERE doc_id < 20),
         keep AS (
           SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)),
         d AS (
           SELECT k.doc_id, doc.text FROM keep k
           JOIN documents doc ON k.doc_id = doc.doc_id),
         q AS (
           SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
               * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                   x -> x IN ('the', 'a'))) AS DOUBLE)
                 / len(string_split(text, ' '))) AS quality
           FROM d),
         f AS (SELECT * FROM q WHERE quality >= 0.3 AND n_tokens >= 20),
         scored AS (
           SELECT *,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('window', 'stream', 'batch', 'merge'))) AS c_de,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'fast', 'big'))) AS c_en,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('data', 'table', 'row', 'column'))) AS c_es,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('join', 'filter', 'sort', 'order'))) AS c_fr,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('spark', 'query', 'vector', 'hash'))) AS c_zh
           FROM f)
         SELECT
           CASE greatest(c_de, c_en, c_es, c_fr, c_zh)
             WHEN c_de THEN 'de' WHEN c_en THEN 'en' WHEN c_es THEN 'es'
             WHEN c_fr THEN 'fr' ELSE 'zh' END AS lang_pred,
           count(*) AS n_docs,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM scored GROUP BY lang_pred ORDER BY lang_pred""",

    "q_text_token_stats" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_re,
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')), 4) AS distinct_ratio
         FROM documents ORDER BY doc_id""",

    "q_text_quality" ->
      """SELECT doc_id,
         length(text) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
           / len(string_split(text, ' ')), 4) AS avg_tok_len,
         round(CAST(len(list_filter(string_split(text, ' '),
             x -> x IN ('the', 'a'))) AS DOUBLE)
           / len(string_split(text, ' ')), 4) AS stop_ratio,
         round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a'))) AS DOUBLE)
             / len(string_split(text, ' '))), 4) AS quality
         FROM documents ORDER BY doc_id""",

    "q_text_repetition" ->
      """WITH g AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         s AS (
           SELECT doc_id, t,
             [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS shs
           FROM g)
         SELECT doc_id,
           CAST(len(shs) AS BIGINT) AS n_grams,
           round(1.0 - CAST(len(list_distinct(shs)) AS DOUBLE)
             / len(shs), 4) AS dup_gram_ratio,
           round(CAST(list_max(list_transform(list_distinct(shs),
               x -> len(list_filter(shs, y -> y = x)))) AS DOUBLE)
             / len(shs), 4) AS top_gram_frac,
           round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
             / len(t), 4) AS dup_word_ratio
         FROM s WHERE len(shs) > 0 ORDER BY doc_id""",

    "q_text_pii_redact" ->
      """WITH p AS (
           SELECT doc_id,
             text || ' contact user' || doc_id::VARCHAR ||
               '@example.com or +1-555-' ||
               lpad((doc_id % 10000)::VARCHAR, 4, '0') AS txt
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(txt,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(txt,
             '\+1-555-[0-9]{4}')) AS INTEGER) AS n_phones,
           regexp_replace(regexp_replace(txt,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
         FROM p ORDER BY doc_id""",

    "q_pack_context" ->
      """WITH t AS (
           SELECT doc_id, source,
             CAST(len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
               AS BIGINT) AS n_tok
           FROM documents),
         c AS (
           SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
               AS cum
           FROM t)
         SELECT doc_id, source, n_tok,
           CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS chunk_id,
           CAST((cum - n_tok) % 2048 AS BIGINT) AS chunk_offset
         FROM c ORDER BY doc_id""",

    "q_mix_weights" ->
      """WITH t AS (
           SELECT source,
             CAST(len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
               AS BIGINT) AS n_tok
           FROM documents),
         p AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM t GROUP BY source),
         tot AS (
           SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
             CAST(count(*) AS DOUBLE) AS n_sources
           FROM p)
         SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS share,
           round(least(4.0,
             (tot_tokens / n_sources) / CAST(n_tokens AS DOUBLE)), 6)
             AS weight
         FROM p CROSS JOIN tot
         ORDER BY source""",

    "q_text_langid" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('window', 'stream', 'batch', 'merge'))) AS c_de,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'fast', 'big'))) AS c_en,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('data', 'table', 'row', 'column'))) AS c_es,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('join', 'filter', 'sort', 'order'))) AS c_fr,
             len(list_filter(string_split(text, ' '),
               x -> x IN ('spark', 'query', 'vector', 'hash'))) AS c_zh
           FROM documents)
         SELECT doc_id, lang,
           CASE greatest(c_de, c_en, c_es, c_fr, c_zh)
             WHEN c_de THEN 'de' WHEN c_en THEN 'en' WHEN c_es THEN 'es'
             WHEN c_fr THEN 'fr' ELSE 'zh' END AS lang_pred
         FROM scored ORDER BY doc_id""",

    "q_text_fingerprint" ->
      """SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ''),
               ch -> CAST(ascii(ch) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",

    "q_text_bpe_tokens" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+'))
           AS INTEGER) AS n_bpe,
         CAST(strlen(text) AS INTEGER) AS n_chars,
         round(CAST(strlen(text) AS DOUBLE) /
           len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')), 4)
           AS chars_per_tok
         FROM documents ORDER BY doc_id""",

    "q_dedup_exact" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
             AS doc_id, text
           FROM documents WHERE doc_id < 20)
         SELECT md5(text) AS text_md5, count(*) AS n_copies,
           min(doc_id) AS canonical_id
         FROM aug GROUP BY md5(text) HAVING count(*) > 1
         ORDER BY canonical_id""",

    "q_dedup_keep_first" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
             AS doc_id, text
           FROM documents WHERE doc_id < 20)
         SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)
         ORDER BY doc_id""",

    "q_text_bm25" ->
      """WITH q(query_id, term) AS (VALUES
           (1, 'spark'), (1, 'hash'), (1, 'join'),
           (2, 'window'), (2, 'agg'), (2, 'query'),
           (3, 'fast'), (3, 'scan'), (3, 'filter')),
         toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
                GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         gl AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
         dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         contrib AS (
           SELECT q.query_id, tf.doc_id,
             CAST(CAST(ln((CAST(n_docs - df AS DOUBLE) + 0.5)
                          / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                  AS DECIMAL(18,6)) AS DOUBLE)
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE)
                   + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE)
                          * (CAST(dl AS DOUBLE)
                             / (CAST(sum_dl AS DOUBLE) / n_docs)))))
               AS raw
           FROM tf
           JOIN q ON tf.tok = q.term
           JOIN dfreq USING (tok)
           JOIN dl USING (doc_id)
           CROSS JOIN gl),
         sc AS (
           SELECT query_id, doc_id,
             sum(CAST(raw AS DECIMAL(18,6))) AS score
           FROM contrib GROUP BY 1, 2),
         rk AS (
           SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
           FROM sc QUALIFY rank <= 10)
         SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
           round(CAST(score AS DOUBLE), 4) AS score
         FROM rk ORDER BY query_id, rank""",

    "q_text_perplexity" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         bi AS (
           SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                  for i in range(1, len(t))]) AS bg
           FROM toks),
         cab AS (SELECT bg, count(*) AS c_ab FROM bi GROUP BY bg),
         ca AS (
           SELECT string_split(bg, ' ')[1] AS a, count(*) AS c_a
           FROM bi GROUP BY 1),
         lp AS (
           SELECT doc_id,
             CAST(ln(CAST(c_ab AS DOUBLE) / c_a) AS DECIMAL(18,6)) AS lp
           FROM bi
           JOIN cab USING (bg)
           JOIN ca ON string_split(bg, ' ')[1] = ca.a)
         SELECT doc_id, count(*) AS n_bigrams,
           round(CAST(-sum(lp) / count(*) AS DOUBLE), 4) AS cross_entropy
         FROM lp GROUP BY doc_id ORDER BY doc_id""",

    "q_text_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 11 = 0),
         train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 11 <> 0),
         cnt AS (SELECT doc_id, count(*) AS n_grams FROM train
                 GROUP BY doc_id),
         hits AS (
           SELECT doc_id, count(*) AS n_contaminated
           FROM train JOIN bench USING (sh) GROUP BY doc_id)
         SELECT doc_id, n_contaminated, n_grams,
           round(CAST(n_contaminated AS DOUBLE) / n_grams, 4)
             AS contaminated_frac
         FROM hits JOIN cnt USING (doc_id)
         ORDER BY doc_id""",

    "q_dedup_ngram_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, common, ca.n_sh AS n_a, cb.n_sh AS n_b,
           round(CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common), 4)
             AS jaccard
         FROM pairs
         JOIN cnt ca ON id_a = ca.doc_id
         JOIN cnt cb ON id_b = cb.doc_id
         WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5
         ORDER BY id_a, id_b""",

    "q_dedup_jaccard_pruned" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh0 AS MATERIALIZED (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         maxdf AS (
           SELECT greatest(CAST(count(*) // 10 AS INTEGER), 1) AS m
           FROM documents),
         hot AS (
           SELECT sh FROM sh0 GROUP BY sh
           HAVING count(*) > (SELECT m FROM maxdf)),
         sh AS MATERIALIZED (
           SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, common, ca.n_sh AS n_a, cb.n_sh AS n_b,
           round(CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common), 4)
             AS jaccard
         FROM pairs
         JOIN cnt ca ON id_a = ca.doc_id
         JOIN cnt cb ON id_b = cb.doc_id
         WHERE CAST(common AS DOUBLE) / (ca.n_sh + cb.n_sh - common) >= 0.5
         ORDER BY id_a, id_b""",

    "q_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS MATERIALIZED (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         pairs0 AS MATERIALIZED (
           SELECT id_a, id_b FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS common
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2) p
           JOIN cnt ca ON id_a = ca.doc_id
           JOIN cnt cb ON id_b = cb.doc_id
           WHERE CAST(common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - common) >= 0.5),
         edges AS (
           SELECT id_a AS a, id_b AS b FROM pairs0
           UNION SELECT id_b, id_a FROM pairs0),
         reach(a, b) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS id, min(b) AS cluster_id FROM reach
         GROUP BY a ORDER BY id""",

    // Exact oracle for the LSH-fed clusters: the minhash-LSH pair
    // oracle (portable md5 signatures + band slices + exact verify)
    // feeding the same recursive-CTE transitive closure as
    // q_dedup_clusters.
    // AS MATERIALIZED on the reused CTEs: DuckDB inlines plain
    // CTEs, and bandk feeds a self-join (everything upstream of it
    // would run twice) while sh feeds three consumers — measured
    // 148.7s -> 4.2s at sf0.1. Same latent class as the k_core
    // oracle; values are unchanged.
    "q_dedup_clusters_lsh" ->
      """WITH RECURSIVE toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         hs AS MATERIALIZED (
           SELECT doc_id,
             ('0x' || substring(md5(sh), 1, 15))::BIGINT % 2147483647 AS h
           FROM sh),
         sigm AS (
           SELECT doc_id, j,
             min((((j * 2654435761) % 2147483646 + 1) * h
                  + ((j * 40503) % 2147483647)) % 2147483647) AS m
           FROM hs CROSS JOIN range(128) r(j) GROUP BY doc_id, j),
         sig AS MATERIALIZED (
           SELECT doc_id, list(m ORDER BY j) AS sig FROM sigm
           GROUP BY doc_id),
         bandk AS MATERIALIZED (
           SELECT doc_id, b, list_slice(sig, b*4 + 1, b*4 + 4) AS key
           FROM sig CROSS JOIN range(32) r(b)),
         cand AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bandk a JOIN bandk b
             ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         com AS MATERIALIZED (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs0 AS MATERIALIZED (
           SELECT c.id_a, c.id_b
           FROM cand c
           JOIN com cm ON c.id_a = cm.id_a AND c.id_b = cm.id_b
           JOIN cnt ca ON c.id_a = ca.doc_id
           JOIN cnt cb ON c.id_b = cb.doc_id
           WHERE CAST(cm.common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - cm.common) >= 0.5),
         edges AS (
           SELECT id_a AS a, id_b AS b FROM pairs0
           UNION SELECT id_b, id_a FROM pairs0),
         reach(a, b) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS id, min(b) AS cluster_id FROM reach
         GROUP BY a ORDER BY id""",

    // Exact oracle for the MinHash-LSH pairs: the signature is
    // engine-portable by construction (md5-derived 60-bit base hash,
    // affine permutations mod 2^31-1 — see graft.plans.MinHashSigExpr),
    // so DuckDB recomputes the identical signatures, bands on the
    // identical 4-slot slices, and verifies with the identical exact
    // Jaccard.
    "q_dedup_minhash_lsh" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         hs AS (
           SELECT doc_id,
             ('0x' || substring(md5(sh), 1, 15))::BIGINT % 2147483647 AS h
           FROM sh),
         sigm AS (
           SELECT doc_id, j,
             min((((j * 2654435761) % 2147483646 + 1) * h
                  + ((j * 40503) % 2147483647)) % 2147483647) AS m
           FROM hs CROSS JOIN range(128) r(j) GROUP BY doc_id, j),
         sig AS MATERIALIZED (
           SELECT doc_id, list(m ORDER BY j) AS sig FROM sigm
           GROUP BY doc_id),
         bandk AS MATERIALIZED (
           SELECT doc_id, b, list_slice(sig, b*4 + 1, b*4 + 4) AS key
           FROM sig CROSS JOIN range(32) r(b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM bandk a JOIN bandk b
             ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         com AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT c.id_a, c.id_b,
           round(CAST(cm.common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - cm.common), 4) AS jaccard
         FROM cand c
         JOIN com cm ON c.id_a = cm.id_a AND c.id_b = cm.id_b
         JOIN cnt ca ON c.id_a = ca.doc_id
         JOIN cnt cb ON c.id_b = cb.doc_id
         WHERE CAST(cm.common AS DOUBLE)
               / (ca.n_sh + cb.n_sh - cm.common) >= 0.5
         ORDER BY c.id_a, c.id_b""",

    "q_dedup_substring_spans" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sp AS (
           SELECT doc_id,
             unnest([array_to_string(t[i:i+9], ' ')
                     for i in range(1, len(t) - 8)]) AS g
           FROM toks),
         shared AS (
           SELECT g FROM (SELECT DISTINCT doc_id, g FROM sp)
           GROUP BY g HAVING count(*) >= 2),
         nsp AS (SELECT doc_id, count(*) AS n_spans FROM sp
                 GROUP BY doc_id),
         dup AS (
           SELECT doc_id, count(*) AS n_dup_spans
           FROM sp JOIN shared USING (g) GROUP BY doc_id)
         SELECT doc_id, n_dup_spans, n_spans,
           round(CAST(n_dup_spans AS DOUBLE) / n_spans, 4)
             AS dup_span_frac
         FROM dup JOIN nsp USING (doc_id)
         ORDER BY doc_id""",

    // Incremental LSH: same signature/banding replay, candidate join
    // restricted to batch-side × corpus-side.
    "q_dedup_incremental" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         hs AS (
           SELECT doc_id,
             ('0x' || substring(md5(sh), 1, 15))::BIGINT % 2147483647 AS h
           FROM sh),
         sigm AS (
           SELECT doc_id, j,
             min((((j * 2654435761) % 2147483646 + 1) * h
                  + ((j * 40503) % 2147483647)) % 2147483647) AS m
           FROM hs CROSS JOIN range(128) r(j) GROUP BY doc_id, j),
         sig AS MATERIALIZED (
           SELECT doc_id, list(m ORDER BY j) AS sig FROM sigm
           GROUP BY doc_id),
         bandk AS MATERIALIZED (
           SELECT doc_id, b, list_slice(sig, b*4 + 1, b*4 + 4) AS key
           FROM sig CROSS JOIN range(32) r(b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
           FROM bandk a JOIN bandk b
             ON a.b = b.b AND a.key = b.key
            AND a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         com AS (
           SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
             count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh
             AND a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4
           GROUP BY 1, 2)
         SELECT c.new_id, c.corpus_id,
           round(CAST(cm.common AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - cm.common), 4) AS jaccard
         FROM cand c
         JOIN com cm ON c.new_id = cm.new_id AND c.corpus_id = cm.corpus_id
         JOIN cnt ca ON c.new_id = ca.doc_id
         JOIN cnt cb ON c.corpus_id = cb.doc_id
         WHERE CAST(cm.common AS DOUBLE)
               / (ca.n_sh + cb.n_sh - cm.common) >= 0.5
         ORDER BY c.new_id, c.corpus_id""",

    // Exact oracle for the SimHash pairs: 60-bit portable sketch
    // (see graft.plans.SimHash64Expr), 8x8-bit chunk banding, exact
    // hamming verification — all reproduced in BIGINT SQL.
    "q_dedup_simhash" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         shc AS (
           SELECT doc_id, sh, count(*) AS c FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)
           GROUP BY doc_id, sh),
         hs AS (
           SELECT doc_id,
             ('0x' || substring(md5(sh), 1, 15))::BIGINT AS h, c
           FROM shc),
         bits AS (
           SELECT doc_id, j,
             CASE WHEN sum(c * (CASE WHEN ((h >> j) & 1) = 1
                                     THEN 1 ELSE -1 END)) > 0
                  THEN (1::BIGINT << j) ELSE 0 END AS bit
           FROM hs CROSS JOIN range(60) r(j) GROUP BY doc_id, j),
         sims AS (
           SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sim FROM bits
           GROUP BY doc_id),
         chunks AS (
           SELECT doc_id, sim, i,
             (sim >> CAST(i*8 AS INTEGER)) & 255 AS cv
           FROM sims CROSS JOIN range(8) r(i)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sim AS sa, b.sim AS sb
           FROM chunks a JOIN chunks b
             ON a.i = b.i AND a.cv = b.cv AND a.doc_id < b.doc_id)
         SELECT id_a, id_b,
           CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 7
         ORDER BY id_a, id_b""",

    "q_embed_near_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                     for i in range(1, len(a.embedding) + 1)]) /
           sqrt(
             list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                       for i in range(1, len(a.embedding) + 1)]) *
             list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                       for i in range(1, len(b.embedding) + 1)])), 4)
           AS cos_sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""",

    // the same raw-double cosine threshold feeding the recursive-CTE
    // transitive closure
    "q_dedup_clusters_embed" ->
      """WITH RECURSIVE pairs0 AS MATERIALIZED (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id
           WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                           for i in range(1, len(a.embedding) + 1)]) /
                 sqrt(
                   list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                             for i in range(1, len(a.embedding) + 1)]) *
                   list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                             for i in range(1, len(b.embedding) + 1)]))
                 >= 0.35),
         edges AS (
           SELECT id_a AS a, id_b AS b FROM pairs0
           UNION SELECT id_b, id_a FROM pairs0),
         reach(a, b) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
         SELECT a AS id, min(b) AS cluster_id FROM reach
         GROUP BY a ORDER BY id""",

    "q_hybrid_rrf" ->
      """WITH sparse0 AS (
           SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x = 'spark'))
             + len(list_filter(string_split(text, ' '), x -> x = 'hash'))
             + len(list_filter(string_split(text, ' '), x -> x = 'join'))
               AS tf
           FROM documents),
         sp AS (
           SELECT doc_id, tf,
             row_number() OVER (ORDER BY tf DESC, doc_id) AS rank_s
           FROM sparse0 WHERE tf > 0
           QUALIFY rank_s <= 50),
         qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
         dense0 AS (
           SELECT e.vec_id AS doc_id,
             list_sum([e.embedding[i]::DOUBLE * qv.q[i]::DOUBLE
                       for i in range(1, len(e.embedding) + 1)]) /
             sqrt(
               list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
                         for i in range(1, len(e.embedding) + 1)]) *
               list_sum([qv.q[i]::DOUBLE * qv.q[i]::DOUBLE
                         for i in range(1, len(qv.q) + 1)])) AS cos
           FROM embeddings e, qv),
         de AS (
           SELECT doc_id, cos,
             row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_d
           FROM dense0
           QUALIFY rank_d <= 50)
         SELECT doc_id,
           round(coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_s), 0)
             + coalesce(CAST(1.0 AS DOUBLE) / (60 + rank_d), 0), 6)
             AS rrf,
           CAST(rank_s AS INTEGER) AS rank_s,
           CAST(rank_d AS INTEGER) AS rank_d
         FROM sp FULL OUTER JOIN de USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 10""",

    "q_chunk_sliding" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents),
         c AS (
           SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(0, CAST(ceil((n - 64) / 48.0) AS INTEGER))))
               AS chunk_id
           FROM t)
         SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * 48 + 1,
                               chunk_id * 48 + 64)) AS INTEGER)
             AS chunk_tokens,
           array_to_string(list_slice(toks, chunk_id * 48 + 1,
                                      chunk_id * 48 + 64), ' ')
             AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",

    "q_text_boilerplate" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         pos AS (
           SELECT doc_id,
             unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                     t[i+3] || ' ' || t[i+4]
                     for i in range(1, len(t) - 3)]) AS sh
           FROM toks WHERE len(t) >= 5),
         g AS (
           SELECT doc_id, sh, count(*) AS c FROM pos GROUP BY 1, 2),
         d AS (
           SELECT doc_id, c,
             count(*) OVER (PARTITION BY sh) AS df
           FROM g),
         agg AS (
           SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN df >= 5 THEN c ELSE 0 END) AS BIGINT)
               AS n_boiler
           FROM d GROUP BY doc_id)
         SELECT doc_id, n_shingles, n_boiler,
           round(n_boiler / n_shingles, 6) AS boiler_ratio
         FROM agg ORDER BY doc_id""",

    "q_text_keyness" ->
      """WITH w AS (
           SELECT source, unnest(string_split(text, ' ')) AS word
           FROM documents),
         counts AS (
           SELECT word,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
               AS BIGINT) AS b
           FROM w GROUP BY word),
         tot AS (
           SELECT CAST(sum(a) AS BIGINT) AS ta,
             CAST(sum(b) AS BIGINT) AS tb
           FROM counts),
         x AS (
           SELECT word, a, b,
             2.0 * (
               (CASE WHEN a > 0
                 THEN a * CAST(CAST(ln(a / (ta * (a + b) / (ta + tb)))
                   AS DECIMAL(18,8)) AS DOUBLE)
                 ELSE 0.0 END) +
               (CASE WHEN b > 0
                 THEN b * CAST(CAST(ln(b / (tb * (a + b) / (ta + tb)))
                   AS DECIMAL(18,8)) AS DOUBLE)
                 ELSE 0.0 END)) AS llr
           FROM counts, tot)
         SELECT word, a AS n_target, b AS n_rest,
           round(llr, 4) AS llr
         FROM x ORDER BY llr DESC, word LIMIT 20""",

    "q_text_tfidf" ->
      """WITH g AS (
           SELECT doc_id, word, count(*) AS c FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents)
           GROUP BY 1, 2),
         gw AS (
           SELECT doc_id, word, c,
             CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT)
               AS doc_len,
             count(*) OVER (PARTITION BY word) AS df
           FROM g),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, word, c, doc_len, df,
             (c / doc_len) * CAST(CAST(ln(n_docs / df)
               AS DECIMAL(18,8)) AS DOUBLE) AS tfidf
           FROM gw, n),
         rk AS (
           SELECT doc_id, word, c, df, tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, word) AS rank
           FROM scored)
         SELECT doc_id, word, c AS tf_count, df,
           round(tfidf, 6) AS tfidf, rank
         FROM rk WHERE rank <= 3
         ORDER BY doc_id, rank""",

    "q_text_vocab_growth" ->
      """WITH words AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         npd AS (
           SELECT d, count(*) AS nw FROM (
             SELECT word, min(doc_id) AS d FROM words GROUP BY word)
           GROUP BY d),
         tpd AS (
           SELECT doc_id AS d, count(*) AS nt FROM words GROUP BY 1),
         mx AS (SELECT max(doc_id) AS mx FROM documents),
         ms AS (
           SELECT CAST(i AS BIGINT) AS decile,
             CAST(floor(mx * i / 10) AS BIGINT) AS m
           FROM mx, (SELECT unnest(generate_series(1, 10)) AS i)),
         vocab AS (
           SELECT decile, m, CAST(sum(nw) AS BIGINT) AS vocab_size
           FROM ms JOIN npd ON npd.d <= ms.m
           GROUP BY 1, 2),
         toks AS (
           SELECT decile, CAST(sum(nt) AS BIGINT) AS n_tokens
           FROM ms JOIN tpd ON tpd.d <= ms.m
           GROUP BY 1)
         SELECT v.decile, v.m AS doc_id_cutoff, t.n_tokens,
           v.vocab_size,
           round(ln(v.vocab_size) / ln(t.n_tokens), 4) AS heaps_beta
         FROM vocab v JOIN toks t ON v.decile = t.decile
         ORDER BY v.decile""",

    "q_dedup_containment" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
             AS doc_id, text
           FROM documents WHERE doc_id < 20),
         toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM aug),
         sh0 AS MATERIALIZED (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
             FROM toks)),
         maxdf AS (
           SELECT greatest(CAST(count(*) // 20 AS INTEGER), 1) AS m
           FROM aug),
         hot AS (
           SELECT sh FROM sh0 GROUP BY sh
           HAVING count(*) > (SELECT m FROM maxdf)),
         sh AS MATERIALIZED (
           SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh
                 GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh
             AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, common, ca.n_sh AS n_a, cb.n_sh AS n_b,
           round(common / ca.n_sh, 4) AS cont_a_in_b,
           round(common / cb.n_sh, 4) AS cont_b_in_a
         FROM pairs
         JOIN cnt ca ON id_a = ca.doc_id
         JOIN cnt cb ON id_b = cb.doc_id
         WHERE greatest(common / ca.n_sh, common / cb.n_sh) >= 0.8
         ORDER BY id_a, id_b""",

    "q_text_readability" ->
      """WITH f AS (
           SELECT source,
             CAST(206.835
               - 1.015 * (len(string_split(text, ' '))::DOUBLE
                 / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
               - 84.6 * (greatest(len(regexp_extract_all(text,
                   '[aeiouy]+')), 1)::DOUBLE
                 / len(string_split(text, ' ')))
               AS DECIMAL(18,6)) AS fl,
             CAST(0.39 * (len(string_split(text, ' '))::DOUBLE
                 / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
               + 11.8 * (greatest(len(regexp_extract_all(text,
                   '[aeiouy]+')), 1)::DOUBLE
                 / len(string_split(text, ' ')))
               - 15.59 AS DECIMAL(18,6)) AS gr
           FROM documents),
         g AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(fl) AS DECIMAL(28,6)) AS sf,
             CAST(sum(gr) AS DECIMAL(28,6)) AS sg,
             min(fl) AS minf, max(fl) AS maxf
           FROM f GROUP BY 1)
         SELECT source, n_docs,
           round(sf::DOUBLE / n_docs, 4) AS avg_flesch,
           round(sg::DOUBLE / n_docs, 4) AS avg_fk_grade,
           round(minf::DOUBLE, 4) AS min_flesch,
           round(maxf::DOUBLE, 4) AS max_flesch
         FROM g ORDER BY source""",

    "q_text_zipf_fit" ->
      """WITH freq AS (
           SELECT word, count(*) AS f FROM (
             SELECT unnest(string_split(text, ' ')) AS word
             FROM documents)
           GROUP BY 1),
         ranked AS (
           SELECT CAST(ln(r::DOUBLE) AS DECIMAL(19,8)) AS x,
             CAST(ln(f::DOUBLE) AS DECIMAL(19,8)) AS y
           FROM (
             SELECT f, row_number() OVER (ORDER BY f DESC, word)
               AS r
             FROM freq)
           WHERE r <= 100),
         g AS (
           SELECT count(*) AS n,
             CAST(sum(x) AS DECIMAL(28,8)) AS sx,
             CAST(sum(y) AS DECIMAL(28,8)) AS sy,
             CAST(sum(x * y) AS DECIMAL(38,16)) AS sxy,
             CAST(sum(x * x) AS DECIMAL(38,16)) AS sx2,
             CAST(sum(y * y) AS DECIMAL(38,16)) AS sy2,
             min(y) AS miny, max(y) AS maxy
           FROM ranked)
         SELECT n AS n_ranks,
           CASE WHEN maxy = miny THEN 0.0 ELSE
             round((n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / (n * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE), 4)
           END AS zipf_slope,
           CASE WHEN maxy = miny THEN NULL ELSE
             round((n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               * (n * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / ((n * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                 * (n * sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4)
           END AS r2
         FROM g""",

    "q_text_hapax" ->
      """WITH wc AS (
           SELECT source, word, count(*) AS f FROM (
             SELECT source, unnest(string_split(text, ' ')) AS word
             FROM documents)
           GROUP BY 1, 2)
         SELECT source,
           count(*) AS n_types,
           CAST(sum(f) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           round(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 4) AS hapax_ratio
         FROM wc GROUP BY 1 ORDER BY source""",

    "q_quality_logistic" ->
      """WITH f AS (
           SELECT lang,
             1.0 / (1.0 + exp(-(
               -1.0
               + 2.5 * least(1.0,
                   len(string_split(text, ' '))::DOUBLE / 100.0)
               - 3.0 * (len(list_filter(string_split(text, ' '),
                   x -> x IN ('the', 'a')))::DOUBLE
                 / len(string_split(text, ' ')))
               + 2.0 * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                 / len(string_split(text, ' ')))))) AS score
           FROM documents),
         g AS (
           SELECT lang, count(*) AS n_docs,
             CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_keep,
             CAST(sum(CAST(score AS DECIMAL(18,8)))
               AS DECIMAL(28,8)) AS ss
           FROM f GROUP BY 1)
         SELECT lang, n_docs, n_keep,
           round(n_keep / n_docs::DOUBLE, 4) AS keep_rate,
           round(ss::DOUBLE / n_docs, 4) AS avg_score
         FROM g ORDER BY lang""",
  )
}
