package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Source-boundary operators (SURVEY.md §2a S1/V1) and the
  * multimodal-column pipeline, exercised over the testdata tables so
  * they stay oracle-checkable: JSON encode→corrupt→validated-decode
  * round trip (the webhook boundary in miniature), and the binary
  * payload decode / frame-sampling plumbing.
  */
object SourceQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // V1: schema-validated decode with a corrupt-record channel.
    // Rebuilds each event as a JSON body, corrupts every 37th one,
    // decodes with an explicit schema, and audits per type: row
    // counts, valid counts, and aggregates of the DECODED fields
    // (proving the round trip, not just the validity bit).
    "q_json_validate" -> { (s, dir) =>
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL("user_id BIGINT, t BIGINT, et STRING, value DOUBLE")
      Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          to_json(struct(col("user_id"),
            unix_millis(col("ts")).as("t"),
            col("event_type").as("et"), col("value"))).as("payload"))
        .withColumn("payload",
          when(col("event_id") % 37 === 0, concat(lit("x"), col("payload")))
            .otherwise(col("payload")))
        .withColumn("rec", from_json(col("payload"), schema))
        .withColumn("is_valid",
          col("rec").isNotNull && col("rec.user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("is_valid"), col("rec.t"))).as("sum_t"),
          round(avg(when(col("is_valid"), col("rec.value"))), 4)
            .as("avg_value"))
        .orderBy(col("event_type"))
    },

    // Multimodal decode: binary payload → deterministic features via
    // the typed mapPartitions boundary (Multimodal.extractFeatures).
    "q_multimodal_decode" -> { (s, dir) =>
      Multimodal.extractFeatures(
          Multimodal.fromDocuments(Tables(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("byte_sum_mod"))
        .orderBy(col("doc_id"))
    },

    // Frame sampling over the binary column: 64-byte frames, 32-byte
    // stride (the audio/video access pattern).
    "q_multimodal_frames" -> { (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.fromDocuments(Tables(s, dir, "documents")),
          frameBytes = 64, stride = 32)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"))
        .orderBy(col("doc_id"))
    },

    // Perceptual-hash near-dup over the byte tier — the media
    // analogue of MinHash dedup: 32-bit average-hash per payload
    // (integer segment sums, mapPartitions tier), then candidate
    // pairs via 4×8-bit BAND BLOCKING (pigeonhole: hamming ≤ 3 ⇒ at
    // least one of 4 bands identical — NO false negatives at the
    // emitted threshold) and a bit_count(xor) hamming verify. The
    // shuffle is band-bucket-sized like LSH — never the n² pair
    // space. The corpus carries 20 planted exact copies (the dedup
    // fixture), which surface at hamming 0. Contract with the
    // oracle: text is ASCII (so UTF-8 bytes == codepoints — pinned
    // by MultimodalSpec's corpus assertion) and empty payloads are
    // excluded from near-dup candidacy (the oracle's unnest drops
    // them; we filter explicitly so both engines agree by
    // construction, not by corpus accident).
    "q_multimodal_phash" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(length(col("text")) > 0)
      // in-plan planted-copy offset (the docsWithDups precedent): a
      // fixed constant collides with real ids once the corpus grows
      val off = Tables(s, dir, "documents")
        .agg((max(col("doc_id")) + 1).as("off"))
      val aug = d.unionByName(d.filter(col("doc_id") < 20)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("off")).as("doc_id"),
          col("text")))
      val hashes = Multimodal.avgHash(
        Multimodal.fromDocuments(aug), bits = 32)
      val banded = hashes.select(col("doc_id"), col("phash"),
        explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bkey", expr("shiftright(phash, band * 8) & 255"))
      val pairs = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"),
          col("b.doc_id").as("id_b"),
          col("a.phash").as("ha"), col("b.phash").as("hb"))
        .distinct()
      pairs
        .withColumn("hamming",
          expr("bit_count(ha ^ hb)").cast("long"))
        .where(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Resize (multimodal downsample stub): every-4th-byte decimation
    // with before/after sizes and a checksum of the kept bytes.
    "q_multimodal_resize" -> { (s, dir) =>
      Multimodal.resize(
          Multimodal.fromDocuments(Tables(s, dir, "documents")),
          factor = 4)
        .orderBy(col("doc_id"))
    },

    // CSV source leg: header + explicit schema (no inference pass —
    // at 100 TB schema inference is a full extra scan), doubles
    // round-tripping through shortest-repr text. Aggregates the
    // decoded columns so the oracle proves the parse, not just counts.
    "q_source_csv" -> { (s, dir) =>
      val path = graft.sources.CsvFixture.ensure(s, dir)
      s.read
        .schema("event_id BIGINT, user_id BIGINT, t BIGINT, " +
          "event_type STRING, value DOUBLE")
        .option("header", "true")
        .csv(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("t")).as("min_t"), max(col("t")).as("max_t"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("event_type"))
    },

    // S2/F2 for real: the REST-poll analogue as a DataSource V2 with
    // source-side predicate pushdown (the noEarlierThan cutoff is
    // evaluated inside the reader) and column pruning, followed by
    // the poll path's latestPositionOnly aggregation (A1). The JSONL
    // fixture derives deterministically from `events`, so the oracle
    // recomputes the result from the parquet directly.
    "q_source_dsv2" -> { (s, dir) =>
      val path = graft.sources.TrackPointFixture.ensure(s, dir)
      s.read.format("graft.sources.TrackPointSource")
        .option("path", path).load()
        .filter(col("ts") >= 1704844800000L) // 2024-01-10T00:00Z
        .groupBy(col("entity_id"))
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("name"),
            col("lon"), col("lat"), col("emergency")),
          struct(col("ts"), col("event_id"))).as("l"))
        .select(col("entity_id"), col("l.ts").as("last_ms"),
          col("l.name").as("name"), col("l.lon").as("lon"),
          col("l.lat").as("lat"),
          col("l.emergency").cast("int").as("emergency"))
        .orderBy(col("entity_id"))
    },

    // ORC source/sink round trip: part rewritten as ORC (Spark's
    // built-in columnar alternative), read back with a pushed
    // filter + pruned columns — the same DSv2 scan machinery as
    // parquet, asserted in SourcesSpec. The aggregate proves the
    // typed round trip (strings, ints, doubles); the oracle
    // recomputes from the parquet original, so any ORC encode/decode
    // drift fails the hash.
    "q_source_orc" -> { (s, dir) =>
      val path = graft.sources.OrcFixture.ensure(s, dir)
      s.read.orc(path)
        .filter(col("p_size") <= 30)
        .groupBy(element_at(split(col("p_name"), " "), 1).as("adjective"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("p_type")).as("n_types"),
          sum(col("p_size")).cast("long").as("sum_size"),
          round(sum(col("p_retailprice").cast("decimal(18,2)"))
            .cast("double"), 2).as("sum_price"))
        .orderBy(col("adjective"))
    },

    // S2 one level deeper: the poll API's server-side aggregation
    // (latestPositionOnly) as DSv2 AGGREGATE pushdown — each file
    // partition hash-aggregates inside the reader and ships per-group
    // partials (max/min/count); Spark's final aggregate merges. The
    // raw rows never exist Spark-side. Composes with the pushed time
    // filter.
    "q_source_agg_pushdown" -> { (s, dir) =>
      val path = graft.sources.TrackPointFixture.ensure(s, dir)
      s.read.format("graft.sources.TrackPointSource")
        .option("path", path).load()
        .filter(col("ts") >= 1704844800000L) // 2024-01-10T00:00Z
        .groupBy(col("entity_id"))
        .agg(max(col("ts")).as("last_ms"),
          min(col("event_id")).as("first_event"),
          count(lit(1)).as("n"))
        .orderBy(col("entity_id"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_source_orc" ->
      """SELECT string_split(p_name, ' ')[1] AS adjective,
         count(*) AS n, count(DISTINCT p_type) AS n_types,
         CAST(sum(p_size) AS BIGINT) AS sum_size,
         round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)))
           AS DOUBLE), 2) AS sum_price
         FROM part WHERE p_size <= 30
         GROUP BY 1 ORDER BY adjective""",

    "q_source_agg_pushdown" ->
      """SELECT user_id AS entity_id, max(epoch_ms(ts)) AS last_ms,
         min(event_id) AS first_event, count(*) AS n
         FROM events
         WHERE epoch_ms(ts) >= 1704844800000
         GROUP BY 1 ORDER BY entity_id""",

    // documents.text is ASCII → utf-8 bytes == characters.
    "q_multimodal_resize" ->
      """SELECT doc_id,
         CAST(strlen(text) AS INTEGER) AS orig_bytes,
         CAST(len([text[i] for i in range(1, strlen(text) + 1, 4)])
           AS INTEGER) AS resized_bytes,
         CAST(list_sum([ascii(text[i])
                        for i in range(1, strlen(text) + 1, 4)])
           AS BIGINT) AS resized_sum
         FROM documents ORDER BY doc_id""",

    "q_source_csv" ->
      """SELECT event_type, count(*) AS n,
         count(DISTINCT user_id) AS n_users,
         min(epoch_ms(ts)) AS min_t, max(epoch_ms(ts)) AS max_t,
         round(avg(value), 4) AS avg_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_source_dsv2" ->
      """SELECT user_id AS entity_id, epoch_ms(ts) AS last_ms,
         'u' || CAST(user_id AS VARCHAR) AS name,
         value AS lon, -value AS lat,
         CAST(event_type = 'error' AS INTEGER) AS emergency
         FROM events
         WHERE epoch_ms(ts) >= 1704844800000
         QUALIFY row_number() OVER (PARTITION BY user_id
           ORDER BY epoch_ms(ts) DESC, event_id DESC) = 1
         ORDER BY entity_id""",

    "q_json_validate" ->
      """SELECT event_type, count(*) AS n_total,
         count(*) FILTER (WHERE event_id % 37 <> 0) AS n_valid,
         CAST(sum(epoch_ms(ts)) FILTER (WHERE event_id % 37 <> 0)
           AS BIGINT) AS sum_t,
         round(avg(value) FILTER (WHERE event_id % 37 <> 0), 4)
           AS avg_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    // documents.text is ASCII, so utf-8 byte values == ascii codes.
    "q_multimodal_decode" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(list_sum(list_transform(string_split(text, ''),
           ch -> ascii(ch))) % 1000000007 AS BIGINT) AS byte_sum_mod
         FROM documents ORDER BY doc_id""",

    "q_multimodal_frames" ->
      """SELECT doc_id,
         (octet_length(encode(text)) - 64) // 32 + 1 AS n_frames
         FROM documents
         WHERE octet_length(encode(text)) >= 64
         ORDER BY doc_id""",

    // char-based (ascii codepoints) vs Spark's UTF-8 bytes: equal
    // ONLY under the ASCII corpus contract asserted by
    // MultimodalSpec; empty docs are filtered on both sides.
    "q_multimodal_phash" ->
      """WITH aug AS (
           SELECT doc_id, text FROM documents
           WHERE length(text) > 0
           UNION ALL
           SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents)
             AS doc_id, text
           FROM documents WHERE doc_id < 20 AND length(text) > 0),
         ch AS (
           SELECT doc_id, length(text) AS n,
             unnest(string_split(text, '')) AS c,
             unnest(range(length(text))) AS j
           FROM aug),
         ss AS (
           SELECT doc_id, (j * 32) // n AS seg,
             sum(ascii(c)) AS s
           FROM ch GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(s) AS total FROM ss GROUP BY 1),
         hashes AS (
           SELECT ss.doc_id,
             CAST(sum(CASE WHEN ss.s * 32 > t.total
               THEN CAST(1 AS BIGINT) << CAST(ss.seg AS INT)
               ELSE 0 END) AS BIGINT) AS phash
           FROM ss JOIN tot t USING (doc_id) GROUP BY 1),
         bk AS (
           SELECT doc_id, phash, band,
             (phash >> CAST(band * 8 AS INT)) & 255 AS bkey
           FROM (SELECT doc_id, phash, unnest(range(4)) AS band
                 FROM hashes)),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.phash AS ha, b.phash AS hb
           FROM bk a JOIN bk b
             ON a.band = b.band AND a.bkey = b.bkey
            AND a.doc_id < b.doc_id)
         SELECT id_a, id_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         FROM pairs WHERE bit_count(xor(ha, hb)) <= 3
         ORDER BY id_a, id_b""",
  )
}
