package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families (SURVEY.md §2b rows: string/date/math/
  * array/map fns). All per-row — no shuffle except the final orderBy;
  * everything stays inside whole-stage codegen (built-in functions
  * only, no UDFs), so these run at scan speed at any scale.
  *
  * Determinism: transcendental math (ln/exp/pow) may differ in the
  * last ulp between libm implementations → rounded to 6 decimals;
  * everything else is exact per-row arithmetic.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // String family: case, substring, length, concat_ws, lpad,
    // replace, split+element_at, regexp_extract, LIKE (as filter).
    // Edit distance (the char-level near-dup primitive) + a numeric
    // histogram via floor-bucketing: both pure integer outputs, so
    // engine-exact without rounding.
    "q_string_editdist" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_type")).as("lev_name_type"),
          levenshtein(element_at(split(col("p_name"), " "), 1),
            element_at(split(col("p_name"), " "), -1)).as("lev_first_last"))
        .orderBy(col("p_partkey"))
    },

    "q_agg_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / 100).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
        .orderBy(col("bucket"))
    },

    "q_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%ring%") ||
                col("p_name").like("blue%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_type")).as("type_lower"),
          substring(col("p_name"), 1, 4).as("name_pre"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int")
            .as("brand_num"))
        .orderBy(col("p_partkey"))
    },

    // Date/time family: extract fields, truncate, diff, arithmetic.
    "q_date_funcs" -> { (s, dir) =>
      val d = col("o_orderdate")
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(d).as("yr"),
          month(d).as("mo"),
          dayofmonth(d).as("dom"),
          quarter(d).as("qtr"),
          date_trunc("month", d).cast("date").as("month_start"),
          datediff(d.cast("date"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          date_add(d.cast("date"), 30).as("due_date"),
          last_day(d.cast("date")).as("month_end"))
        .filter(col("o_orderkey") % 10 === 0)
        .orderBy(col("o_orderkey"))
    },

    // Math family. sqrt/abs/floor/ceil/mod/sign are exact; ln/exp/pow
    // rounded (libm last-ulp differences).
    "q_math_funcs" -> { (s, dir) =>
      val v = col("value")
      t(s, dir, "events")
        .select(
          col("event_id"),
          round(v, 1).as("v_round"),
          abs(v - 100.0).as("v_absdev"),
          floor(v).cast("long").as("v_floor"),
          ceil(v).cast("long").as("v_ceil"),
          sqrt(v).as("v_sqrt"),
          round(log(v + 1.0), 6).as("v_ln"),
          round(exp(v / 100.0), 6).as("v_exp"),
          round(pow(v, 2.0), 6).as("v_sq"),
          (col("event_id") % 7).as("id_mod"),
          signum(v - 100.0).cast("int").as("v_sign"),
          greatest(v, lit(50.0)).as("v_hi"),
          least(v, lit(150.0)).as("v_lo"))
        .orderBy(col("event_id"))
    },

    // Array family incl. higher-order functions (transform / filter /
    // aggregate) — all codegen-friendly built-ins, no UDF.
    "q_array_funcs" -> { (s, dir) =>
      val tokens = split(col("text"), " ")
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(tokens).as("n_tokens"),
          size(array_distinct(tokens)).as("n_distinct"),
          element_at(tokens, 1).as("first_tok"),
          array_contains(tokens, "spark").as("has_spark"),
          size(filter(tokens, x => length(x) > 4)).as("n_long"),
          aggregate(transform(tokens, x => length(x)), lit(0),
            (acc, x) => acc + x).as("char_sum"),
          // CSV-joined, not a raw array: the driver's pandas compare
          // can't sort/hash ndarray cells (round-1 q_array_funcs err).
          array_join(slice(sort_array(array_distinct(tokens)), 1, 3), ",")
            .as("top3_csv"))
        .orderBy(col("doc_id"))
    },

    // Explode / unnest: token frequencies across the corpus.
    "q_array_explode" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(25)
    },

    // Map family: build a per-user event_type→count map with
    // map_from_entries, then read it back via element_at / map_keys.
    // Outputs are scalars so the oracle stays engine-neutral.
    "q_map_funcs" -> { (s, dir) =>
      val counts = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"),
          col("cnt")))).as("m"))
        .select(
          col("user_id"),
          size(col("m")).as("n_types"),
          coalesce(element_at(col("m"), "purchase"), lit(0L))
            .as("purchases"),
          array_join(sort_array(map_keys(col("m"))), ",").as("types_csv"))
        .orderBy(col("user_id"))
    },
  )

  val oracles: Map[String, String] = Map(
    "q_string_editdist" ->
      """SELECT p_partkey,
         CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev_name_type,
         CAST(levenshtein(string_split(p_name, ' ')[1],
                          string_split(p_name, ' ')[-1]) AS INTEGER)
           AS lev_first_last
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""",

    "q_agg_histogram" ->
      """SELECT CAST(floor(value / 100) AS BIGINT) AS bucket,
         count(*) AS n,
         round(min(value), 4) AS lo, round(max(value), 4) AS hi
         FROM events GROUP BY 1 ORDER BY bucket""",

    "q_string_funcs" ->
      """SELECT p_partkey,
         upper(p_name) AS name_upper,
         lower(p_type) AS type_lower,
         substring(p_name, 1, 4) AS name_pre,
         CAST(length(p_name) AS INTEGER) AS name_len,
         p_brand || '/' || p_type AS brand_type,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_novowel,
         string_split(p_name, ' ')[1] AS first_word,
         CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num
         FROM part
         WHERE p_name LIKE '%ring%' OR p_name LIKE 'blue%'
         ORDER BY p_partkey""",

    "q_date_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mo,
         CAST(day(o_orderdate) AS INTEGER) AS dom,
         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
         CAST(o_orderdate AS DATE) + 30 AS due_date,
         last_day(CAST(o_orderdate AS DATE)) AS month_end
         FROM orders WHERE o_orderkey % 10 = 0
         ORDER BY o_orderkey""",

    "q_math_funcs" ->
      """SELECT event_id,
         round(value, 1) AS v_round,
         abs(value - 100.0) AS v_absdev,
         CAST(floor(value) AS BIGINT) AS v_floor,
         CAST(ceil(value) AS BIGINT) AS v_ceil,
         sqrt(value) AS v_sqrt,
         round(ln(value + 1.0), 6) AS v_ln,
         round(exp(value / 100.0), 6) AS v_exp,
         round(pow(value, 2.0), 6) AS v_sq,
         event_id % 7 AS id_mod,
         CAST(sign(value - 100.0) AS INTEGER) AS v_sign,
         greatest(value, 50.0) AS v_hi,
         least(value, 150.0) AS v_lo
         FROM events ORDER BY event_id""",

    "q_array_funcs" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
         string_split(text, ' ')[1] AS first_tok,
         list_contains(string_split(text, ' '), 'spark') AS has_spark,
         CAST(len(list_filter(string_split(text, ' '),
           x -> length(x) > 4)) AS INTEGER) AS n_long,
         CAST(list_sum(list_transform(string_split(text, ' '),
           x -> length(x))) AS INTEGER) AS char_sum,
         array_to_string(list_slice(list_sort(list_distinct(
           string_split(text, ' '))), 1, 3), ',') AS top3_csv
         FROM documents ORDER BY doc_id""",

    "q_array_explode" ->
      """SELECT token, count(*) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS token
               FROM documents)
         GROUP BY token ORDER BY freq DESC, token LIMIT 25""",

    "q_map_funcs" ->
      """WITH counts AS (
           SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY user_id, event_type)
         SELECT user_id,
           CAST(count(*) AS INTEGER) AS n_types,
           CAST(coalesce(sum(cnt) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
             AS purchases,
           string_agg(event_type, ',' ORDER BY event_type) AS types_csv
         FROM counts GROUP BY user_id ORDER BY user_id""",
  )
}
