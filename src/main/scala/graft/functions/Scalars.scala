package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.{Det, Q}
import graft.sources.Tables

/** Scalar-function surface: string / date / math / conditional / JSON /
  * array / map — SURVEY.md §2.H.
  *
  * Reference semantics: GEOID zero-pad + parent-prefix extraction + display
  * names ("Tract X, County, State"), typeahead slugs, year arithmetic,
  * 2-decimal rate rounding, data-quality flag derivation, census-API JSON
  * parsing [ref:name building, search index, rate rounding, flags (H/M) —
  * SURVEY.md §0].
  *
  * All functions here are codegen'd Catalyst expressions (no UDFs) so the
  * whole stage collapses into one WholeStageCodegen span over the scan.
  */
object Scalars {

  /** lpad/substring/concat_ws/length — GEOID build + hierarchy prefixes. */
  val qStrGeoid = Q(
    "q_str_geoid",
    (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(
          lpad(col("c_custkey").cast("string"), 11, "0").as("geoid"),
          substring(lpad(col("c_custkey").cast("string"), 11, "0"), 1, 2)
            .as("state"),
          substring(lpad(col("c_custkey").cast("string"), 11, "0"), 1, 5)
            .as("county"),
          concat_ws(", ", col("c_name"), col("n_name")).as("display"),
          length(concat_ws(", ", col("c_name"), col("n_name")))
            .cast(IntegerType).as("display_len"))
        .orderBy("geoid"),
    Some("""SELECT lpad(CAST(c_custkey AS VARCHAR), 11, '0') AS geoid,
                   substring(lpad(CAST(c_custkey AS VARCHAR), 11, '0'), 1, 2)
                     AS state,
                   substring(lpad(CAST(c_custkey AS VARCHAR), 11, '0'), 1, 5)
                     AS county,
                   concat_ws(', ', c_name, n_name) AS display,
                   CAST(length(concat_ws(', ', c_name, n_name)) AS INTEGER)
                     AS display_len
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            ORDER BY geoid"""))

  /** lower/trim/regexp_replace/split — typeahead slug build.
    * DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
    */
  val qStrClean = Q(
    "q_str_clean",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          regexp_replace(lower(col("p_type")), " +", "-").as("slug"),
          element_at(split(lower(col("p_name")), " "), 1).as("first_word"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
                   regexp_replace(lower(p_type), ' +', '-', 'g') AS slug,
                   string_split(lower(p_name), ' ')[1] AS first_word,
                   trim(concat('  ', p_brand, '  ')) AS brand_trim
            FROM part ORDER BY p_partkey"""))

  /** year/quarter/month/day, date_trunc, interval add, datediff. */
  val qDateParts = Q(
    "q_date_parts",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          expr("timestampadd(DAY, 30, o_orderdate)").as("plus30"),
          datediff(to_date(col("o_orderdate")),
            lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INTEGER) AS yr,
                   CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
                   CAST(month(o_orderdate) AS INTEGER) AS mon,
                   CAST(day(o_orderdate) AS INTEGER) AS dom,
                   date_trunc('month', o_orderdate) AS mstart,
                   o_orderdate + INTERVAL 30 DAY AS plus30,
                   CAST(datediff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
            FROM orders ORDER BY o_orderkey"""))

  /** round(x,2) / abs / greatest / least / clamp / null-safe divide —
    * the reference's exact 2-decimal rate arithmetic.
    */
  val qMathRate = Q(
    "q_math_rate",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_discount") * 100.0, 2).as("disc_pct"),
          abs(col("l_quantity") - 25.0).as("gap"),
          greatest(col("l_tax"), col("l_discount")).as("hi"),
          least(col("l_tax"), col("l_discount")).as("lo"),
          least(greatest(col("l_quantity"), lit(10.0)), lit(40.0))
            .as("clamped"),
          when(col("l_quantity") === 0.0, lit(null).cast(DoubleType))
            .otherwise(col("l_extendedprice") / col("l_quantity"))
            .as("unit_px"))
        // total order over ALL output columns (§7.2 rule 1 — the natural
        // key is not unique in this data)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "disc_pct",
          "gap", "hi", "lo", "clamped", "unit_px"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
                   round(l_discount * 100.0, 2) AS disc_pct,
                   abs(l_quantity - 25.0) AS gap,
                   greatest(l_tax, l_discount) AS hi,
                   least(l_tax, l_discount) AS lo,
                   least(greatest(l_quantity, 10.0), 40.0) AS clamped,
                   CASE WHEN l_quantity = 0.0 THEN NULL
                        ELSE l_extendedprice / l_quantity END AS unit_px
            FROM lineitem
            ORDER BY l_orderkey, l_linenumber, l_quantity, disc_pct, gap,
                     hi, lo, clamped, unit_px"""))

  /** CASE WHEN flag chains + coalesce (low-flag / imputed / subbed analog). */
  val qCondFlags = Q(
    "q_cond_flags",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          when(col("l_quantity") < 5.0, "low")
            .when(col("l_quantity") < 25.0, "mid")
            .otherwise("high").as("qty_flag"),
          coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
            .as("ret_flag"))
        .groupBy("qty_flag", "ret_flag")
        .agg(count(lit(1)).as("n"))
        .orderBy("qty_flag", "ret_flag"),
    Some("""SELECT CASE WHEN l_quantity < 5.0 THEN 'low'
                        WHEN l_quantity < 25.0 THEN 'mid'
                        ELSE 'high' END AS qty_flag,
                   coalesce(nullif(l_returnflag, 'N'), 'none') AS ret_flag,
                   count(*) AS n
            FROM lineitem GROUP BY qty_flag, ret_flag
            ORDER BY qty_flag, ret_flag"""))

  /** JSON extraction from the events props column (census-API analog). */
  val qJsonExtract = Q(
    "q_json_extract",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast(DoubleType) / count(col("k")).cast(DoubleType))
            .as("avg_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE) AS avg_k
            FROM (SELECT event_type,
                         CAST(props->>'$.k' AS INTEGER) AS k FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  /** Array ops + higher-order lambda over embedding vectors (norm). */
  val qArrayOps = Q(
    "q_array_ops",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast(IntegerType).as("dim"),
          element_at(col("embedding"), 1).as("first_val"),
          array_min(col("embedding")).as("vmin"),
          array_max(col("embedding")).as("vmax"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))), 6)
            .as("norm"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
                   CAST(len(embedding) AS INTEGER) AS dim,
                   embedding[1] AS first_val,
                   list_min(embedding) AS vmin,
                   list_max(embedding) AS vmax,
                   round(sqrt(list_sum(list_transform(
                     CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS norm
            FROM embeddings ORDER BY vec_id"""))

  /** Map build + extraction, flattened output (tile-attr map analog). */
  val qMapOps = Q(
    "q_map_ops",
    (s, dir) =>
      Tables.part(s, dir)
        .withColumn("m", map(
          lit("size"), col("p_size").cast(DoubleType),
          lit("px"), col("p_retailprice")))
        .select(
          col("p_partkey"),
          element_at(col("m"), "size").as("sz"),
          element_at(col("m"), "px").as("px"),
          size(col("m")).cast(IntegerType).as("n_keys"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, CAST(p_size AS DOUBLE) AS sz,
                   p_retailprice AS px, 2 AS n_keys
            FROM part ORDER BY p_partkey"""))

  /** Fuzzy place-name matching by edit distance — the entity-resolution
    * primitive a geography pipeline needs when joining externally-sourced
    * names (misspellings, abbreviation drift). levenshtein is the standard
    * DP edit distance in both engines → deterministic integer oracle. The
    * cross join is dim×dim (25×25) — the bounded kind; at corpus scale the
    * production shape is blocking (join on a cheap key like soundex/prefix)
    * before the per-pair distance, exactly like LSH bands before Jaccard.
    */
  val qStrFuzzyMatch = Q(
    "q_str_fuzzy_match",
    (s, dir) => {
      val a = Tables.nation(s, dir).select(col("n_name").as("name_a"))
      val b = Tables.nation(s, dir).select(col("n_name").as("name_b"))
      a.crossJoin(b)
        .where(col("name_a") < col("name_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast(LongType))
        .where(col("dist") <= 5)
        .orderBy("name_a", "name_b")
    },
    Some("""SELECT a.n_name AS name_a, b.n_name AS name_b,
                   levenshtein(a.n_name, b.n_name) AS dist
            FROM nation a, nation b
            WHERE a.n_name < b.n_name
              AND levenshtein(a.n_name, b.n_name) <= 5
            ORDER BY name_a, name_b"""))

  /** Semi-structured VARIANT round trip (Spark 4 native type): synthesize a
    * nested JSON document per order in-plan, `parse_json` it into a VARIANT
    * column, then extract typed fields back out with `variant_get` (top
    * level, nested object, array element) and aggregate them. The oracle is
    * an INDEPENDENT FORMULATION — DuckDB aggregates the raw base columns
    * directly, never sees JSON — so a hash match proves the
    * build→parse→extract pipeline preserved every value and type exactly.
    * Only integer/string fields go into the JSON (float→text formatting is
    * engine-specific; the decimal policy in Det covers numeric aggregation,
    * not serialization).
    *
    * Scale posture: VARIANT is the 100 TB answer to schema-on-read logs —
    * parse once into a binary columnar encoding, extract fields with
    * codegen'd accessors instead of re-parsing text per query. The whole
    * query is one projection + one bounded-key aggregate, no shuffle of raw
    * JSON text.
    */
  val qJsonVariant = Q(
    "q_json_variant",
    (s, dir) => {
      val j = concat(
        lit("""{"id": """), col("o_orderkey"),
        lit(""", "st": """"), col("o_orderstatus"),
        lit("""", "tags": ["y:"""), year(col("o_orderdate")),
        lit("""", "p:"""), col("o_orderpriority"),
        lit(""""], "meta": {"y": """), year(col("o_orderdate")),
        lit("""}}"""))
      Tables.orders(s, dir)
        .select(parse_json(j).as("v"))
        .select(
          variant_get(col("v"), "$.st", "string").as("st"),
          variant_get(col("v"), "$.meta.y", "int").as("yr"),
          variant_get(col("v"), "$.tags[1]", "string").as("pri_tag"),
          variant_get(col("v"), "$.id", "bigint").as("id"))
        .groupBy("st", "yr")
        .agg(count(lit(1)).as("n"),
          min(col("pri_tag")).as("min_pri_tag"),
          max(col("id")).as("max_id"))
        .orderBy("st", "yr")
    },
    Some("""SELECT o_orderstatus AS st,
                   CAST(year(o_orderdate) AS INTEGER) AS yr,
                   count(*) AS n,
                   min('p:' || o_orderpriority) AS min_pri_tag,
                   max(o_orderkey) AS max_id
            FROM orders GROUP BY st, yr ORDER BY st, yr"""))

  val all: Seq[Q] = Seq(
    qStrGeoid, qStrClean, qDateParts, qMathRate, qCondFlags, qJsonExtract,
    qArrayOps, qMapOps, qStrFuzzyMatch, qJsonVariant)
}
