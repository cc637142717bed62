package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver-generated tables
  * (/root/repo/FIXTURES.md is the spec; schemas verified against parquet
  * footers). Never `inferSchema` — determinism doctrine SURVEY.md §1.3.
  *
  * Reference analog: the CSV/GeoJSON inputs of EvictionLab/eviction-lab-etl
  * (stats CSVs keyed by GEOID×year, geography features). Here each loader is
  * the "fetch + typed parse" make-target equivalent [ref:Makefile data
  * targets (H), SURVEY.md §0 citation policy].
  */
object Tables {

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS); with
    * nanosAsLong=true Spark surfaces it as LongType.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def load(spark: SparkSession, sfDir: String, name: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "region", regionSchema)
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "nation", nationSchema)
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "supplier", supplierSchema)
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "customer", customerSchema)
  def part(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "part", partSchema)
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders", ordersSchema)
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "lineitem", lineitemSchema)
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings", embeddingsSchema)

  /** The ONE place that knows how `events.ts` is physically encoded
    * (SURVEY.md §7.1) — and the one loader that must NOT pin an explicit
    * schema blindly: the driver has shipped this table both as
    * TIMESTAMP(NANOS) (earlier rounds) and TIMESTAMP(MICROS) (current
    * regeneration), and a hardcoded ns assumption on a µs file silently
    * compresses every timestamp 1000× toward the epoch (caught 2026-08-13
    * when the testdata was regenerated µs — every event-time query would
    * have failed its oracle). So: read the self-describing parquet footer
    * (footer-only, not a data scan — the no-inferSchema doctrine targets
    * text formats) and normalize by the surfaced type.
    *
    * NANOS path: Spark 4.1.2 throws PARQUET_TYPE_ILLEGAL on ns timestamps
    * unless `spark.sql.legacy.parquet.nanosAsLong=true`; the column then
    * surfaces as LongType ns and we floor-divide to µs, matching DuckDB's
    * native ns→µs truncation for post-1970 data. Integer division (`div`)
    * is mandatory: ns-since-epoch ≈ 1.7e18 exceeds double's 2^53 exact
    * range, so a float path would corrupt timestamps.
    * MICROS path: surfaces as Timestamp(NTZ)Type already at µs — cast to
    * TimestampType (identity under the session's pinned UTC).
    *
    * CAVEAT: the nanosAsLong flag is a session-global conf set at read time
    * (Spark offers no per-read option for it). It only widens what the
    * parquet reader ACCEPTS, so leaving it set is harmless to other queries,
    * but like every session-conf mutation here it assumes the driver's
    * sequential query loop — concurrent builds on one session should set it
    * once up front.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast(TimestampType)
    }
    raw.select(col("event_id").cast(LongType).as("event_id"), ts.as("ts"),
      col("user_id").cast(LongType).as("user_id"), col("event_type"),
      col("value").cast(DoubleType).as("value"), col("props"))
  }

  /** Register every fixture table as a session temp view so the engine's
    * FULL surface is reachable from plain `spark.sql(...)` — the same
    * declarative plans Catalyst sees from the DataFrame API (views are
    * lazy analysis-time substitutions, zero materialization). `events`
    * registers through the ns-aware loader above, so SQL users inherit the
    * correct timestamp semantics for free.
    */
  def createViews(spark: SparkSession, sfDir: String): Unit = {
    region(spark, sfDir).createOrReplaceTempView("region")
    nation(spark, sfDir).createOrReplaceTempView("nation")
    supplier(spark, sfDir).createOrReplaceTempView("supplier")
    customer(spark, sfDir).createOrReplaceTempView("customer")
    part(spark, sfDir).createOrReplaceTempView("part")
    orders(spark, sfDir).createOrReplaceTempView("orders")
    lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    documents(spark, sfDir).createOrReplaceTempView("documents")
    embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    events(spark, sfDir).createOrReplaceTempView("events")
  }
}
