package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format sources and sinks — SURVEY.md §2.A (○ unit-tested surface).
  *
  * Reference semantics: the ETL's primary inputs are header CSVs with ""/-1
  * null sentinels; outputs are per-state CSV shards for data download and
  * NDJSON feature rows feeding the tile builder (tippecanoe — the external
  * C++ tile step stays out of engine scope; we emit its exact input)
  * [ref:data CSV targets, data-download targets, tiles targets (H) —
  * SURVEY.md §0].
  *
  * Scale posture: explicit schemas always (no inferSchema scan), writers
  * partition by a bounded-cardinality key so each output task streams one
  * shard; NDJSON emission is a pure projection (one codegen stage, no
  * shuffle).
  */
object SourcesSinks {

  /** CSV source with explicit schema, header, and the reference's null
    * sentinel convention ("" and -1 → null).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              nullValue: String = "-1"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("nullValue", nullValue)
      .option("emptyValue", nullValue) // "" follows the same sentinel rule
      .csv(path)

  /** Header CSV writer. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Per-key CSV shards (per-state data-download zips analog). */
  def writeCsvPartitioned(df: DataFrame, path: String,
                          partCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .option("header", "true")
      .csv(path)

  /** JSON-lines source with explicit schema (census-API response analog). */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines writer. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** GeoJSON-ish NDJSON feature rows: one Feature object per row with
    * `properties` from the given columns and a Point geometry from (x, y) —
    * byte-exact input format for an external tile builder.
    */
  def toFeatureRows(df: DataFrame, idCol: String, xCol: String, yCol: String,
                    propCols: Seq[String]): DataFrame = {
    val props = struct(propCols.map(col): _*)
    df.select(to_json(struct(
      lit("Feature").as("type"),
      col(idCol).as("id"),
      props.as("properties"),
      struct(lit("Point").as("type"),
        array(col(xCol), col(yCol)).as("coordinates")).as("geometry")))
      .as("feature"))
  }

  /** NDJSON sink for feature rows (tippecanoe input). */
  def writeFeatureRows(features: DataFrame, path: String): Unit =
    features.write.mode("overwrite").text(path)

  /** Parquet sink (the Verify path itself uses this). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
