package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
import graft.functions.{Scalars, Sketches, Udx}
import graft.sources.{Bucketing, SourcesSinks}
import graft.streaming.StreamQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All implemented capabilities, one Q per SURVEY.md §2 row. */
  private def allQueries: Seq[Q] =
    Relational.all ++ Aggregates.all ++ Windows.all ++ Scalars.all ++
      StreamQueries.all ++ Llm.all ++ Udx.all ++ Multimodal.all ++
      SourcesSinks.all ++ Skew.all ++ Bucketing.all ++ Sketches.all ++
      Layout.all ++ Analytics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qJoinMultiwayStar.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
