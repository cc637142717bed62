package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — SURVEY.md §2/§7.3 "pre-partitioning" path.
  *
  * At 100 TB the lineitem⋈orders-class join shuffles both fact tables on
  * every run. Writing both sides bucketed (and sorted) by the join key once
  * makes every subsequent equi-join on that key exchange-free: Spark reads
  * matching buckets pairwise and (with sorted buckets) merge-joins with no
  * shuffle and no sort. The BucketingSpec asserts the no-Exchange plan.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
