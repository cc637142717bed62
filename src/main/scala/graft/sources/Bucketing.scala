package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Q}

/** Bucketed co-located joins — SURVEY.md §2/§7.3 "pre-partitioning" path.
  *
  * At 100 TB the lineitem⋈orders-class join shuffles both fact tables on
  * every run. Writing both sides bucketed (and sorted) by the join key once
  * makes every subsequent equi-join on that key exchange-free: Spark reads
  * matching buckets pairwise and (with sorted buckets) merge-joins with no
  * shuffle and no sort. The BucketingSpec asserts the no-Exchange plan.
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table.
    *
    * The in-memory catalog forgets tables when the session ends but the
    * warehouse directory's files persist, so a later session's CREATE hits
    * LOCATION_ALREADY_EXISTS (mode("overwrite") only overwrites tables the
    * CURRENT catalog knows about). Drop the catalog entry AND delete the
    * orphaned location before writing.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = BuildTimer.timed {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // ONE FILE PER BUCKET (r20): without the aligning repartition each
    // writer task emits its own file into every bucket it touches, and
    // the scan trusts per-bucket sortedness only when a bucket is a
    // single file — so every downstream merge join re-SORTED its inputs
    // (the sort, not the pair aggregate, was the real source of the
    // adamic-adar rehearsal spill: 641 MB at 30×, 9.1 GB at 10×/8 g).
    // Repartitioning on the bucket key (same murmur3 hash as the bucket
    // spec) concentrates each bucket in exactly one task → one file →
    // consumers plan exchange-free AND sort-free. One extra exchange on
    // the WRITE path, amortized across every read like the store itself.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** writeBucketed with make semantics: skip the rewrite when the catalog
    * already has the table AND its files are newer than every input (the
    * Incremental freshness check — pure metadata). The one-time-per-ingest
    * cost bucketing promises becomes literal: repeat runs in a session pay
    * only the exchange-free join. A fresh session (empty catalog) rewrites
    * even if files survive — re-registering orphaned bucket files without
    * their bucket spec risks a silently wrong co-located join, and a
    * rewrite is merely slow.
    */
  def ensureBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int, inputs: Seq[String]): Unit =
    // per-table build lock + double-checked freshness: two queries
    // sharing one bucketed store (pagerank/sssp on the adjacency) must
    // not race the DROP/delete/rewrite — see Incremental.withBuildLock
    Incremental.withBuildLock(s"bucketed:$table") {
    val spark = df.sparkSession
    // Sorted-bucket trust (r20, with the one-file-per-bucket writer
    // below): since Spark 3 the scan reports NO output ordering for
    // bucketed tables by default, so every merge-join consumer re-sorts
    // the store it just read — the adamic-adar rehearsal spill in full.
    // This legacy conf re-enables the ordering report; Spark lists the
    // bucket files at planning time and honors sortedness only when a
    // bucket is a single file — exactly the layout writeBucketed now
    // guarantees. Session-scoped, set where the store is ensured so the
    // behavior travels with the library (planning-time file listing is
    // metadata-cheap at any bucket count).
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
      "true")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase).toString
    // the skip must never serve a table built from DIFFERENT inputs (e.g.
    // another scale factor earlier in the same session): the builder's
    // input list is recorded as a table property and must match exactly
    val want = inputs.sorted.mkString(",")
    val fresh = spark.catalog.tableExists(table) && {
      val props = spark.sql(s"SHOW TBLPROPERTIES `$table`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      props.get("graft.inputs").contains(want)
    } && Incremental.isFresh(spark, inputs, loc)
    if (!fresh) BuildTimer.timed {
      writeBucketed(df, table, key, buckets)
      spark.sql(
        s"ALTER TABLE `$table` SET TBLPROPERTIES ('graft.inputs' = '$want')")
    }
  }

  /** Equi-join two same-bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** q_join_inner through the bucketed path: pre-partition both fact sides
    * bucketed+sorted on the join key (the one-time cost a 100 TB pipeline
    * pays once per ingest), then the same join/aggregate runs with NO join
    * exchange and NO join sort — BucketingSpec plan-asserts it. Same oracle
    * as q_join_inner: bucketing is a pure physical-layout change. Table
    * names are fixed; the driver runs queries sequentially (same contract
    * as the session-conf toggles documented in Aggregates/Tables).
    */
  val qJoinBucketed = Q(
    "q_join_bucketed",
    (s, dir) => {
      ensureBucketed(Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice"),
        "graft_li_bkt", "l_orderkey", buckets = 8,
        inputs = Seq(s"$dir/lineitem.parquet"))
      ensureBucketed(Tables.orders(s, dir)
        .select("o_orderkey", "o_orderpriority"),
        "graft_o_bkt", "o_orderkey", buckets = 8,
        inputs = Seq(s"$dir/orders.parquet"))
      bucketedJoin(s, "graft_li_bkt", "graft_o_bkt",
        "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_px"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority, count(*) AS n,
                    ${Det.sqlSum("l_extendedprice")} AS sum_px
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[Q] = Seq(qJoinBucketed)
}
