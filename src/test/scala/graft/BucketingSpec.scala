package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketing, Tables}

/** Bucketed tables must join with NO exchange and match the plain join. */
class BucketingSpec extends AnyFunSuite with SparkFixture {

  test("bucketed fact-fact join is exchange-free and row-identical") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.bucketedJoin(spark,
        "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      val plainCount = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(bucketed.count() == plainCount)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("r20 store layout: one file per bucket, merge joins sort-free") {
    // The adamic-adar rehearsal spill post-mortem (BASELINE.md r20):
    // multi-file buckets mean no consumer can trust per-bucket
    // sortedness, so every merge join re-sorts the store it just read —
    // at 30× that sort was the entire 641 MB–9.1 GB spill. Two
    // invariants pin the fix so a refactor can't silently reintroduce
    // it: (a) writeBucketed's aligning repartition leaves exactly one
    // file per bucket even when the input df has many partitions;
    // (b) with the sorted-scan trust conf ensureBucketed sets, an
    // equi-self-join over the store plans as SortMergeJoin with NO Sort
    // and NO Exchange.
    val df = spark.range(0L, 5000L, 1L, 16) // 16 input partitions
      .select((col("id") % 97).as("k"), col("id").as("v"))
    graft.sources.Bucketing.ensureBucketed(df, "sorted_bkt", "k",
      buckets = 8, inputs = Seq(sfDir + "/region.parquet"))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dir = new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(wh, "sorted_bkt").toString match {
        case s if s.startsWith("file:") => s
        case s => "file:" + s
      }))
    val bucketFiles = dir.listFiles().map(_.getName)
      .filter(_.startsWith("part-"))
    // bucket id is the _NNNNN suffix before .c000; each must be unique
    val byBucket = bucketFiles.groupBy(n => n.split("_").last)
    val multi = byBucket.filter(_._2.length > 1)
    assert(multi.isEmpty,
      s"buckets with >1 file (sortedness untrustable): $multi")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = spark.table("sorted_bkt")
      val j = t.toDF("k", "va").join(t.toDF("k", "vb"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange"),
        s"bucketed self-join still shuffles:\n${plan.take(1500)}")
      assert(!plan.contains("Sort ["),
        s"bucketed self-join still SORTS its sorted input:\n${
          plan.take(1500)}")
      assert(j.count() ==
        df.groupBy("k").count().agg(sum(col("count") * col("count")))
          .head.getLong(0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS sorted_bkt")
    }
  }

  test("writeBucketed survives an orphaned warehouse dir from a dead session") {
    // simulate the cross-session failure: location exists on disk, but the
    // (in-memory) catalog has no table entry — plain saveAsTable dies with
    // LOCATION_ALREADY_EXISTS here
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, "orphan_bkt")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    fs.create(new org.apache.hadoop.fs.Path(loc, "stale.parquet")).close()
    spark.sql("DROP TABLE IF EXISTS orphan_bkt") // catalog entry gone, files remain
    try {
      Bucketing.writeBucketed(
        Tables.region(spark, sfDir), "orphan_bkt", "r_regionkey", 2)
      assert(spark.table("orphan_bkt").count() == 5)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orphan_bkt")
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  test("ensureBucketed: skips when fresh, rebuilds when inputs change") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, "ensure_bkt/_SUCCESS")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val df = Tables.region(spark, sfDir).select("r_regionkey", "r_name")
      Bucketing.ensureBucketed(df, "ensure_bkt", "r_regionkey", 2,
        Seq(s"$sfDir/region.parquet"))
      val t1 = fs.getFileStatus(loc).getModificationTime
      // same inputs, fresh output → no rewrite
      Bucketing.ensureBucketed(df, "ensure_bkt", "r_regionkey", 2,
        Seq(s"$sfDir/region.parquet"))
      assert(fs.getFileStatus(loc).getModificationTime == t1,
        "fresh table was rewritten")
      // different declared inputs → must rebuild even though files are fresh
      Bucketing.ensureBucketed(df, "ensure_bkt", "r_regionkey", 2,
        Seq(s"$sfDir/nation.parquet"))
      assert(fs.getFileStatus(loc).getModificationTime > t1,
        "input change did not trigger a rebuild")
      assert(spark.table("ensure_bkt").count() == 5)
    } finally spark.sql("DROP TABLE IF EXISTS ensure_bkt")
  }

  test("t2 q_join_bucketed: join stage has no exchange, agg result sane") {
    try {
      val df = Bucketing.qJoinBucketed.fn(spark, sfDir)
      // the ONLY exchanges allowed are the bounded post-join aggregate and
      // the final sort — the join itself must read buckets pairwise
      val plan = df.queryExecution.executedPlan.toString
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"join inputs still shuffle:\n${plan.take(2000)}")
      val rows = df.collect()
      assert(rows.length == 5 && rows.map(_.getLong(1)).sum > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_o_bkt")
    }
  }
}
