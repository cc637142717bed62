package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Semantic pins for the round-11 analytics operators — hand-checked toy
  * inputs with known answers, independent of the DuckDB parity gate.
  */
class AnalyticsSpec extends AnyFunSuite with SparkFixture {

  test("skyline running-max rule equals the O(n²) dominance definition") {
    val s = spark
    import s.implicits._
    // one segment; points: (10,1) (8,5) (8,3) (5,5) (3,9) (3,2)
    // skyline: (10,1), (8,5), (3,9). (5,5) dominated by (8,5);
    // (8,3) by (8,5); (3,2) by (3,9).
    val pts = Seq((10L, 1L), (8L, 5L), (8L, 3L), (5L, 5L), (3L, 9L),
      (3L, 2L)).zipWithIndex
      .map { case ((m, f), i) => ("S", m, f, i.toLong) }
      .toDF("segment", "money_c", "freq", "keeper")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("segment"))
      .orderBy(col("money_c").desc, col("freq").desc, col("keeper"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val sky = pts.withColumn("cmax", max(col("freq")).over(w))
      .where(col("cmax").isNull || col("freq") > col("cmax"))
      .select("money_c", "freq").as[(Long, Long)].collect().toSet
    // brute-force dominance over the same points
    val raw = Seq((10L, 1L), (8L, 5L), (8L, 3L), (5L, 5L), (3L, 9L), (3L, 2L))
    val brute = raw.filterNot { case (m, f) =>
      raw.exists { case (m2, f2) =>
        m2 >= m && f2 >= f && (m2 > m || f2 > f) }
    }.toSet
    assert(sky === brute)
    assert(sky === Set((10L, 1L), (8L, 5L), (3L, 9L)))
  }

  test("Mann-Kendall S on a known series") {
    // x = [1, 3, 2, 4]: pairs (1,3)+ (1,2)+ (1,4)+ (3,2)- (3,4)+ (2,4)+
    // → S = 5 - 1 = 4; tau = 2*4/(4*3) = 2/3
    val s = spark
    import s.implicits._
    val daily = Seq(("A", 1, 1L), ("A", 2, 3L), ("A", 3, 2L), ("A", 4, 4L))
      .toDF("flag", "d", "x")
    val a = daily.select(col("flag"), col("d").as("di"), col("x").as("xi"))
    val b = daily.select(col("flag"), col("d").as("dj"), col("x").as("xj"))
    val st = a.join(b, Seq("flag")).where(col("di") < col("dj"))
      .select(when(col("xj") > col("xi"), 1L)
        .when(col("xj") < col("xi"), -1L).otherwise(0L).as("sg"))
      .agg(sum("sg")).as[Long].head()
    assert(st === 4L)
  }

  test("interval overlap arithmetic: touching, nested, disjoint") {
    val s = spark
    import s.implicits._
    import java.sql.Date
    def d(x: String) = Date.valueOf(x)
    // same key: [1..5] vs [5..9] touch (1 day), [1..10] vs [3..4] nested
    // (2 days), [1..2] vs [4..5] disjoint (no row)
    val iv = Seq(
      (1L, 10L, d("2024-01-01"), d("2024-01-05")),
      (1L, 20L, d("2024-01-05"), d("2024-01-09")),
      (2L, 10L, d("2024-01-01"), d("2024-01-10")),
      (2L, 20L, d("2024-01-03"), d("2024-01-04")),
      (3L, 10L, d("2024-01-01"), d("2024-01-02")),
      (3L, 20L, d("2024-01-04"), d("2024-01-05"))
    ).toDF("ck", "ok", "st", "en")
    val aa = iv.select(col("ck"), col("ok").as("ak"),
      col("st").as("ast"), col("en").as("aen"))
    val bb = iv.select(col("ck"), col("ok").as("bk"),
      col("st").as("bst"), col("en").as("ben"))
    val ov = aa.join(bb, Seq("ck"))
      .where(col("ak") < col("bk") &&
        col("ast") <= col("ben") && col("bst") <= col("aen"))
      .select(col("ck"),
        (datediff(least(col("aen"), col("ben")),
          greatest(col("ast"), col("bst"))) + 1).cast("long").as("ov"))
      .as[(Long, Long)].collect().toMap
    assert(ov === Map(1L -> 1L, 2L -> 2L))
  }

  test("feature hashing is stable: same token always lands in its bucket") {
    val s = spark
    import s.implicits._
    val t = Seq("alpha", "beta", "alpha").toDF("tok")
      .withColumn("bucket", pmod(Det.pHash60(col("tok")), lit(256)))
    val buckets = t.where(col("tok") === "alpha")
      .select("bucket").distinct().count()
    assert(buckets === 1L)
  }

  test("table checksum is partitioning-invariant (the order-free contract)") {
    val base = Analytics.qChecksumTable.fn(spark, sfDir).collect().head
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val alt = Analytics.qChecksumTable.fn(spark, sfDir).collect().head
      assert(base === alt,
        "checksum must not depend on partitioning / reduction order")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("covar matrix agrees with native covar_pop to relative 1e-9") {
    import graft.sources.Tables
    val ours = Analytics.qAggCovarMatrix.fn(spark, sfDir).collect().head
    val native = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").cast("double").as("x"),
        expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE) " +
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").cast("double").as("y"))
      .agg(covar_pop(col("x"), col("y"))).collect().head.getDouble(0)
    val got = ours.getAs[Double]("cov_qty_price")
    assert(math.abs(got - native) <= 1e-9 * math.abs(native),
      s"exact-moment covariance drifted from native: $got vs $native")
  }

  test("hampel emits only full 7-day frames and flags a planted spike") {
    val s = spark
    import s.implicits._
    // 9 consecutive days, constant 100 except a spike on day 5
    val daily = (1 to 9).map(i =>
      ("X", java.sql.Date.valueOf(f"2024-01-0$i"),
        if (i == 5) 10000L else 100L)).toDF("flag", "d", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("flag")).orderBy(col("d")).rowsBetween(-3, 3)
    val out = daily
      .withColumn("arr", sort_array(collect_list(col("v")).over(w)))
      .where(size(col("arr")) === 7)
      .withColumn("med", element_at(col("arr"), 4))
      .withColumn("mad", expr(
        "element_at(array_sort(transform(arr, e -> abs(e - med))), 4)"))
      .select(col("d"), col("v"), col("med"),
        (abs(col("v") - col("med")) > col("mad") * 3).as("o"))
      .collect()
    assert(out.length === 3, "only days 4..6 have full frames")
    assert(out.count(_.getBoolean(3)) === 1, "exactly the spike flags")
    assert(out.find(_.getBoolean(3)).get.getLong(1) === 10000L)
  }

  test("knn classify returns one prediction per probe with <= 5 votes") {
    val out = Analytics.qKnnClassify.fn(spark, sfDir)
      .select("probe_id", "votes").collect()
    assert(out.length === out.map(_.getLong(0)).distinct.length)
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 5))
  }
}
