package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Prefix

/** Prefix (two-phase monotone-bucket prefix) must be EXACTLY equivalent to
  * the partition-less global window it replaces — for ranks, running sums
  * and the replayed NTILE fill rule — including ties, descending metrics,
  * skewed value ranges and the degenerate all-equal input.
  */
class PrefixSpec extends AnyFunSuite with SparkFixture {

  // deterministic pseudo-random rows: values cluster (ties) and skew
  private def data(n: Int) = {
    val s = spark
    s.range(n.toLong).select(
      col("id"),
      pmod(Det.pHash60(col("id")), lit(97)).as("v"),
      (pmod(Det.pHash60(concat(col("id"), lit("x"))), lit(1000))
        .cast("double") / 10.0).as("w"))
  }

  test("globalRank == global row_number, asc and desc, with ties") {
    val df = data(5000)
    for (desc <- Seq(false, true)) {
      val ord = if (desc) Seq(col("v").desc, col("id")) else Seq(col("v").asc, col("id"))
      val truth = df.withColumn("rk_t", row_number().over(Window.orderBy(ord: _*)))
      val got = Prefix.globalRank(
        Prefix.withRangeBucket(df, col("v"), 16, "b"), "b", ord, desc, "rk")
      val bad = got.join(truth, "id")
        .where(col("rk") =!= col("rk_t")).count()
      assert(bad === 0L, s"desc=$desc: $bad rank mismatches")
    }
  }

  test("runningSum == global window sum (decimal, desc order)") {
    val df = data(3000)
    val dec = DecimalType(26, 6)
    val ord = Seq(col("w").desc, col("id"))
    val truth = df.withColumn("c_t",
      sum(col("w").cast(dec)).over(Window.orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Prefix.runningSum(
      Prefix.withRangeBucket(df, col("w"), 16, "b"), "b", ord,
      bucketDesc = true, col("w").cast(dec), "c")
    val bad = got.join(truth, "id")
      .where(col("c") =!= col("c_t")).count()
    assert(bad === 0L, s"$bad running-sum mismatches")
  }

  test("ntileFromRank replays the SQL NTILE fill rule for ragged n") {
    // n not divisible by k exercises the extras-go-first rule; n < k
    // exercises the q=0 branch guard
    for (n <- Seq(3, 5, 23, 100, 101, 104)) {
      val df = data(n)
      val truth = df
        .withColumn("t", ntile(5).over(Window.orderBy(col("v"), col("id"))))
      val got = Prefix.globalRank(
          Prefix.withRangeBucket(df, col("v"), 8, "b"),
          "b", Seq(col("v"), col("id")), bucketDesc = false, "rk")
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .withColumn("g", Prefix.ntileFromRank("rk", "n", 5))
      val bad = got.join(truth, "id").where(col("g") =!= col("t")).count()
      assert(bad === 0L, s"n=$n: $bad ntile mismatches")
    }
  }

  test("groupedRunningMaxExcl == per-group exclusive window max") {
    val df = data(4000).withColumn("g",
      pmod(Det.pHash60(concat(col("id"), lit("g"))), lit(3)))
    val ord = Seq(col("w").desc, col("v").desc, col("id"))
    val truth = df.withColumn("m_t",
      max(col("v")).over(Window.partitionBy(col("g")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, -1)))
    val got = Prefix.groupedRunningMaxExcl(
      Prefix.withGroupRangeBucket(df, Seq("g"), col("w"), 16, "b"),
      Seq("g"), "b", ord, bucketDesc = true, col("v"), "m")
    val bad = got.join(truth.select(col("id"), col("m_t")), "id")
      .where(not(col("m") <=> col("m_t"))).count()
    assert(bad === 0L, s"$bad grouped running-max mismatches")
  }

  test("groupedRank / groupedRunningSum == per-group window forms") {
    val df = data(4000).withColumn("g",
      pmod(Det.pHash60(concat(col("id"), lit("q"))), lit(5)))
    val ord = Seq(col("v").asc, col("id"))
    val truth = df
      .withColumn("rk_t", row_number().over(
        Window.partitionBy(col("g")).orderBy(ord: _*)))
      .withColumn("c_t", sum(col("v")).over(
        Window.partitionBy(col("g")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val b = Prefix.withGroupRangeBucket(df, Seq("g"), col("v"), 16, "b")
    val got = Prefix.groupedRunningSum(
      Prefix.groupedRank(b, Seq("g"), "b", ord, bucketDesc = false, "rk"),
      Seq("g"), "b", ord, bucketDesc = false, col("v"), "c")
    val bad = got.join(truth.select(col("id"), col("rk_t"), col("c_t")), "id")
      .where(col("rk") =!= col("rk_t") || col("c") =!= col("c_t")).count()
    assert(bad === 0L, s"$bad grouped rank/cumsum mismatches")
  }

  test("degenerate all-equal metric collapses to one bucket, stays exact") {
    val df = spark.range(100).select(col("id"), lit(7).as("v"))
    val got = Prefix.globalRank(
      Prefix.withRangeBucket(df, col("v"), 16, "b"),
      "b", Seq(col("v"), col("id")), bucketDesc = false, "rk")
    val truth = df.withColumn("rk_t",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    assert(got.join(truth, "id").where(col("rk") =!= col("rk_t")).count() === 0L)
  }
}
