package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: key correctness against a reference bit-interleave,
  * row preservation through the clustering, and the property the layout
  * exists FOR — per-slice span shrinks in BOTH dimensions at once, which
  * is what parquet row-group min/max pruning consumes at scale (a linear
  * sort can only ever deliver it in one).
  */
class LayoutSpec extends AnyFunSuite with SparkFixture {
  private lazy val S = spark
  import S.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zKey matches a reference Morton interleave on the full 21-bit range") {
    val samples = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 54321L),
      ((1L << 21) - 1, 0L), (0L, (1L << 21) - 1),
      ((1L << 21) - 1, (1L << 21) - 1), (1048576L, 2L))
    val got = samples.toDF("a", "b")
      .select(Layout.zKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == samples.map { case (a, b) => mortonRef(a, b, 21) })
  }

  test("zKey stays inside whole-stage codegen (no UDF fallback)") {
    val plan = spark.range(10)
      .select(Layout.zKey(col("id"), col("id")).as("z"))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage marker on the Project IS the codegen assertion
    assert(plan.contains("*(1) Project"), plan)
  }

  test("zorderBy preserves every row (count + order-free checksum)") {
    val src = graft.sources.Tables.lineitem(spark, sfDir)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey")))).first()
      (r.getLong(0), r.getLong(1))
    }
    val z = Layout.zorderBy(src, col("l_partkey"), col("l_suppkey"), 4)
    assert(sig(z) == sig(src))
    assert(z.schema == src.schema) // the key column must not leak out
  }

  test("compact bin-packs small files without shuffling or losing rows") {
    val src = graft.sources.Tables.lineitem(spark, sfDir)
    val shardDir = tmpDir("compact_in")
    src.repartition(64).write.mode("overwrite").parquet(shardDir)
    val outDir = tmpDir("compact_base") + "/out"
    // target = half the total -> expect ~2 output files, never 64
    val total = new java.io.File(shardDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (before, after) =
      Layout.compact(spark, shardDir, outDir, targetBytes = total / 2 + 1)
    assert(before == 64 && after <= 3, s"($before, $after)")
    def sig(df: org.apache.spark.sql.DataFrame) = df.agg(count(lit(1)),
      bit_xor(xxhash64(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey")))).first()
    assert(sig(spark.read.parquet(outDir)) == sig(src))
    // narrow plan: a compaction that shuffles would be an Exchange here
    val p = spark.read.parquet(shardDir).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("z-order bounds per-slice span in BOTH dims; linear sort cannot") {
    // 4096 points on a 64x64 grid -> 16 slices. On the z-curve each slice
    // is a compact tile (span ~1/4 of the range per dim); sorted linearly
    // by `a` alone, every slice spans the FULL b range.
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("long").as("a"),
        pmod(col("id"), lit(64L)).as("b"))
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .select(col("a"), col("b"), spark_partition_id().as("p"))
        .groupBy("p")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).first()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (za, zb) = meanSpans(
      Layout.zorderBy(grid, col("a"), col("b"), 16, bits = 6))
    val (la, lb) = meanSpans(
      grid.repartitionByRange(16, col("a")).sortWithinPartitions("a"))
    // z-order: both spans bounded well below the full 63-range
    assert(za <= 24 && zb <= 24,
      s"z-order slices not 2-D local: mean spans ($za, $zb)")
    // linear sort: the sorted dim clusters tightly, the other spans ~full
    assert(la <= 8, s"linear sort failed to cluster its own dim ($la)")
    assert(lb >= 56,
      s"expected near-full b-span under linear sort, got $lb — " +
        "the comparison baseline is broken")
  }
}
