package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sketches
import graft.operators.Llm
import graft.sources.Tables

/** CMS guarantees: never under-counts, over-counts bounded by eps·N. */
class SketchesSpec extends AnyFunSuite with SparkFixture {

  test("count-min sketch brackets exact token counts within eps*N") {
    val toks = Llm.tokens(Tables.documents(spark, sfDir))
      .select("tok").cache()
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val cms = Sketches.countMinOver(toks, "tok", eps = 0.001)
    val est = Sketches.estimate(cms, exact.keys.toSeq)
    toks.unpersist()
    exact.foreach { case (tok, n) =>
      val e = est(tok)
      assert(e >= n, s"CMS under-counted $tok: $e < $n")
      assert(e <= n + math.ceil(0.001 * total).toLong + 1,
        s"CMS over-count beyond bound for $tok: $e vs $n (N=$total)")
    }
  }

  test("heavy-hitters query: 20 rows, descending, CMS filter drops none") {
    val rows = Sketches.qSketchHeavyHitters.fn(spark, sfDir).collect()
    // the CMS certification filter must be a no-op (est within bounds for
    // every candidate) — fewer than 20 rows means the bound failed
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("CMS is deterministic for a fixed seed") {
    val toks = Llm.tokens(Tables.documents(spark, sfDir)).select("tok")
    val a = Sketches.countMinOver(toks, "tok")
    val b = Sketches.countMinOver(toks, "tok")
    val keys = Seq("engine", "data", "the", "query")
    assert(Sketches.estimate(a, keys) == Sketches.estimate(b, keys))
  }

  test("portable HLL: estimate within bound, bridged to engine HLL") {
    // the r14 no-oracle gap closer: the portable sketch's estimate and
    // Spark's engine-internal HLL++ (q_agg_approx_distinct's machinery)
    // must BOTH land within their error envelopes of the same exact
    // truth — the cross-check that bridges the oracle-certified
    // construction to the engine-internal path. m=256 => sigma = 1.04/16
    // = 6.5%; 3 sigma = 19.5% (observed: 4.0% at sf0.01).
    val rows = Sketches.qSketchHllPortable.fn(spark, sfDir).collect()
    assert(rows.length == 256 ||
      rows.length < 256 && rows.length > 0, "register table")
    val est = rows.head.getDouble(3)
    val actual = rows.head.getLong(4)
    val relErr = rows.head.getDouble(5)
    assert(math.abs(relErr) <= 0.195,
      s"portable HLL outside 3 sigma: $relErr")
    assert(relErr == BigDecimal((est - actual) / actual)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val engine = Tables.lineitem(spark, sfDir)
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct(org.apache.spark.sql.functions
          .col("l_orderkey"), 0.05).as("e"))
      .head().getLong(0)
    assert(math.abs(engine - actual).toDouble / actual <= 0.15,
      s"engine HLL++ outside its rsd envelope: $engine vs $actual")
  }

  test("portable HLL registers merge as a semilattice (mergeability)") {
    // the property that makes any sketch a SKETCH: max-merge of the
    // per-half register tables must equal the whole-corpus table —
    // i.e. partial sketches built on disjoint partitions combine
    // losslessly, the 100 TB distribution contract.
    import org.apache.spark.sql.functions._
    def regsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(graft.Det.pHash60(col("l_orderkey")).as("h"))
      .select(pmod(col("h"), lit(256)).as("reg"),
        expr("h div 256").as("w"))
      .select(col("reg"), expr(
        "CASE WHEN w = 0 THEN 53 ELSE CAST(round(log2(" +
          "CAST((w & (-w)) AS DOUBLE))) AS INTEGER) + 1 END").as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("rho_max"))
    val li = Tables.lineitem(spark, sfDir)
    val whole = regsOf(li).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = regsOf(li.where(col("l_orderkey") % 2 === 0)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = regsOf(li.where(col("l_orderkey") % 2 =!= 0)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == whole,
      "max-merge of disjoint halves must equal the whole-corpus sketch")
  }

  test("grouped shard-merge law: per-(group, shard) registers max-merged " +
      "per group equal the per-group direct build (random keys)") {
    // the q_agg_hll_shards shape generalized: not 2 halves but an
    // arbitrary 8-way shard split WITHIN groups, on synthetic keys a
    // seeded RNG draws with duplicates and skew — the n-way grouped
    // form of the semilattice law the oracle certifies on fixed data.
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1719)
    val rows = Seq.tabulate(20000) { _ =>
      (Seq("A", "B", "C")(rnd.nextInt(3)),
        // skewed key space: heavy dups in a small range + a long tail
        if (rnd.nextBoolean()) rnd.nextInt(500).toLong
        else rnd.nextLong().abs % 1000000L)
    }
    val df = rows.toDF("g", "k")
      .withColumn("shard", pmod(col("k"), lit(8)))
      .withColumn("h", graft.Det.pHash60(col("k")))
      .select(col("g"), col("shard"),
        pmod(col("h"), lit(256)).as("reg"), expr("h div 256").as("w"))
      .select(col("g"), col("shard"), col("reg"), expr(
        "CASE WHEN w = 0 THEN 53 ELSE CAST(round(log2(" +
          "CAST((w & (-w)) AS DOUBLE))) AS INTEGER) + 1 END").as("rho"))
    val direct = df.groupBy("g", "reg").agg(max(col("rho")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    val viaShards = df.groupBy("g", "shard", "reg")
      .agg(max(col("rho")).as("m"))
      .groupBy("g", "reg").agg(max(col("m")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(viaShards == direct,
      "per-group max-merge across 8 shards must equal the direct build")
  }
}
