package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Llm, Windows}
import graft.sources.Tables

/** Semantic pins for the round-10 batch-7 operators. */
class R10Batch7Spec extends AnyFunSuite with SparkFixture {

  test("corpus drift: TV in [0,1] and matches brute-force per lang") {
    val got = Llm.qCorpusDrift.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val global = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTot = toks.length.toLong
    toks.groupBy(_._1).foreach { case (lang, ts) =>
      val cl = ts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val nl = ts.length.toLong
      // iterator, not keys.map: mapping a Set would collapse equal
      // per-token deviations before the sum
      val num = global.keys.iterator.map { t =>
        (BigInt(cl.getOrElse(t, 0L)) * nTot - BigInt(global(t)) * nl).abs
      }.sum
      val tv = num.toDouble / (2.0 * nl.toDouble * nTot.toDouble)
      val (gn, gtv) = got(lang)
      assert(gn == nl)
      assert(gtv >= 0.0 && gtv <= 1.0)
      assert(math.abs(gtv - tv) <= 1e-12, s"$lang: $gtv vs $tv")
    }
  }

  test("top-N share: exact ratios, monotone cumulative, true top set") {
    val rows = Aggregates.qAggTopnShare.fn(spark, sfDir).collect()
    assert(rows.length == 10)
    val per = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE) " +
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tot = per.map(_._2).sum
    val top10 = per.sortBy { case (k, v) => (-v, k) }.take(10)
    var cum = 0L
    rows.zip(top10).zipWithIndex.foreach { case ((r, (k, v)), i) =>
      assert(r.getInt(0) == i + 1)
      assert(r.getLong(1) == k && r.getLong(2) == v)
      assert(r.getDouble(3) == v.toDouble / tot.toDouble)
      cum += v
      assert(r.getDouble(4) == cum.toDouble / tot.toDouble)
    }
    // monotone non-increasing revenue, increasing cumulative share
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) >= b.getLong(2))
      assert(a.getDouble(4) < b.getDouble(4))
    }
  }

  test("time-to-convert: quantiles are elements and order correctly") {
    val r = Windows.qTimeToConvert.fn(spark, sfDir).collect().head
    val (n, p25, med, p75) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val ev = Tables.events(spark, sfDir)
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("vt"))
    val deltas = ev.where(col("event_type") === "purchase")
      .join(v, "user_id").where(col("ts") >= col("vt"))
      .groupBy("user_id")
      .agg((unix_micros(min(col("ts"))) - unix_micros(min(col("vt"))))
        .as("d"))
      .collect().map(_.getLong(1)).sorted
    assert(n == deltas.length)
    assert(p25 == deltas(((n + 3) / 4 - 1).toInt))
    assert(med == deltas(((n + 1) / 2 - 1).toInt))
    assert(p75 == deltas(((3 * n + 3) / 4 - 1).toInt))
    assert(p25 <= med && med <= p75)
    assert(r.getDouble(4) == deltas.map(BigInt(_)).sum.toDouble / n)
  }
}
