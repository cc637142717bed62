package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Llm, Relational}
import graft.functions.Udx

/** Cross-checks between independent formulations of the same semantics. */
class ConsistencySpec extends AnyFunSuite with SparkFixture {

  test("typed UDAF weighted rate equals native decimal-sum rate") {
    val native = Aggregates.qAggWeightedRate.fn(spark, sfDir)
      .select("l_returnflag", "yr", "rate").collect()
    val typed = Udx.qUdafWeighted.fn(spark, sfDir)
      .select("l_returnflag", "yr", "rate").collect()
    assert(native.length == typed.length)
    native.zip(typed).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getInt(1) == b.getInt(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-12,
        s"rate mismatch at ${a.getString(0)}/${a.getInt(1)}")
    }
  }

  test("unpivot(pivot) equals direct long aggregation") {
    val viaWide = Aggregates.qAggUnpivot.fn(spark, sfDir)
      .withColumn("yr", expr("CAST(substring(yr_col, 2) AS INT)"))
      .select("n_name", "yr", "rev")
    val direct = {
      import graft.sources.Tables
      Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
        .agg(Det.dsum(col("o_totalprice")).as("rev"))
        .where(col("yr").between(1995, 2001))
    }
    assert(viaWide.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaWide).count() == 0)
  }

  test("decimal-sum corr/cov match native corr/covar_samp to 1e-6") {
    import graft.sources.Tables
    val ours = Aggregates.qAggCorr.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("v"))
      .collect().foreach { r =>
        val (c, v) = ours(r.getString(0))
        assert(math.abs(c - r.getDouble(1)) < 1e-6,
          s"corr ${r.getString(0)}: $c vs native ${r.getDouble(1)}")
        // our value is round(_, 6): allow its 5e-7 quantization on top of
        // float-accumulation drift
        assert(math.abs(v - r.getDouble(2)) <
            5e-7 + 1e-9 * math.abs(r.getDouble(2)),
          s"cov ${r.getString(0)}: $v vs native ${r.getDouble(2)}")
      }
  }

  test("approx_count_distinct within 5% of exact") {
    // r19: the query now carries its own bound certificate (the oracled
    // approx_within_5pct column) — this spec pins the exact leg against
    // the independent q_agg_distinct AND that every certificate is 1.
    val exact = Aggregates.qAggDistinct.fn(spark, sfDir)
      .select("o_orderstatus", "n_cust").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Aggregates.qAggApproxDistinct.fn(spark, sfDir)
      .select("o_orderstatus", "n_cust_exact", "approx_within_5pct")
      .collect()
      .foreach { r =>
        assert(r.getLong(1) == exact(r.getString(0)),
          s"${r.getString(0)}: exact leg ${r.getLong(1)} diverged from " +
            s"q_agg_distinct's ${exact(r.getString(0))}")
        assert(r.getInt(2) == 1,
          s"${r.getString(0)}: HLL++ estimate outside its ±5% bound")
      }
  }

  test("asof join: matched signup is never after the purchase") {
    Relational.qJoinAsof.fn(spark, sfDir)
      .where(col("signup_ts").isNotNull)
      .collect()
      .foreach { r =>
        assert(!r.getTimestamp(3).after(r.getTimestamp(2)),
          s"signup after purchase: $r")
      }
  }

  test("asof join: matches a correlated-subquery formulation") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("ev_asof_check")
    val expected = spark.sql(
      """SELECT p.event_id, p.user_id, p.ts,
                (SELECT max(s.ts) FROM ev_asof_check s
                 WHERE s.event_type = 'signup' AND s.user_id = p.user_id
                   AND s.ts <= p.ts) AS signup_ts
         FROM ev_asof_check p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""")
    val actual = Relational.qJoinAsof.fn(spark, sfDir)
    // exceptAll over (union-based asof) ∪ (correlated subquery) trips a
    // Catalyst constraint-rewrite bug ("key not found: ts#...") — compare
    // collected row multisets instead.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rows(actual) == rows(expected))
  }

  test("jaccard pairs are reflexive-safe and within [0,1]") {
    Llm.qDedupJaccardPairs.fn(spark, sfDir).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val jac = r.getDouble(5)
      assert(a < b)
      assert(jac >= 0.5 && jac <= 1.0)
    }
  }

  test("tf-idf top term matches hand-computed golden values") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("tfidf_golden")
    Seq(
      (1L, "apple banana apple", "en", "src0", 18L),
      (2L, "banana cherry cherry cherry", "en", "src0", 27L),
      (3L, "apple date", "en", "src0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Llm.qTextTfidfTop.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // N=3; idf = ln((N+1)/(df+1)): df2 -> ln(4/3), df1 -> ln(2)
    val ln43 = math.log(4.0 / 3.0)
    val ln2 = math.log(2.0)
    assert(out(1L)._1 == "apple")
    assert(math.abs(out(1L)._2 - BigDecimal(2 * ln43)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2L)._1 == "cherry")
    assert(math.abs(out(2L)._2 - BigDecimal(3 * ln2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(3L)._1 == "date")
  }

  test("percentile_approx lands inside a loose exact-rank window") {
    import graft.sources.Tables
    // rank tolerance far looser than the n/10000 guarantee: the approx
    // quantile must land between the exact 0.45/0.55 (resp. 0.90/0.97)
    // quantiles of the same group
    val windows = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.45)").as("lo50"),
        expr("percentile(l_extendedprice, 0.55)").as("hi50"),
        expr("percentile(l_extendedprice, 0.90)").as("lo95"),
        expr("percentile(l_extendedprice, 0.97)").as("hi95"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // the estimator's raw values on their own aggregation (the r20
    // certified query emits exact legs + certificates instead)
    val got = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("pa50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
          .as("pa95"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (lo50, hi50, lo95, hi95) = windows(r.getString(0))
      val (p50, p95) = (r.getDouble(1), r.getDouble(2))
      assert(p50 >= lo50 && p50 <= hi50,
        s"${r.getString(0)}: p50_approx $p50 outside [$lo50, $hi50]")
      assert(p95 >= lo95 && p95 <= hi95,
        s"${r.getString(0)}: p95_approx $p95 outside [$lo95, $hi95]")
    }
    // and the certified query's own certificates must read 1 (the same
    // contract the driver's DuckDB oracle asserts at sf0.01)
    Aggregates.qAggPercentileApprox.fn(spark, sfDir).collect().foreach { r =>
      assert(r.getInt(r.fieldIndex("p50_in_rank_bound")) == 1)
      assert(r.getInt(r.fieldIndex("p95_in_rank_bound")) == 1)
    }
  }

  test("percentiles are ordered p25 <= p50 <= p75 <= p95") {
    Aggregates.qAggPercentile.fn(spark, sfDir).collect().foreach { r =>
      val ps = (1 to 4).map(r.getDouble)
      assert(ps == ps.sorted, s"unordered percentiles: $r")
    }
  }
}
