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

  test("ANOVA: SSB + SSW = SST and F reassembles from the parts") {
    val r = SparkEntry.queries("q_agg_anova")(spark, sfDir).collect()
    assert(r.length == 1)
    val (k, n) = (r(0).getLong(0), r(0).getLong(1))
    val (ssb, ssw) = (r(0).getDouble(2), r(0).getDouble(3))
    assert(k >= 2 && n > k)
    assert(ssb >= 0.0 && ssw >= 0.0)
    if (!r(0).isNullAt(4)) {
      val f = r(0).getDouble(4)
      assert(f == (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble),
        "F must be the exact shared-formula reassembly")
      assert(f > 0.0)
    }
  }

  test("Spearman and Kendall lie in [-1,1] and agree in sign") {
    val sp = SparkEntry.queries("q_agg_spearman")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val kd = SparkEntry.queries("q_agg_kendall")(spark, sfDir).collect()
      .map(r => (r.getString(0),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(sp.nonEmpty && kd.keySet == sp.keySet)
    sp.foreach { case (f, rho) =>
      assert(rho >= -1.0 && rho <= 1.0, s"$f: rho=$rho")
      val (conc, disc, tau) = kd(f)
      assert(tau >= -1.0 && tau <= 1.0, s"$f: tau=$tau")
      assert(math.signum(tau) == math.signum((conc - disc).toDouble),
        "tau sign must follow the concordance balance")
      // both measure monotone association of the same pair — same sign
      if (math.abs(rho) > 1e-3 && math.abs(tau) > 1e-3)
        assert(math.signum(rho) == math.signum(tau))
    }
  }

  test("AUC equals the trapezoid over the ROC curve and curve is monotone") {
    val rows = SparkEntry.queries("q_eval_auc")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val auc = rows.head.getDouble(8)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(rows.forall(_.getDouble(8) == auc), "auc is a single global value")
    // rows ordered by ascending threshold → tpr/fpr non-increasing
    val curve = rows.map(r => (r.getDouble(6), r.getDouble(5))) // (fpr,tpr)
    curve.sliding(2).foreach { case Array((f1, t1), (f2, t2)) =>
      assert(f2 <= f1 && t2 <= t1, "ROC must be monotone in threshold")
    case _ => ()
    }
    // rank-identity AUC == trapezoid over ((0,0) .. curve .. (1,1))
    val pts =
      ((0.0, 0.0) +: curve.sortBy(_._1) :+ (1.0, 1.0)).distinct.toList
    val trap = pts.sliding(2).collect {
      case List((f1, t1), (f2, t2)) => (f2 - f1) * (t1 + t2) / 2.0
    }.sum
    assert(math.abs(trap - auc) < 1e-12,
      s"rank AUC $auc != trapezoid $trap")
  }

  test("stump: one winner, NULL impurity only on empty splits") {
    val rows = SparkEntry.queries("q_ml_stump")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getBoolean(6)) == 1, "exactly one elected stump")
    var prevNle = 0L
    rows.foreach { r =>
      val (nle, ngt) = (r.getLong(1), r.getLong(3))
      assert(nle > prevNle, "cumulative counts strictly increase")
      prevNle = nle
      if (r.isNullAt(5)) assert(nle == 0 || ngt == 0)
      else {
        val w = r.getDouble(5)
        assert(w >= 0.0 && w <= 0.5 + 1e-12, s"Gini impurity range: $w")
        assert(!r.getBoolean(6) ||
          rows.filter(!_.isNullAt(5)).map(_.getDouble(5)).min == w)
      }
    }
  }

  test("multi-OLS R2 in [0,1] and betas finite") {
    val r = SparkEntry.queries("q_agg_ols_multi")(spark, sfDir).collect()
    assert(r.length == 1)
    assert(!r(0).isNullAt(1) && !r(0).isNullAt(2) && !r(0).isNullAt(3))
    Seq(1, 2, 3).foreach(i =>
      assert(!r(0).getDouble(i).isNaN && !r(0).getDouble(i).isInfinite))
    val r2 = r(0).getDouble(4)
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
    // the real pin: the Cramer solution satisfies the normal equations
    // X'X b = X'y (moments recomputed independently here)
    val m = spark.sql(
      s"""SELECT CAST(count(*) AS DOUBLE) n,
            CAST(sum(x1) AS DOUBLE) s1, CAST(sum(x2) AS DOUBLE) s2,
            CAST(sum(y) AS DOUBLE) sy, CAST(sum(x1*x1) AS DOUBLE) s11,
            CAST(sum(x2*x2) AS DOUBLE) s22, CAST(sum(x1*x2) AS DOUBLE) s12,
            CAST(sum(x1*y) AS DOUBLE) s1y, CAST(sum(x2*y) AS DOUBLE) s2y
          FROM (SELECT CAST(l_quantity AS BIGINT) x1,
                  CAST(round(l_discount*100) AS BIGINT) x2,
                  CAST(round(l_extendedprice*100) AS BIGINT) y
                FROM parquet.`$sfDir/lineitem.parquet`)""").collect()(0)
    val (b0, b1, b2) =
      (r(0).getDouble(1), r(0).getDouble(2), r(0).getDouble(3))
    def rel(a: Double, b: Double) =
      math.abs(a - b) / math.max(1.0, math.max(math.abs(a), math.abs(b)))
    assert(rel(m.getDouble(0) * b0 + m.getDouble(1) * b1
      + m.getDouble(2) * b2, m.getDouble(3)) < 1e-9)
    assert(rel(m.getDouble(1) * b0 + m.getDouble(4) * b1
      + m.getDouble(6) * b2, m.getDouble(7)) < 1e-9)
    assert(rel(m.getDouble(2) * b0 + m.getDouble(6) * b1
      + m.getDouble(5) * b2, m.getDouble(8)) < 1e-9)
  }

  test("item cosine: normalized, bounded by overlap, totally ordered") {
    val rows = SparkEntry.queries("q_rec_item_cosine")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val (co, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val cos = r.getDouble(5)
      assert(co >= 1 && co <= math.min(na, nb), "overlap bound")
      assert(cos > 0.0 && cos <= 1.0 + 1e-12)
      assert(cos <= prev, "descending cosine order")
      prev = cos
    }
  }

  test("LCSS replays against a reference DP and is bounded") {
    val out = SparkEntry.queries("q_time_lcss")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // rebuild the per-flag PAA series exactly as the query does
    val daily = spark.sql(
      s"""SELECT l_returnflag f, CAST(l_shipdate AS DATE) d,
            CAST(SUM(CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) v
          FROM parquet.`$sfDir/lineitem.parquet` GROUP BY 1, 2""")
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val series = daily.groupBy(_._1).map { case (f, rows) =>
      val vs = rows.sortBy(_._2.toString).map(_._3)
      val n = vs.length
      val segs = new Array[Long](math.min(64, n))
      vs.zipWithIndex.foreach { case (v, i) => segs((i * 64) / n) += v }
      f -> segs
    }
    def m(x: Long, y: Long): Long =
      if (10 * math.abs(x - y) <= math.max(math.abs(x), math.abs(y))) 1L
      else 0L
    def lcss(xs: Array[Long], ys: Array[Long]): Long = {
      var old = new Array[Long](xs.length)
      var run = 0L
      for (i <- xs.indices) {
        run = math.max(run, m(xs(i), ys(0))); old(i) = run
      }
      for (j <- 1 until ys.length) {
        val nw = new Array[Long](xs.length)
        for (i <- xs.indices) {
          val diag = if (i == 0) 0L else old(i - 1)
          val left = if (i == 0) 0L else nw(i - 1)
          nw(i) = math.max(old(i), math.max(left, diag + m(xs(i), ys(j))))
        }
        old = nw
      }
      old.last
    }
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val got = r.getLong(4)
      val want = lcss(series(a), series(b))
      assert(got == want, s"pair ($a,$b): engine $got != replay $want")
      val sim = r.getDouble(5)
      assert(sim >= 0.0 && sim <= 1.0)
      assert(got <= math.min(series(a).length, series(b).length))
    }
  }

  test("PPJoin returns exactly the brute-force Jaccard pairs") {
    val pp = SparkEntry.queries("q_dedup_ppjoin")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = SparkEntry.queries("q_dedup_jaccard_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pp.nonEmpty, "corpus must contain near-dup pairs")
    assert(pp.toSet == brute.toSet,
      "prefix filtering must lose (and invent) nothing vs brute force")
  }

  test("Bloom census: no false negatives, counts cover every name") {
    val rows = SparkEntry.queries("q_sketch_bloom_portable")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (member, hit) = (r.getBoolean(0), r.getBoolean(1))
      assert(!(member && !hit),
        "a Bloom filter can NEVER miss a member (false negative)")
    }
    val total = rows.map(_.getLong(2)).sum
    val names = spark.sql(
      s"""SELECT count(DISTINCT c_name) c
          FROM parquet.`$sfDir/customer.parquet`""").collect()(0).getLong(0)
    assert(total == names, "census must cover every distinct name once")
  }

  test("calibration: gaps reassemble, ECE is their weighted mean") {
    val rows = SparkEntry.queries("q_eval_calibration")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ece = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == ece), "one global ECE")
    assert(ece >= 0.0 && ece <= 1.0)
    var wsum = BigDecimal(0); var nUsed = 0L
    rows.foreach { r =>
      if (!r.isNullAt(5)) {
        val gap = r.getDouble(5)
        assert(gap >= 0.0 && gap <= 1.0)
        assert(gap == math.abs(r.getDouble(2) - r.getDouble(4)))
        // replay the query's exact arithmetic: IEEE product, then Dec12
        wsum += BigDecimal(r.getLong(3).toDouble * gap)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        nUsed += r.getLong(3)
      }
    }
    val want = wsum.toDouble / nUsed.toDouble
    assert(want == ece, s"ECE replay $want vs $ece")
  }

  test("assortativity is a correlation in [-1,1] over real edges") {
    val r = SparkEntry.queries("q_graph_assortativity")(spark, sfDir)
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) > 0)
    assert(r(0).getDouble(1) >= 1.0 && r(0).getDouble(2) >= 1.0,
      "mean degree of a non-empty graph is at least 1")
    if (!r(0).isNullAt(3)) {
      val a = r(0).getDouble(3)
      assert(a >= -1.0 && a <= 1.0, s"assortativity $a")
    }
  }

  test("forecast eval: MASE reassembles from the two MAEs") {
    val rows = SparkEntry.queries("q_time_forecast_eval")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, maeN, maeS) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 0 && maeN >= 0.0 && maeS >= 0.0)
      if (!r.isNullAt(4))
        assert(math.abs(r.getDouble(4) - maeS / maeN) < 1e-12,
          "MASE must be the exact MAE ratio")
    }
  }

  test("feature MI: nonnegative, bounded by marginal entropies, sorted") {
    val rows = SparkEntry.queries("q_feature_select_mi")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "five features scored")
    var prev = Double.MaxValue
    rows.foreach { r =>
      val (mi, hx, hy) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mi >= -1e-9, s"MI must be nonnegative: $mi")
      assert(mi <= math.min(hx, hy) + 1e-9, "MI <= min(H(X), H(Y))")
      assert(mi <= prev, "output must be the selection order")
      prev = mi
      if (!r.isNullAt(5)) {
        val nmi = r.getDouble(5)
        assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9)
      }
    }
  }

  test("stemmer is idempotent on its own output") {
    val rows = SparkEntry.queries("q_text_stem")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val lits = rows.map(r => s"'${r.getString(0)}'").mkString(",")
    val stems = spark.sql(s"SELECT explode(array($lits)) AS tok")
    val restem = stems.selectExpr(
      """CASE
           WHEN length(tok) > 4 AND right(tok, 3) = 'ies'
                AND right(tok, 4) NOT IN ('aies', 'eies')
             THEN concat(substr(tok, 1, length(tok) - 3), 'y')
           WHEN length(tok) > 3 AND right(tok, 2) = 'es'
                AND right(tok, 3) NOT IN ('aes', 'ees', 'oes')
             THEN substr(tok, 1, length(tok) - 1)
           WHEN length(tok) > 2 AND right(tok, 1) = 's'
                AND right(tok, 2) NOT IN ('us', 'ss')
             THEN substr(tok, 1, length(tok) - 1)
           ELSE tok END AS s2""").collect().map(_.getString(0))
    assert(restem.toSeq == rows.map(_.getString(0)).toSeq,
      "stem(stem(x)) must equal stem(x)")
    rows.foreach(r => assert(r.getLong(2) >= 1, "n_forms >= 1"))
  }

  test("Levene W reassembles and is nonnegative") {
    val r = SparkEntry.queries("q_agg_levene")(spark, sfDir).collect()
    assert(r.length == 1)
    val (k, n) = (r(0).getLong(0), r(0).getLong(1))
    val (ssb, ssw) = (r(0).getDouble(2), r(0).getDouble(3))
    assert(k >= 2 && n > k)
    assert(ssb >= -1e-6 && ssw >= 0.0)
    if (!r(0).isNullAt(4))
      assert(r(0).getDouble(4) ==
        (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble))
  }

  test("Hodges-Lehmann sits inside the value range, T = n(n+1)/2") {
    val rows = SparkEntry.queries("q_agg_hodges_lehmann")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t, wmed, hl) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(t == n * (n + 1) / 2, "Walsh pair count identity")
      assert(hl == wmed / 2.0)
      assert(hl >= 1.0 && hl <= 50.0, "pseudo-median inside value domain")
    }
  }

  test("PR curve: recall hits 1 at the lowest threshold, AP replays") {
    val rows = SparkEntry.queries("q_eval_pr_curve")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    val ap = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == ap), "one global AP")
    assert(ap >= 0.0 && ap <= 1.0)
    assert(rows.head.getDouble(4) == 1.0,
      "lowest threshold predicts everything positive -> recall 1")
    // replay AP from tp deltas: pos_v = tp_v - tp_(next higher thr)
    val p = rows.head.getLong(1) // tp at lowest thr = P
    var apSum = BigDecimal(0)
    rows.indices.foreach { i =>
      val tp = rows(i).getLong(1)
      val tpNext = if (i + 1 < rows.length) rows(i + 1).getLong(1) else 0L
      val pos = tp - tpNext
      assert(pos >= 0, "tp non-increasing in threshold")
      if (!rows(i).isNullAt(3)) {
        val term = (pos.toDouble / p.toDouble) * rows(i).getDouble(3)
        apSum += BigDecimal(term)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    assert(apSum.toDouble == ap, s"AP replay ${apSum.toDouble} vs $ap")
  }

  test("modularity: contributions sum to Q, Q in [-0.5, 1]") {
    val rows = SparkEntry.queries("q_graph_modularity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val q = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == q), "one global Q")
    assert(q >= -0.5 && q <= 1.0, s"modularity range: $q")
    var sum = BigDecimal(0)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= r.getLong(1),
        "intra-community weight cannot exceed community strength")
      sum += BigDecimal(r.getDouble(3))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    assert(sum.toDouble == q, "contributions must reassemble Q exactly")
  }

  test("delta method: CI brackets the ratio symmetrically") {
    val rows = SparkEntry.queries("q_agg_delta_method")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ratio, se) = (r.getDouble(2), r.getDouble(3))
      assert(ratio > 0.0 && se >= 0.0)
      assert(r.getDouble(4) == ratio - 1.96 * se)
      assert(r.getDouble(5) == ratio + 1.96 * se)
      // revenue cents per unit must be in a sane physical band
      assert(ratio > 100.0, "cents per unit > $1")
    }
  }

  test("freshness: watermark stream has zero lag, lags nonnegative") {
    val rows = SparkEntry.queries("q_dq_freshness")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(4) == 0L),
      "some stream defines the watermark")
    rows.foreach { r =>
      val (lagUs, lagDays) = (r.getLong(4), r.getLong(5))
      assert(lagUs >= 0L)
      assert(lagDays == lagUs / 86400000000L)
      assert(r.getBoolean(6) == (lagDays > 7))
    }
  }

  test("ulcer index: zero iff at peak all frame, bounded by max drawdown") {
    val rows = SparkEntry.queries("q_win_ulcer")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, peak, ulcer) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(peak >= v, "peak is a running max")
      assert(ulcer >= 0.0 && ulcer <= 1.0, s"ulcer in [0,1]: $ulcer")
    }
  }

  test("Cohen's d: antisymmetric sign, band matches magnitude") {
    val rows = SparkEntry.queries("q_agg_cohens_d")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ma, mb, sp) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(sp > 0.0)
      val d = r.getDouble(7)
      assert(d == (ma - mb) / sp)
      val want =
        if (math.abs(d) >= 0.8) "large"
        else if (math.abs(d) >= 0.5) "medium"
        else if (math.abs(d) >= 0.2) "small"
        else "negligible"
      assert(r.getString(8) == want)
    }
  }

  test("histogram quantiles are within one bucket width of exact") {
    val rows = SparkEntry.queries("q_sketch_hist_quantiles")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    val exactVs = spark.sql(
      s"""SELECT CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)
            + CAST(0.5 AS DOUBLE)) AS BIGINT) v
          FROM parquet.`$sfDir/orders.parquet`""")
      .collect().map(_.getLong(0)).sorted
    rows.foreach { r =>
      val (p, n, lo, hi) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == exactVs.length)
      val width = math.max(hi - lo + 1, 1).toDouble / 256.0
      val target = ((p.toLong * n + 99) / 100).toInt
      val exact = exactVs(target - 1).toDouble
      val est = r.getDouble(8)
      assert(math.abs(est - exact) <= width + 1e-6,
        s"p$p: est $est vs exact $exact exceeds bucket width $width")
    }
  }

  test("binseg: gain nonnegative, split means differ, replay on one flag") {
    val rows = SparkEntry.queries("q_time_changepoint_binseg")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(3))
      assert(k >= 1 && k < n)
      assert(r.getDouble(8) >= -1e-6, "gain = sse0 - sse_split >= 0")
      assert(r.getDouble(7) <= r.getDouble(6) + 1e-6,
        "split SSE cannot exceed the unsplit SSE")
    }
  }

  test("variance merge: region variance is nonneg, shards cover nations") {
    val rows = SparkEntry.queries("q_agg_var_merge")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "five regions")
    assert(rows.map(_.getLong(1)).sum == 25, "25 nation shards total")
    rows.foreach { r =>
      assert(r.getLong(2) > 0)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
    }
  }

  test("CVaR dominates VaR and the tail is ~5% of rows") {
    val rows = SparkEntry.queries("q_agg_cvar")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v95, nTail, cvar) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(cvar >= v95, "expected shortfall >= VaR by definition")
      val frac = nTail.toDouble / n
      assert(frac > 0.0 && frac <= 0.15, s"tail fraction sane: $frac")
    }
  }

  test("markov eval: accuracy in [0,1], overall reassembles") {
    val rows = SparkEntry.queries("q_seq_markov_eval")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val overall = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == overall))
    var nt = 0L; var nc = 0L
    rows.foreach { r =>
      val (test, correct) = (r.getLong(2), r.getLong(3))
      assert(correct <= test)
      assert(r.getDouble(4) == correct.toDouble / test)
      nt += test; nc += correct
    }
    assert(overall == nc.toDouble / nt, "overall = pooled accuracy")
  }

  test("label outliers: descending distance, valid labels") {
    val rows = SparkEntry.queries("q_embed_label_outliers")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val d = r.getDouble(2)
      assert(d >= 0.0 && d <= prev)
      prev = d
    }
  }

  test("Gumbel: return level exceeds the mean max, beta positive") {
    val rows = SparkEntry.queries("q_agg_gumbel_fit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, mean) = (r.getLong(1), r.getDouble(2))
      assert(nb >= 2)
      val (beta, mu, rl) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(beta > 0.0)
      assert(mu < mean, "Gumbel location sits below the mean")
      assert(rl > mean,
        "the 1-in-12 return level must exceed the average block max")
    }
  }

  test("WoE/IV: IV nonnegative and reassembles from rounded WoE") {
    val rows = SparkEntry.queries("q_feature_woe_iv")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val iv = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == iv))
    assert(iv >= 0.0 || {
      // rounding WoE to 6 decimals can push a tiny IV slightly negative
      math.abs(iv) < 1e-4
    })
    val p = rows.map(_.getLong(1)).sum.toDouble
    val n = rows.map(_.getLong(2)).sum.toDouble
    var acc = BigDecimal(0)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val term = (r.getLong(1) / p - r.getLong(2) / n) * r.getDouble(3)
        acc += BigDecimal(term)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    assert(acc.toDouble == iv, s"IV replay ${acc.toDouble} vs $iv")
  }

  test("partition advisor: verdicts follow the published thresholds") {
    val rows = SparkEntry
      .queries("q_layout_partition_advisor")(spark, sfDir).collect()
    assert(rows.length == 5)
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(4), r.getString(5))).toMap
    assert(byName("returnflag")._3 == "too_few_partitions")
    assert(byName("linestatus")._3 == "too_few_partitions")
    byName.foreach { case (_, (nd, share, verdict)) =>
      val want =
        if (nd < 4) "too_few_partitions"
        else if (nd > 10000) "too_many_partitions"
        else if (share > 0.2) "skewed"
        else "good"
      assert(verdict == want)
    }
  }

  test("SPRT: decision consistent with crossing days") {
    val rows = SparkEntry.queries("q_ab_sequential_sprt")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dec = r.getString(3)
      val (up, down) = (r.get(4), r.get(5))
      dec match {
        case "accept_h1" => assert(up != null)
        case "accept_h0" => assert(down != null &&
          (up == null ||
            r.getTimestamp(5).compareTo(r.getTimestamp(4)) < 0))
        case "continue" => assert(up == null && down == null)
      }
    }
  }

  test("capture-recapture: overlap bounds hold and estimate is sane") {
    val r = SparkEntry.queries("q_agg_capture_recapture")(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val (n1, n2, m, actual) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(m <= math.min(n1, n2), "overlap bounded by both samples")
    assert(actual == n1 + n2 - m,
      "token universe is the union of the two samples")
    val est = r(0).getDouble(4)
    assert(est >= math.max(n1, n2) - 1, "estimate at least each sample")
    // the halves are large random samples of a finite vocab -> the
    // estimate should land within 20% of truth
    assert(math.abs(r(0).getDouble(5)) < 0.2,
      s"relative error ${r(0).getDouble(5)}")
  }

  test("McNemar census partitions n; statistic reassembles") {
    val r = SparkEntry.queries("q_eval_mcnemar")(spark, sfDir).collect()
    assert(r.length == 1)
    val (n, br, oa, ob, bw) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(br + oa + ob + bw == n, "census must partition the corpus")
    if (!r(0).isNullAt(5)) {
      val chi = r(0).getDouble(5)
      val want = (math.abs((oa - ob).toDouble) - 1.0) *
        (math.abs((oa - ob).toDouble) - 1.0) / (oa + ob).toDouble
      assert(chi == want)
    }
  }

  test("balanced sampling: every class kept at exactly the minority count") {
    val rows = SparkEntry.queries("q_sample_balanced")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val kept = rows.map(_.getLong(2)).distinct
    assert(kept.length == 1, "all classes keep the same count")
    rows.foreach { r =>
      assert(r.getBoolean(4), "is_balanced must hold for every class")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) <= 1.0)
    }
    assert(kept.head == rows.map(_.getLong(1)).min,
      "kept count is the minority class size")
  }

  test("FK inference: real keys score 1.0, the control does not") {
    val rows = SparkEntry.queries("q_dq_fk_inference")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val by = rows.map(r => r.getString(0) ->
      (r.getDouble(3), r.getString(4))).toMap
    Seq("lineitem.orderkey->orders.orderkey",
      "lineitem.partkey->part.partkey",
      "orders.custkey->customer.custkey",
      "lineitem.suppkey->supplier.suppkey").foreach { k =>
      assert(by(k)._1 == 1.0, s"$k must be fully contained")
      assert(by(k)._2 == "foreign_key")
    }
    val (neg, negV) = by("lineitem.partkey->supplier.suppkey")
    assert(neg < 0.95, s"negative control containment $neg")
    assert(negV == "unrelated")
  }

  test("Cronbach alpha bounded above by 1, variances positive") {
    val r = SparkEntry.queries("q_agg_cronbach")(spark, sfDir).collect()
    assert(r.length == 1)
    val (siv, vt) = (r(0).getDouble(1), r(0).getDouble(2))
    assert(siv > 0.0 && vt > 0.0)
    if (!r(0).isNullAt(3)) {
      val a = r(0).getDouble(3)
      assert(a <= 1.0 + 1e-12, s"alpha cannot exceed 1: $a")
      assert(a == (5.0 / 4.0) * (1.0 - siv / vt))
    }
  }

  test("entropy rate: 0 <= H_rate <= H_0 (conditioning reduces entropy)") {
    val r = SparkEntry.queries("q_seq_entropy_rate")(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val (hr, h0, gap) =
      (r(0).getDouble(1), r(0).getDouble(2), r(0).getDouble(3))
    assert(hr >= -1e-9, "entropy nonnegative")
    assert(h0 >= hr - 1e-9,
      "zeroth-order entropy upper-bounds the rate (Jensen)")
    assert(math.abs(gap - (h0 - hr)) < 1e-12)
    // 5 event types -> both bounded by log2(5)
    assert(h0 <= math.log(5.0) / math.log(2.0) + 1e-9)
  }

  test("dispersion: VMR and chi2 quantity reassemble per priority") {
    val rows = SparkEntry.queries("q_agg_dispersion")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean, v) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n > 1 && mean > 0.0 && v >= 0.0)
      assert(r.getDouble(4) == v / mean)
      assert(r.getDouble(5) == (n - 1).toDouble * v / mean)
    }
  }

  test("odds ratio: CI brackets OR, census partitions n") {
    val r = SparkEntry.queries("q_agg_odds_ratio")(spark, sfDir).collect()
    assert(r.length == 1)
    val (a, b, c, d) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3))
    assert(a + b + c + d > 0)
    if (!r(0).isNullAt(4)) {
      val (or, lo, hi) =
        (r(0).getDouble(4), r(0).getDouble(5), r(0).getDouble(6))
      assert(or > 0.0)
      assert(lo <= or && or <= hi, "CI must bracket the point estimate")
    }
  }

  test("lexical diversity: TTR in (0,1], Herdan C in (0,1]") {
    val rows = SparkEntry.queries("q_text_lexical_diversity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, ty) = (r.getLong(1), r.getLong(2))
      assert(ty <= nt, "types cannot exceed tokens")
      val ttr = r.getDouble(3)
      assert(ttr > 0.0 && ttr <= 1.0)
      if (!r.isNullAt(4)) {
        val hc = r.getDouble(4)
        assert(hc > 0.0 && hc <= 1.0 + 1e-9,
          "ln(types)/ln(tokens) <= 1 since types <= tokens")
      }
    }
  }

  test("trimmed mean sits inside the raw data and trims ~10%") {
    val rows = SparkEntry.queries("q_agg_trimmed_mean")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, trimmed) = (r.getLong(1), r.getLong(2))
      val frac = trimmed.toDouble / n
      assert(frac >= 0.0 && frac <= 0.15, s"trim fraction $frac")
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("OBV is the exact running sum of signed flows") {
    val rows = SparkEntry.queries("q_win_obv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var acc = 0L
      rs.foreach { r =>
        val (vol, flow, obv) = (r.getLong(3), r.getLong(4), r.getLong(5))
        assert(math.abs(flow) == vol || flow == 0L)
        acc += flow
        assert(obv == acc, "OBV must replay as the prefix sum")
      }
    }
  }
}
