package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the round-15 operators and the round-15 fixes —
  * invariants the DuckDB hash parity can't see (parity proves engine
  * agreement; these prove the agreed answer has the advertised
  * mathematical shape). The delta-method pin exists because r14
  * shipped a √n-inflated SE that parity could NOT catch (both engines
  * shared the wrong text): the replay here goes through a genuinely
  * different formula path.
  */
class R15Spec extends AnyFunSuite with SparkFixture {

  test("delta method: SE matches the independent residual replay") {
    // SE² must equal Σ(x − R·y)² / ((n−1)·n·ȳ²). The residual
    // spelling is algebraically identical to the centered-moment text
    // (Σx − R·Σy ≡ 0 at R = Σx/Σy) but is computed through raw
    // per-row residuals in a SECOND pass — an independent path that
    // would have caught the r14 √n inflation (it was ~√n ≈ 136×
    // too wide at sf0.01 n≈20k).
    val base = sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long")
          .cast("double").as("x"),
        col("l_quantity").cast("long").cast("double").as("y"))
    val got = SparkEntry.queries("q_agg_delta_method")(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val flag = r.getString(0)
      val n = r.getLong(1)
      val (ratio, se) = (r.getDouble(2), r.getDouble(3))
      val m = base.where(col("flag") === flag)
        .agg(sum("x").as("sx"), sum("y").as("sy")).head()
      val bigR = m.getDouble(0) / m.getDouble(1)
      assert(math.abs(bigR - ratio) <= 1e-9 * math.abs(ratio))
      val ybar = m.getDouble(1) / n.toDouble
      val ss = base.where(col("flag") === flag)
        .agg(sum(pow(col("x") - lit(bigR) * col("y"), 2.0))).head()
        .getDouble(0)
      val seCheck =
        math.sqrt(ss / ((n - 1).toDouble * n.toDouble * ybar * ybar))
      assert(math.abs(se - seCheck) <= 1e-6 * seCheck,
        s"flag=$flag se=$se replay=$seCheck — the SE must be the " +
          s"sample-form delta method, not the r14 √n-inflated one")
    }
  }

  test("brier: Murphy identity BS = REL - RES + UNC") {
    val r = SparkEntry.queries("q_eval_brier")(spark, sfDir).head()
    val (bs, rel, res, unc) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    assert(math.abs(bs - (rel - res + unc)) <= 1e-9,
      s"decomposition must reassemble: $bs vs ${rel - res + unc}")
    assert(bs >= 0.0 && bs <= 1.0 && rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25, "binary uncertainty caps at 1/4")
  }

  test("kappa: bounded by [-1,1], zero when po equals pe") {
    val r = SparkEntry.queries("q_eval_kappa")(spark, sfDir).head()
    val (n, po, pe) = (r.getLong(0), r.getDouble(5), r.getDouble(6))
    assert(n == r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4))
    assert(po >= 0.0 && po <= 1.0 && pe > 0.0 && pe < 1.0)
    val k = r.getDouble(7)
    assert(k >= -1.0 && k <= 1.0)
    assert(math.abs(k - (po - pe) / (1.0 - pe)) <= 1e-12)
  }

  test("jarque-bera: JB reassembles from skew and kurtosis, nonneg") {
    val rows = SparkEntry.queries("q_agg_jarque_bera")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, k, jb) = (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      assert(jb >= 0.0)
      assert(jb == n.toDouble / 6.0 * (s * s + k * k / 4.0))
      // l_quantity is uniform-ish on 1..50: platykurtic, near-symmetric
      assert(k < 0.0, s"uniform-like data must be platykurtic: $k")
      assert(math.abs(s) < 0.5, s"near-symmetric: $s")
    }
  }

  test("grubbs: G nonneg, max/min consistent, sd replays") {
    val rows = SparkEntry.queries("q_agg_grubbs")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xMin, xMax) = (r.getLong(2), r.getLong(3))
      val (mean, sd) = (r.getDouble(4), r.getDouble(5))
      assert(xMin <= xMax && mean >= xMin && mean <= xMax)
      val (gMax, gMin) = (r.getDouble(6), r.getDouble(7))
      assert(gMax >= 0.0 && gMin >= 0.0)
      assert(gMax == (xMax - mean) / sd && gMin == (mean - xMin) / sd)
    }
  }

  test("rate CI: clamped lower bound, bracket contains the rate") {
    val rows = SparkEntry.queries("q_agg_rate_ci")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t) = (r.getLong(1), r.getLong(2))
      val (rate, se) = (r.getDouble(3), r.getDouble(4))
      assert(rate == n.toDouble / t && se == math.sqrt(n.toDouble) / t)
      assert(r.getDouble(5) >= 0.0, "lower bound clamped at 0")
      assert(r.getDouble(5) <= rate && rate <= r.getDouble(6))
    }
  }

  test("hll intersect: union est bracketed, inclusion-exclusion sane") {
    val r = SparkEntry.queries("q_sketch_hll_intersect")(spark, sfDir)
      .head()
    val (ea, eb, eu, ei) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    // union of overlapping sets: max(|A|,|B|) <= |A∪B| <= |A|+|B| must
    // hold for the ESTIMATES too up to sketch error
    assert(eu >= math.max(ea, eb) * 0.8 && eu <= (ea + eb) * 1.2)
    assert(ei == BigDecimal(ea + eb - eu)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val ai = r.getLong(6)
    assert(math.abs(ei - ai) / ai <= 0.35,
      s"3-sketch inclusion-exclusion outside envelope: $ei vs $ai")
  }

  test("f1: per-class identities and micro = accuracy") {
    val rows = SparkEntry.queries("q_eval_f1")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var tpSum = 0L
    var nSum = 0L
    rows.foreach { r =>
      val (nTrue, nPred, tp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp <= nTrue && tp <= nPred)
      tpSum += tp; nSum += nTrue
      if (!r.isNullAt(6)) {
        val (p, rc, f1) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
        assert(f1 == 2.0 * p * rc / (p + rc))
        assert(f1 <= math.max(p, rc) && f1 >= math.min(p, rc) * 0.999)
      }
    }
    assert(rows.head.getDouble(8) == tpSum.toDouble / nSum,
      "micro-F1 of a single-label classifier IS accuracy")
  }

  test("jsd: bounded by [0, ln2] normalized to [0,1]") {
    val rows = SparkEntry.queries("q_text_jsd")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 0.6931471805599453)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("heaps: cumulative axes monotone, beta in the textbook band") {
    val rows = SparkEntry.queries("q_text_heaps_law")(spark, sfDir)
      .collect()
    assert(rows.length > 16)
    val ns = rows.map(_.getLong(2))
    val vs = rows.map(_.getLong(3))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    val beta = rows.head.getDouble(4)
    // shingle vocab genuinely grows: sublinear but far from saturated
    assert(beta > 0.3 && beta < 1.0, s"beta out of band: $beta")
    assert(rows.head.getDouble(5) > 0.0, "K positive")
  }

  test("qq: deciles monotone within each group, gap replays") {
    val rows = SparkEntry.queries("q_agg_qq")(spark, sfDir).collect()
    assert(rows.length == 9)
    val qr = rows.map(_.getDouble(2))
    val qn = rows.map(_.getDouble(3))
    assert(qr.zip(qr.tail).forall { case (a, b) => a <= b })
    assert(qn.zip(qn.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getDouble(4) ==
      r.getDouble(2) - r.getDouble(3)))
  }

  test("waterfall: allocation conserves the budget exactly") {
    val rows = SparkEntry.queries("q_alloc_waterfall")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (budget, nOrders) = (r.getLong(1), r.getLong(2))
      val (nFull, nPartial, nStarved) =
        (r.getLong(3), r.getLong(4), r.getLong(5))
      val alloc = r.getLong(6)
      assert(nFull + nPartial + nStarved == nOrders)
      assert(nPartial <= 1,
        "biggest-first waterfall splits at most ONE order per class")
      // demand exceeds the half-revenue budget by construction, so the
      // pot must be spent to the cent
      assert(alloc == budget, s"alloc $alloc != budget $budget")
    }
  }

  test("fifo: consumed == min(supply, demand) conservation per brand") {
    // replay demand per brand independently and check the clamp law
    import org.apache.spark.sql.functions._
    val li = sources.Tables.lineitem(spark, sfDir)
    val pt = sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("pk"), col("p_brand").as("brand"))
    val want = li
      .select(col("l_partkey").as("pk"),
        when(pmod(col("l_suppkey"), lit(2)) === 0,
          col("l_quantity").cast("long")).otherwise(0L).as("sup"),
        when(pmod(col("l_suppkey"), lit(2)) === 1,
          col("l_quantity").cast("long")).otherwise(0L).as("dem"))
      .groupBy("pk").agg(sum("sup").as("sup"), sum("dem").as("dem"))
      .join(pt, "pk")
      .groupBy("brand")
      .agg(sum(least(col("sup"), col("dem"))).as("want"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q_inventory_fifo")(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(4) == want(r.getString(0)),
        s"brand ${r.getString(0)}: consumed must equal " +
          s"min(supply, demand) summed over parts")
    }
  }

  test("maxsim: bounded by 8, dominates any single-probe best") {
    val rows = SparkEntry.queries("q_sim_maxsim")(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getDouble(2) <= 8.0 && r.getDouble(2) >= -8.0)
      assert(r.getLong(1) == 16L, "full 16-vector doc groups")
    }
  }

  test("haversine: all hubs populated, means within [0, max]") {
    val rows = SparkEntry.queries("q_geo_haversine")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "every hub attracts someone")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= r.getDouble(3))
      assert(r.getDouble(3) <= 20015.1,
        "no distance beyond half the great circle")
    }
  }

  test("ltv: cumulative revenue monotone per cohort") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      val cums = sorted.map(_.getLong(4))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      assert(sorted.map(_.getLong(3)).sum == cums.last)
    }
  }

  test("mcnemar: chi2 replays from the census with the clamp") {
    val r = SparkEntry.queries("q_eval_mcnemar")(spark, sfDir).head()
    val (b, c) = (r.getLong(2), r.getLong(3))
    if (b + c == 0) assert(r.isNullAt(5))
    else {
      val d = math.max(math.abs((b - c).toDouble) - 1.0, 0.0)
      assert(r.getDouble(5) == d * d / (b + c).toDouble,
        "chi2 must be the CLAMPED continuity-corrected statistic")
      // the clamp semantics the lineitem census may never exercise:
      // equal discordance must read zero evidence, not 1/(b+c)
      val deg = math.max(math.abs(0.0) - 1.0, 0.0)
      assert(deg * deg == 0.0)
    }
  }

  test("tukey: q replays from diff and se, pairs cover the groups") {
    val rows = SparkEntry.queries("q_agg_tukey_hsd")(spark, sfDir)
      .collect()
    assert(rows.length == 3, "3 flags -> 3 pairs")
    rows.foreach { r =>
      assert(r.getDouble(7) == math.abs(r.getDouble(4)) / r.getDouble(5))
      assert(r.getDouble(5) > 0.0 && r.getLong(6) > 0)
    }
  }

  test("wilson: interval inside [0,1] and contains p-hat") {
    val rows = SparkEntry.queries("q_agg_wilson_ci")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= 0.0 && hi <= 1.0,
        s"Wilson never leaves the unit interval: [$lo, $hi]")
      assert(lo <= p && p <= hi)
    }
  }

  test("granger: SSR ordering and F nonnegativity") {
    val r = SparkEntry.queries("q_time_granger")(spark, sfDir).head()
    val (ssrR, ssrU) = (r.getDouble(3), r.getDouble(4))
    assert(ssrU <= ssrR,
      "adding a regressor can never worsen the in-sample fit")
    assert(r.getDouble(5) >= 0.0)
    assert(r.getLong(0) > 100, "enough days to regress")
  }

  test("cdc chunks: censuses consistent, boundaries content-defined") {
    val r = SparkEntry.queries("q_dedup_cdc_chunks")(spark, sfDir).head()
    val (nChunks, nDistinct, nShared, sharedOcc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nDistinct <= nChunks && nShared <= nDistinct)
    assert(sharedOcc >= 2 * nShared,
      "a shared chunk occurs in at least two docs")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    // the content-defined property: chunking a doc with a PREFIX
    // insertion re-chunks only the prefix neighborhood — suffix chunk
    // hashes are preserved (fixed-width blocks lose ALL of them)
    import org.apache.spark.sql.functions._
    val s2 = spark
    import s2.implicits._
    def chunksOf(text: String): Seq[String] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val pos = df.select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(length(text) - 7, 1))"))
          .as("i"))
      val st = pos.where(col("i") === 1 ||
        pmod(expr("aggregate(transform(slice(split(text, ''), i, 8)," +
          " c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT)," +
          " (a, c) -> pmod(a * 131 + c, 2147483647))"),
          lit(64)) === 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("st")
      st.select(col("doc_id"), col("text"), col("i").as("st"))
        .withColumn("nxt", lead(col("st"), 1).over(w))
        .select(expr("substring(text, st," +
          " coalesce(nxt, length(text) + 1) - st)").as("c"))
        .collect().map(_.getString(0)).toSeq
    }
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val a = chunksOf(base)
    val b = chunksOf("INSERTED PREFIX CHANGES THE FRONT " + base)
    val preserved = a.toSet.intersect(b.toSet)
    assert(preserved.nonEmpty,
      "suffix chunks must survive a prefix edit (the CDC property)")
  }

  test("winnowing: coverage guarantee on an engineered shared substring") {
    // two docs sharing a >=11-char substring MUST share a fingerprint
    // (the winnowing theorem, w=4, k=8); disjoint docs share none
    val rows = SparkEntry.queries("q_text_winnowing")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getLong(2) >= 1))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("importance resample: weights invert shares, ESS bounded by N") {
    val rows = SparkEntry
      .queries("q_corpus_importance_resample")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    rows.foreach { r =>
      val (share, w) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(w * share * k - 1.0) <= 1e-3,
        "weight x share x K ~ 1 (uniform target)")
      val (nDocs, ess) = (r.getLong(5), r.getDouble(6))
      assert(ess > 0.0 && ess <= nDocs.toDouble + 1e-6,
        s"ESS caps at N: $ess vs $nDocs")
    }
    val shares = rows.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) <= 1e-4)
  }

  test("beta-binomial: posterior tighter than Wilson, interval in [0,1]") {
    val bb = SparkEntry.queries("q_agg_beta_binomial")(spark, sfDir)
      .collect()
    assert(bb.nonEmpty)
    bb.foreach { r =>
      val (n, kk) = (r.getLong(1), r.getLong(2))
      val (m, sd) = (r.getDouble(3), r.getDouble(4))
      assert(m == (1.0 + kk) / (2.0 + n))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(6) <= 1.0)
      assert(sd > 0.0 && sd < 0.5)
    }
  }

  test("turning points: T bounded by interior, z replays") {
    val rows = SparkEntry.queries("q_time_turning_points")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t) = (r.getLong(1), r.getLong(2))
      assert(t <= n - 2, "at most every interior point turns")
      val e = 2.0 * (n - 2) / 3.0
      assert(r.getDouble(3) == e)
      assert(r.getDouble(4) ==
        (t - e) / math.sqrt((16.0 * n - 29.0) / 90.0))
    }
  }

  test("kruskal-wallis: rank mass conserved, correction only inflates") {
    val rows = SparkEntry.queries("q_agg_kruskal_wallis")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "five priority groups")
    val n = rows.head.getLong(4)
    // Σ rank sums over the groups must equal N(N+1)/2 — the twice-rank
    // integer carrier conserves total rank mass exactly
    val mass = rows.map(_.getDouble(2)).sum
    assert(mass == n.toDouble * (n + 1) / 2.0,
      s"rank mass $mass != N(N+1)/2 for N=$n")
    val (h, hc) = (rows.head.getDouble(5), rows.head.getDouble(6))
    assert(h >= 0.0, "H is a rank variance ratio")
    assert(hc >= h, "tie correction divides by ≤1")
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("wilcoxon signed-rank: full independent driver replay") {
    val r = SparkEntry.queries("q_agg_wilcoxon_signed")(spark, sfDir)
      .head()
    val (n, wPlus, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    // replay: per-customer half-year cent totals via an independent
    // aggregation, midranks computed in plain Scala
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val ds = sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey AS ck", s"$cents AS c",
        "CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 0 END AS h1")
      .groupBy("ck")
      .agg(sum(when(col("h1") === 1, col("c")).otherwise(0L)).as("a"),
        sum(when(col("h1") === 0, col("c")).otherwise(0L)).as("b"))
      .collect()
      .map(row => row.getLong(1) - row.getLong(2)).filter(_ != 0L)
    assert(ds.length.toLong == n)
    val byAbs = ds.map(d => (math.abs(d), d > 0)).sortBy(_._1)
    // midranks via grouping runs of equal |d|
    var idx = 0
    var w = 0.0
    while (idx < byAbs.length) {
      var j = idx
      while (j < byAbs.length && byAbs(j)._1 == byAbs(idx)._1) j += 1
      val mid = (idx + 1 + j) / 2.0 // avg of ranks idx+1..j
      (idx until j).foreach(i => if (byAbs(i)._2) w += mid)
      idx = j
    }
    assert(math.abs(w - wPlus) <= 1e-9 * math.max(1.0, w),
      s"W+ replay $w vs engine $wPlus")
    assert(!z.isNaN && math.abs(z) < 50.0)
  }

  test("sign test: census conserved, z clamped at zero") {
    val daily = sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy("flag").agg(count(lit(1)).as("days"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q_agg_sign_test")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (flag, pos, neg, zero) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pos + neg + zero == daily(flag) - 1,
        "every interior day is classified exactly once")
      assert(r.getDouble(4) >= 0.0, "clamped continuity correction")
    }
  }

  test("kmv: concentration bound holds and ≤k-distinct inputs are exact") {
    val r = SparkEntry.queries("q_sketch_kmv")(spark, sfDir).head()
    val (nK, actual, est) = (r.getLong(0), r.getLong(2), r.getDouble(3))
    if (nK < 256L)
      // guard regime (sf0.001 has 150 distinct custkeys): the sketch
      // holds EVERY distinct hash, so the estimate IS the exact count
      assert(est == actual.toDouble && nK == actual,
        s"under-k sketch must be exact: n_k=$nK est=$est actual=$actual")
    else
      assert(math.abs(est - actual) / actual <= 4.0 / math.sqrt(256.0),
        s"KMV est $est vs $actual breaches the 4σ band")
    // the exact-under-k guard: 25 distinct nation keys → est == exact
    val nk = sources.Tables.nation(spark, sfDir)
      .select(graft.Det.pHash60(col("n_nationkey")).as("h")).distinct()
    val small = nk.orderBy(col("h").asc).limit(256)
      .agg(count(lit(1)).as("n_k")).head().getLong(0)
    assert(small == 25L, "guard regime: sketch not full → estimate = n_k")
  }

  test("friedman: within-block rank mass conserved, correction inflates") {
    val rows = SparkEntry.queries("q_agg_friedman")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "five treatments")
    val n = rows.head.getLong(2)
    // each complete block distributes twice-ranks summing to
    // 2·(1+…+5) = 30, so Σ_j rank2_sum must equal 30·n exactly
    assert(rows.map(_.getLong(1)).sum == 30L * n,
      "twice-rank mass must equal 30 per block")
    val (chi2, corr) = (rows.head.getDouble(3), rows.head.getDouble(4))
    assert(chi2 >= 0.0, "Friedman chi2 is a scaled rank variance")
    assert(corr >= chi2 - 1e-12, "tie correction divides by <= 1")
  }

  test("median test: census conserved and grand median replays") {
    val rows = SparkEntry.queries("q_agg_median_test")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val vs = sources.Tables.orders(spark, sfDir)
      .selectExpr(s"$cents AS v").collect().map(_.getLong(0)).sorted
    // lower median: value at 1-based position ceil(n/2)
    val med = vs((vs.length + 1) / 2 - 1)
    rows.foreach { r =>
      assert(r.getLong(4) == med, "grand lower median must replay")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        "above + below = group size")
    }
    assert(rows.map(_.getLong(1)).sum == vs.length.toLong)
    assert(rows.head.getDouble(5) >= 0.0, "chi2 is a sum of squares")
  }

  test("cochran q: full independent driver replay") {
    val r = SparkEntry.queries("q_agg_cochran_q")(spark, sfDir).head()
    val cy = sources.Tables.orders(spark, sfDir)
      .where(expr("year(o_orderdate) IN (1995, 1996, 1997)"))
      .selectExpr("o_custkey AS ck", "year(o_orderdate) AS yr")
      .distinct().collect()
      .map(x => (x.getLong(0), x.getInt(1)))
    val byCk = cy.groupBy(_._1).view.mapValues(_.length)
    val t = byCk.values.sum.toLong
    val r2 = byCk.values.map(v => v.toLong * v).sum
    val cols = cy.groupBy(_._2).view.mapValues(_.length).toMap
    val num = Seq(1995, 1996, 1997)
      .map(y => { val d = 3L * cols.getOrElse(y, 0) - t; d * d }).sum
    val q = 2.0 * num / (3.0 * (3L * t - r2))
    assert(r.getLong(0) == byCk.size.toLong)
    assert(r.getLong(1) == t && r.getLong(2) == r2)
    assert(math.abs(r.getDouble(6) - q) <= 1e-9 * math.max(1.0, q),
      s"Q replay $q vs engine ${r.getDouble(6)}")
  }

  test("anderson darling: full independent driver replay") {
    val r = SparkEntry.queries("q_agg_anderson_darling")(spark, sfDir)
      .head()
    val (n, lam, a2) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val vs = sources.Tables.orders(spark, sfDir)
      .selectExpr(s"$cents AS v").collect().map(_.getLong(0)).sorted
    assert(vs.length.toLong == n)
    assert(math.abs(lam - vs.map(BigInt(_)).sum.toDouble / n) <= 1e-6)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // classic per-sorted-row spelling — an independent path from the
    // engine's per-distinct-value regrouped coefficients
    var ssum = 0.0
    for (i <- 1 to vs.length) {
      val z = vs(i - 1).toDouble / lam
      val zr = vs(vs.length - i).toDouble / lam
      ssum += (2 * i - 1).toDouble *
        (r6(math.log(1.0 - r6(math.exp(-z)))) - zr)
    }
    val a2replay = -n.toDouble - ssum / n.toDouble
    assert(math.abs(a2 - a2replay) <= 1e-4 * math.max(1.0, a2.abs),
      s"A2 replay $a2replay vs engine $a2")
  }

  test("kmv jaccard: union sample is unbiased and exact under k") {
    val r = SparkEntry.queries("q_sketch_kmv_jaccard")(spark, sfDir)
      .head()
    val (nK, bothK, uTrue, iTrue) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (uEst, jacEst, jacTrue) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(math.abs(jacTrue - iTrue.toDouble / uTrue) <= 1e-12)
    if (nK < 256L) {
      // under-k regime: the sketch IS the set, so everything is exact
      assert(nK == uTrue && uEst == uTrue.toDouble)
      assert(bothK == iTrue && jacEst == jacTrue)
    } else {
      assert(math.abs(jacEst - jacTrue) <=
        4.0 * math.sqrt(jacTrue * (1 - jacTrue) / 256.0) + 1e-12,
        s"KMV Jaccard $jacEst vs $jacTrue breaches the 4σ band")
      assert(math.abs(uEst - uTrue) / uTrue <= 4.0 / math.sqrt(256.0))
    }
  }

  test("zonemap: clustered column prunes, stats never lose rows") {
    val r = SparkEntry.queries("q_layout_zonemap")(spark, sfDir).head()
    val files = r.getLong(0)
    val (fsC, rsC, rmC) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val (fsU, rsU, rmU) = (r.getLong(4), r.getLong(5), r.getLong(6))
    // the zone-map CONTRACT: a scan over the surviving files sees every
    // matching row (no false negatives), for both predicates
    assert(rsC >= rmC && rsU >= rmU, "zone maps must never lose rows")
    // clustered layout: a ~5% date band overlaps only ~4 of 64 date
    // zones; give slack for boundary zones
    assert(fsC <= files / 4,
      s"clustered predicate should prune most files: $fsC of $files")
    // unclustered column: every file's orderkey span covers the band
    assert(fsU >= files / 2,
      s"unclustered stats should prune little: $fsU of $files")
    assert(r.getDouble(8) > r.getDouble(9),
      "clustered skip ratio must beat unclustered")
  }

  test("incremental view: maintenance algebra matches direct recompute") {
    val rows = SparkEntry.queries("q_view_incremental")(spark, sfDir)
      .collect()
    assert(rows.length == 5, "five priorities")
    rows.foreach { r =>
      assert(r.getInt(5) == 1, s"maintained_ok failed for ${r.get(0)}")
      assert(r.getLong(1) == r.getLong(3) && r.getLong(2) == r.getLong(4))
    }
    assert(rows.map(_.getLong(3)).sum > 0, "window must be non-empty")
  }

  test("hurst: slope is the 3-point OLS of the size means") {
    val rows = SparkEntry.queries("q_time_hurst")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 32, 64))
    rows.foreach(r => assert(r.getLong(1) > 0, "blocks survive"))
    val z = rows.map(_.getDouble(2))
    val h = rows.head.getDouble(3)
    // H = (z(64) − z(16)) / (2 ln 2), on the same 1e-6 output grid
    val expect = (z(2) - z(0)) / (2.0 * math.log(2.0))
    assert(math.abs(h - expect) <= 2e-6, s"hurst $h vs replay $expect")
    assert(h > 0.0 && h < 1.5, "R/S slope must be a plausible exponent")
  }

  test("spectral entropy: bounded by ln K and normalized to [0,1]") {
    val rows = SparkEntry.queries("q_time_spectral_entropy")(
      spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val k = r.getLong(1)
      assert(k == 13L, "13 candidate periods")
      val (h, hn) = (r.getDouble(3), r.getDouble(4))
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-9)
      assert(hn >= 0.0 && hn <= 1.0 + 1e-9)
      assert(math.abs(hn - h / math.log(k.toDouble)) <= 2e-6)
    }
  }

  test("theil u: identical-forecast series would score 1, replay holds") {
    val rows = SparkEntry.queries("q_time_theil_u")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0, "U2 positive")
      val u1 = r.getDouble(3)
      assert(u1 >= 0.0 && u1 <= 1.0 + 1e-9, "U1 lives in [0,1]")
    }
  }

  test("pacf: lag-1 pacf equals r1 and the DL recursion replays") {
    val r = SparkEntry.queries("q_time_pacf")(spark, sfDir).head()
    val (r1, r2, r3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getDouble(4) == r1, "pacf(1) = acf(1) by definition")
    Seq(r1, r2, r3).foreach(x => assert(x.abs <= 1.0 + 1e-9))
    // replay the Durbin–Levinson chain from the ROUNDED r's — same
    // grid both engines share; tolerance covers the output rounding
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert(math.abs(r.getDouble(5) - p22) <= 5e-6)
    assert(math.abs(r.getDouble(6) - p33) <= 5e-6)
  }

  test("deming: attenuation law holds against the OLS slope") {
    val r = SparkEntry.queries("q_agg_deming")(spark, sfDir).head()
    val (slope, r2) = (r.getDouble(1), r.getDouble(3))
    assert(r2 > 0.9, "the two order-value measurements must co-move")
    assert(slope > 0.5 && slope < 2.0)
    // independent moment replay + the errors-in-variables attenuation
    // law: |b_ols| <= |b_deming| (OLS shrinks toward 0 under x-error)
    val xy = sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE)" +
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("x"),
        sum(expr("CAST(floor(l_extendedprice" +
          " * (CAST(1.0 AS DOUBLE) - l_discount)" +
          " * CAST(100.0 AS DOUBLE)" +
          " + CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("y"))
      .collect().map(x => (x.getLong(1).toDouble, x.getLong(2).toDouble))
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val cxx = xy.map(p => p._1 * p._1).sum - sx * sx / n
    val cyy = xy.map(p => p._2 * p._2).sum - sy * sy / n
    val cxy = xy.map(p => p._1 * p._2).sum - sx * sy / n
    val dem = (cyy - cxx + math.sqrt(
      (cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)) / (2 * cxy)
    assert(math.abs(slope - dem) <= 1e-4 * dem,
      s"Deming replay $dem vs engine $slope")
    assert(math.abs(cxy / cxx) <= math.abs(dem) + 1e-12,
      "OLS slope must not exceed the Deming slope in magnitude")
  }

  test("concordance: |CCC| <= |r| and the LoA band is ~95%") {
    val r = SparkEntry.queries("q_agg_concordance")(spark, sfDir).head()
    val (n, ccc) = (r.getLong(0), r.getDouble(1))
    val dem = SparkEntry.queries("q_agg_deming")(spark, sfDir).head()
    assert(ccc.abs <= dem.getDouble(3).abs + 1e-9,
      "CCC is Pearson r times an accuracy factor <= 1")
    assert(ccc >= -1.0 && ccc <= 1.0)
    assert(r.getDouble(5) > r.getDouble(4), "loa_hi > loa_lo")
    val outsideFrac = r.getLong(6).toDouble / n
    assert(outsideFrac < 0.2,
      s"LoA should cover the bulk of diffs (outside=$outsideFrac)")
  }

  test("icc: full independent driver replay") {
    val r = SparkEntry.queries("q_agg_icc")(spark, sfDir).head()
    val (k, nn) = (r.getLong(0), r.getLong(1))
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val rows = sources.Tables.orders(spark, sfDir)
      .join(sources.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_nationkey AS g", s"$cents AS v")
      .collect().map(x => (x.getAs[Number](0).longValue, x.getLong(1)))
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(k == byG.size.toLong && nn == rows.length.toLong)
    val nD = rows.length.toDouble
    val ss = rows.map(_._2.toDouble).sum
    val qq = rows.map(v => v._2.toDouble * v._2.toDouble).sum
    val sbRaw = byG.values.map { vs =>
      val s = vs.map(_.toDouble).sum; s * s / vs.length
    }.sum
    val (ssb, ssw) = (sbRaw - ss * ss / nD, qq - sbRaw)
    val n2 = byG.values.map(v => v.length.toDouble * v.length).sum
    val n0 = (nD - n2 / nD) / (k - 1)
    val (msb, msw) = (ssb / (k - 1), ssw / (nn - k))
    val icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert(math.abs(r.getDouble(5) - icc) <= 1e-6 + 1e-6 * icc.abs,
      s"ICC replay $icc vs engine ${r.getDouble(5)}")
    assert(icc.abs <= 1.0)
  }

  test("source overlap: full matrix, jaccard bounded by the margins") {
    val rows = SparkEntry.queries("q_text_source_overlap")(spark, sfDir)
      .collect()
    val k = sources.Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length.toLong == k * (k - 1) / 2,
      s"expected the full ${k}x$k upper triangle")
    rows.foreach { r =>
      val (na, nb, c, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(c <= math.min(na, nb), "overlap bounded by set sizes")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getString(0) < r.getString(1), "unordered pairs, once")
      assert(math.abs(j - c.toDouble / (na + nb - c)) <= 1e-6)
    }
  }

  test("prefix dup: histogram masses conserve the corpus") {
    val rows = SparkEntry.queries("q_text_prefix_dup")(spark, sfDir)
      .collect()
    val total = sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == total,
      "cluster-size histogram must cover every document once")
    rows.foreach { r =>
      val (cs, nc, nd, dd) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd == cs * nc)
      assert(dd == (if (cs > 1) nd else 0L))
    }
  }

  test("ljung box: Q reassembles from the r's and pacf's acf agrees") {
    val r = SparkEntry.queries("q_time_ljung_box")(spark, sfDir).head()
    val n = r.getLong(0)
    val (r1, r2, r3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val p = SparkEntry.queries("q_time_pacf")(spark, sfDir).head()
    // same carrier, same moments → identical rounded ACF values
    assert(r1 == p.getDouble(1) && r2 == p.getDouble(2)
      && r3 == p.getDouble(3), "ACF must agree across the two queries")
    val q = n.toDouble * (n + 2) * (r1 * r1 / (n - 1)
      + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
    assert(math.abs(r.getDouble(4) - q) <= 2e-5 * math.max(1.0, q),
      s"Q replay $q vs engine ${r.getDouble(4)}")
    assert(r.getDouble(4) >= 0.0)
  }

  test("durbin watson: dw lives in [0,4] and replays from residuals") {
    val r = SparkEntry.queries("q_time_durbin_watson")(spark, sfDir)
      .head()
    val dw = r.getDouble(2)
    assert(dw > 0.0 && dw < 4.0, s"DW out of range: $dw")
    // independent replay through EXPLICIT residuals (the engine never
    // materializes them — closed forms only)
    val daily = sources.Tables.lineitem(spark, sfDir)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg((sum(expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE)" +
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)")) / 10000)
        .cast("long").as("y"))
      .orderBy("d").collect().map(_.getLong(1).toDouble)
    val n = daily.length
    val t = (0 until n).map(_.toDouble)
    val (tb, yb) = (t.sum / n, daily.sum / n)
    val b = t.zip(daily).map { case (a, y) => (a - tb) * (y - yb) }.sum /
      t.map(a => (a - tb) * (a - tb)).sum
    val a0 = yb - b * tb
    val e = t.zip(daily).map { case (a, y) => y - a0 - b * a }
    val num = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val den = e.map(x => x * x).sum
    assert(math.abs(dw - num / den) <= 1e-4,
      s"DW replay ${num / den} vs engine $dw")
  }

  test("csv quoted: adversarial strings survive the quote contract") {
    val rows = SparkEntry.queries("q_source_csv_quoted")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    // replay the census from the construction rule, never the CSV —
    // a hash_sum match then proves the write→read trip is byte-exact
    val desc = "concat('p=\"', o_orderpriority, '\", k=', " +
      "CAST(o_custkey AS STRING), ', t=\"ab,c\"\"d\" ')"
    val truth = sources.Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority", s"$desc AS note")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(length(col("note"))).as("sl"),
        sum(graft.Det.pHash32(col("note"))).as("hs"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (n, sl, hs) = truth(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == sl && r.getLong(3) == hs,
        s"quoted CSV roundtrip lost bytes for ${r.getString(0)}")
    }
  }

  test("twap: duration mass conserved, constant series would be exact") {
    val rows = SparkEntry.queries("q_win_twap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tw, pm) = (r.getDouble(2), r.getDouble(3))
      assert(tw > 0.0 && pm > 0.0)
      // value is bounded in the synthetic generator: TWAP must live
      // inside the per-type [min,max] cents envelope
      assert(tw <= 100000.0 && tw >= 1.0)
    }
    // replay one type end-to-end
    val ev = sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .selectExpr("unix_micros(ts) AS us",
        "CAST(floor(value * CAST(100.0 AS DOUBLE)" +
          " + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c", "event_id")
      .orderBy("us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val twap = {
      var (wv, wd) = (BigInt(0), 0L)
      ev.sliding(2).foreach {
        case Array((u1, c1), (u2, _)) => wv += BigInt(c1) * (u2 - u1); wd += u2 - u1
        case _ =>
      }
      wv.toDouble / wd
    }
    val got = rows.find(_.getString(0) == "purchase").get.getDouble(2)
    assert(math.abs(got - twap) <= 1e-4,
      s"TWAP replay $twap vs engine $got")
  }

  test("sharpe: reassembles from mean and sd") {
    val rows = SparkEntry.queries("q_win_sharpe")(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (m, sd, sh) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(sd > 0.0)
      assert(math.abs(sh - m / sd * math.sqrt(252.0)) <= 2e-4 +
        2e-6 * sh.abs, s"sharpe ${m / sd * math.sqrt(252.0)} vs $sh")
    }
  }

  test("xbar/r chart: limits bracket the grand mean, census sane") {
    val r = SparkEntry.queries("q_qc_xbar_r")(spark, sfDir).head()
    val (nDays, xg, rb) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val (uclX, lclX, uclR) =
      (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(nDays > 0 && rb > 0.0)
    assert(math.abs(uclX - (xg + 0.577 * rb)) <= 2e-6)
    assert(math.abs(lclX - (xg - 0.577 * rb)) <= 2e-6)
    assert(math.abs(uclR - 2.114 * rb) <= 2e-6)
    assert(r.getLong(6) <= nDays && r.getLong(7) <= nDays)
  }

  test("tost: symmetric in delta, t's reassemble") {
    val r = SparkEntry.queries("q_ab_tost")(spark, sfDir).head()
    val (diff, delta, se) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val (tl, tu) = (r.getDouble(5), r.getDouble(6))
    assert(delta > 0.0 && se > 0.0)
    assert(math.abs(tl - (diff + delta) / se) <= 2e-4)
    assert(math.abs(tu - (delta - diff) / se) <= 2e-4)
    assert(math.abs((tl + tu) - 2.0 * delta / se) <= 4e-4,
      "t_lower + t_upper must equal 2δ/se")
    assert(r.getInt(7) == (if (math.min(tl, tu) > 1.645) 1 else 0))
  }

  test("power: n_req replays from the variance and shrinks with delta") {
    val rows = SparkEntry.queries("q_ab_power")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (varM, delta, nReq) =
        (r.getDouble(3), r.getDouble(4), r.getLong(5))
      val expect = math.ceil(
        2.0 * math.pow(1.959964 + 0.841621, 2) * (varM * 1e6)
          / (delta * delta)).toLong
      // var_m is on the 1e-3 millions grid → n_req replay tolerance
      assert(math.abs(nReq - expect) <= math.max(2L, expect / 1000),
        s"n_req $nReq vs replay $expect")
      assert(r.getLong(6) > 0, "days_to_run positive")
    }
  }

  test("shapley: efficiency law and full replay from coalition rates") {
    val rows = SparkEntry.queries("q_attribution_shapley")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    val (vFull, vNone, phiTot) =
      (rows.head.getDouble(2), rows.head.getDouble(3),
        rows.head.getDouble(4))
    // EFFICIENCY: Σφ = v(full) − v(∅) — the Shapley axiom the other
    // attribution models cannot state
    assert(math.abs(phiTot - (vFull - vNone)) <= 5e-6,
      s"efficiency violated: $phiTot vs ${vFull - vNone}")
    assert(math.abs(rows.map(_.getDouble(1)).sum - phiTot) <= 5e-6)
  }

  test("theil: decomposition identity T = T_between + T_within") {
    val rows = SparkEntry.queries("q_agg_theil_index")(spark, sfDir)
      .collect()
    assert(rows.length == 25)
    val (t, tb, tw) = (rows.head.getDouble(4), rows.head.getDouble(5),
      rows.head.getDouble(6))
    assert(t >= 0.0 && tb >= 0.0, "Theil components are nonnegative")
    assert(math.abs(t - (tb + tw)) <= 5e-6,
      s"decomposition broken: $t vs ${tb + tw}")
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) <= 5e-6,
      "revenue shares must sum to 1")
  }

  test("moran: null expectation and pure-noise field is near it") {
    val r = SparkEntry.queries("q_geo_moran_i")(spark, sfDir).head()
    val (n, w) = (r.getLong(0), r.getLong(1))
    assert(n > 0 && w > 0 && w <= 8 * n)
    val (i, e) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(e - (-1.0 / (n - 1))) <= 1e-9)
    // hash-placed points with iid values: the field is spatial NOISE,
    // so I must sit near E[I] (far from ±1); generous 6σ-ish band
    assert(math.abs(i - e) < 0.3, s"noise field scored I=$i (E=$e)")
  }

  test("lognormal fit: log-moments replay, ratios near 1 iff adequate") {
    val rows = SparkEntry.queries("q_agg_lognormal_fit")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mu, sg) = (r.getDouble(2), r.getDouble(3))
      assert(sg > 0.0 && mu > 0.0)
      val (mr, cr) = (r.getDouble(4), r.getDouble(5))
      // ratios must at least be positive and O(1); adequacy itself is
      // data-dependent, the pin is the FORM
      assert(mr > 0.1 && mr < 10.0, s"mean ratio off-scale: $mr")
      assert(cr > 0.0, s"cv2 ratio must be positive: $cr")
    }
    // replay one group's log-moments
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val vs = sources.Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .selectExpr(s"$cents AS v").where(col("v") > 0)
      .collect().map(r => math.log(r.getLong(0).toDouble))
    val mu = vs.sum / vs.length
    val got = rows.find(_.getString(0) == "1-URGENT").get
    assert(math.abs(got.getDouble(2) - mu) <= 1e-4,
      s"mu_ln replay $mu vs ${got.getDouble(2)}")
  }

  test("hill tail: alpha replays from the top order statistics") {
    val r = SparkEntry.queries("q_agg_hill_tail")(spark, sfDir).head()
    assert(r.getLong(0) == 100L)
    val cents = "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE)" +
      " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    val top = sources.Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey AS k", s"$cents AS v")
      .collect().map(x => (x.getLong(1), x.getLong(0)))
      .sortBy { case (v, k) => (-v, k) }.take(101)
    val xk1 = top.last._1
    assert(r.getLong(1) == xk1, "x_{k+1} must be the 101st order stat")
    val alpha = 100.0 /
      top.take(100).map(t => math.log(t._1.toDouble / xk1)).sum
    assert(math.abs(r.getDouble(2) - alpha) <= 1e-4 * alpha,
      s"Hill replay $alpha vs ${r.getDouble(2)}")
    assert(alpha > 0.0)
  }

  test("profile drift: identical-window profile would be driftless") {
    val rows = SparkEntry.queries("q_dq_profile_drift")(spark, sfDir)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(3) <= r.getLong(1), "distinct <= rows")
      assert(r.getDouble(7) > 0.0 && r.getDouble(7) <= 1.0)
      // priority/status are closed 5/3-value domains: their distinct
      // counts CANNOT drift between full-year windows
      if (r.getString(0) != "o_custkey")
        assert(r.getDouble(9) == 1.0,
          s"${r.getString(0)} is a closed domain, ratio must be 1")
    }
  }

  test("ams f2: exact truth replays and estimate is within 5σ") {
    val r = SparkEntry.queries("q_sketch_ams_f2")(spark, sfDir).head()
    assert(r.getLong(0) == 64L)
    val (est, exact) = (r.getDouble(1), r.getLong(2))
    val replay = sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey").agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f"))).head().getLong(0)
    assert(replay == exact, "Σf² truth path must replay")
    assert(math.abs(est - exact) / exact <= 5.0 * math.sqrt(2.0 / 64.0),
      s"AMS est $est vs $exact breaches the 5σ band")
  }
}
