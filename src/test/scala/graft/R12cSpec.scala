package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the late-round-12 operators — the invariants the
  * DuckDB hash parity can't see (parity proves both engines agree; these
  * prove the agreed-on answer has the MATHEMATICAL shape the operator
  * advertises).
  */
class R12cSpec extends AnyFunSuite with SparkFixture {

  test("Kaplan-Meier survival is monotone non-increasing from <= 1") {
    val rows = SparkEntry.queries("q_agg_survival_km")(spark, sfDir)
      .collect()
    val surv = rows.map(_.getDouble(4))
    assert(surv.forall(v => v >= 0.0 && v <= 1.0))
    assert(surv.zip(surv.drop(1)).forall { case (a, b) => b <= a + 1e-12 },
      s"survival must never rise: ${surv.mkString(",")}")
  }

  test("Lorenz cumulative share is monotone and ends at 1") {
    val rows = SparkEntry.queries("q_agg_lorenz")(spark, sfDir).collect()
    val cum = rows.map(_.getDouble(3))
    assert(cum.zip(cum.drop(1)).forall { case (a, b) => b >= a - 1e-12 })
    assert(math.abs(cum.last - 1.0) < 1e-9,
      s"cumulative share must reach 1, got ${cum.last}")
    // Lorenz curve lies under the diagonal (ascending-rank convexity)
    rows.foreach { r =>
      val decile = r.getLong(0)
      assert(cum(decile.toInt) <= (decile + 1) / 10.0 + 1e-9)
    }
  }

  test("k-core census is non-increasing across peels") {
    val n = SparkEntry.queries("q_graph_kcore")(spark, sfDir)
      .collect().map(_.getLong(1))
    assert(n.zip(n.drop(1)).forall { case (a, b) => b <= a },
      s"peeling can never add nodes: ${n.mkString(",")}")
  }

  test("M4 buckets contain their own extremes and order first <= last") {
    val rows = SparkEntry.queries("q_time_m4")(spark, sfDir).collect()
    rows.foreach { r =>
      val (tF, tL) = (r.getLong(1), r.getLong(2))
      val (yF, yL) = (r.getLong(3), r.getLong(4))
      val (yMin, yMax) = (r.getLong(5), r.getLong(7))
      assert(tF <= tL)
      assert(yMin <= math.min(yF, yL) && yMax >= math.max(yF, yL),
        s"extremes must bound the endpoints in bucket ${r.getLong(0)}")
    }
  }

  test("Markov removal effects are non-negative and sub-full") {
    val rows = SparkEntry.queries("q_attribution_markov")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (full, removed, re) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(full >= 0.0 && full <= 1.0 && removed >= 0.0 && removed <= 1.0)
      assert(removed <= full + 1e-12,
        "removing a channel can only remove conversion paths")
      assert(re >= -1e-12 && re <= 1.0 + 1e-12)
    }
    val shares = rows.flatMap(r => Option(r.get(4)).map(_ => r.getDouble(4)))
    if (shares.nonEmpty)
      assert(math.abs(shares.sum - 1.0) < 1e-9,
        s"shares must normalize: ${shares.mkString(",")}")
  }

  test("BH-FDR p-values are valid and the rejection set is a rank prefix") {
    val rows = SparkEntry.queries("q_agg_fdr_bh")(spark, sfDir).collect()
    val byRank = rows.sortBy(_.getLong(4))
    assert(byRank.forall(r => r.getDouble(3) >= 0.0 &&
      r.getDouble(3) <= 1.0))
    val ps = byRank.map(_.getDouble(3))
    assert(ps.zip(ps.drop(1)).forall { case (a, b) => b >= a - 1e-15 },
      "p must be non-decreasing in BH rank")
    val rej = byRank.map(_.getBoolean(5))
    // once false, never true again (step-up prefix property)
    assert(!rej.dropWhile(identity).contains(true),
      s"rejections must form a rank prefix: ${rej.mkString(",")}")
  }

  test("PSI of a stable population reads under the 0.1 alert fence " +
    "and smoothed shares sum to 1") {
    val rows = SparkEntry.queries("q_dq_drift_psi")(spark, sfDir).collect()
    val psi = rows.head.getDouble(6)
    assert(psi >= 0.0 && psi < 0.1,
      s"the synthetic halves are drawn identically; PSI=$psi")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("retrieval metrics are in range and NDCG honors its bounds") {
    val r = SparkEntry.queries("q_eval_retrieval")(spark, sfDir)
      .collect().head
    for (i <- 1 to 5 if !r.isNullAt(i)) {
      val v = r.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"metric $i out of range: $v")
    }
  }
}
