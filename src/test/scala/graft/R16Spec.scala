package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Aggregates
import graft.sources.Tables

/** Round-16 pins: the percentile no-oracle bridge and the ADVICE guards. */
class R16Spec extends AnyFunSuite with SparkFixture {

  test("percentile_approx bridged to the portable histogram-quantile construction") {
    // q_agg_percentile_approx is no-oracle by design (engine-internal
    // KLL-style sketch). q_sketch_hist_quantiles is its oracle-certified
    // portable sibling (hash-green vs DuckDB). This bridge rebuilds the
    // portable 256-bin construction on percentile_approx's OWN column
    // (lineitem extendedprice cents per returnflag) and requires both
    // sketches to land inside their envelopes around the SAME exact
    // truth — the SketchesSpec HLL-bridge pattern:
    //  (a) the portable interpolated estimate shares the exact target
    //      rank's bin, so |portable − exact@target| ≤ one bin width;
    //  (b) percentile_approx(accuracy=10000) lands inside a generous
    //      exact-rank window (±n/1000 ranks) around the same target;
    //  (c) therefore the two sketches agree within binWidth + the rank
    //      window's value span — asserted directly.
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // the estimator's raw values, on their own aggregation — the r20
    // certified query no longer emits them (it emits the exact legs +
    // rank-bound certificates, the approx_distinct pattern)
    val approx = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("pa50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
          .as("pa95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (flag, fv) =>
      val vs = fv.map(_._2).sorted
      val (lo, hi, n) = (vs.head, vs.last, vs.length.toLong)
      val span = math.max(hi - lo + 1, 1L)
      val binW = span.toDouble / 256.0
      def bin(v: Long): Int = math.min(255L, (v - lo) * 256L / span).toInt
      val hist = vs.groupBy(bin).view.mapValues(_.length.toLong).toMap
      val cum = (0 to 255).scanLeft(0L)((c, b) =>
        c + hist.getOrElse(b, 0L)).tail // cum(b) inclusive
      for ((p, engineEst) <- Seq(50 -> approx(flag)._1,
        95 -> approx(flag)._2)) {
        val target = (p * n + 99) / 100
        val b = (0 to 255).find(cum(_) >= target).get
        val c = hist(b)
        val cumB = cum(b)
        val portable = lo.toDouble + binW *
          (b.toDouble + (target - (cumB - c)).toDouble / c.toDouble)
        val exactAtTarget = vs(target.toInt - 1).toDouble
        assert(math.abs(portable - exactAtTarget) <= binW + 1e-6,
          s"$flag p$p: portable $portable vs exact $exactAtTarget " +
            s"beyond one bin width $binW")
        val tol = math.max(n / 1000, 2L)
        val rLo = vs(math.max(target - tol - 1, 0L).toInt).toDouble
        val rHi = vs(math.min(target + tol, n - 1).toInt).toDouble
        val engineCents = engineEst * 100.0
        assert(engineCents >= rLo - 0.5 && engineCents <= rHi + 0.5,
          s"$flag p$p: engine $engineCents outside rank window " +
            s"[$rLo, $rHi]")
        assert(math.abs(engineCents - portable) <=
          binW + (rHi - rLo) + 1.0,
          s"$flag p$p: sketches disagree beyond their joint envelope: " +
            s"engine $engineCents vs portable $portable " +
            s"(binW $binW, window ${rHi - rLo})")
      }
    }
  }

  test("anderson-darling ez clamp keeps degenerate z finite, no-op on real data") {
    // ADVICE r15: z < ~1.4e-6 rounds exp(-z) to 1 and ln(1-ez) = -Inf.
    // The clamp (least(ez, 1-1e-6)) must keep the term finite on a
    // degenerate corpus and leave TPC-H output unchanged (parity is
    // re-certified by the driver; here: finite output on real data).
    val out = graft.operators.Analytics.qAggAndersonDarling
      .fn(spark, sfDir).collect()
    assert(out.length == 1)
    val a2 = out.head.getDouble(2)
    assert(!a2.isNaN && !a2.isInfinite, s"a2 not finite: $a2")
    // degenerate direct check: the clamped lnp formula at ez=1
    val lnp = spark.sql(
      "SELECT round(ln(CAST(1 AS DOUBLE) - least(CAST(1.0 AS DOUBLE)," +
        " CAST(0.999999 AS DOUBLE))), 6) AS lnp").head().getDouble(0)
    assert(!lnp.isInfinite && math.abs(lnp - (-13.815511)) < 1e-5)
  }

  test("sign test z is NULL (not NaN) when every interior change is zero") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("signtest").toString
    // one flag whose daily revenue never changes: n_pos = n_neg = 0
    Seq(
      ("A", "1995-01-01", 10.0), ("A", "1995-01-02", 10.0),
      ("A", "1995-01-03", 10.0))
      .toDF("l_returnflag", "d", "l_extendedprice")
      .select(col("l_returnflag"), col("d").cast("timestamp")
        .as("l_shipdate"), col("l_extendedprice"))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = graft.operators.Analytics.qAggSignTest.fn(spark, dir).collect()
    assert(r.length == 1 && r.head.isNullAt(4),
      s"all-ties z must be NULL: ${r.toSeq}")
  }

  test("tie cubes ride DECIMAL(38,0): a 3M-deep tie run does not wrap") {
    // ADVICE r15: cnt³ on BIGINT wraps at cnt ≈ 2.1e6 (Spark silent,
    // DuckDB raises — engine-divergent). The decimal carrier must
    // produce the exact value for a synthetic 3e6-deep tie.
    val cnt = 3000000L
    val got = spark.sql(
      s"SELECT CAST($cnt AS DECIMAL(38,0)) * CAST($cnt AS DECIMAL(38,0))" +
        s" * CAST($cnt AS DECIMAL(38,0)) - CAST($cnt AS DECIMAL(38,0))" +
        " AS ties").head().getDecimal(0)
    assert(got == new java.math.BigDecimal("26999999999997000000"),
      s"decimal cube wrong: $got")
  }
}
