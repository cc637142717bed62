package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Llm, Relational, Windows}
import graft.sources.Tables

/** Semantic pins for the round-10 operators — properties the DuckDB hash
  * match can't express directly (exactness invariants, brute-force
  * equivalence, idempotence).
  */
class R10OperatorsSpec extends AnyFunSuite with SparkFixture {

  test("proration: allocated cents sum EXACTLY to each order's cent total") {
    val alloc = Relational.qAllocProration.fn(spark, sfDir)
      .groupBy("l_orderkey").agg(sum(col("alloc_cents")).as("alloc"))
    val totals = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE) " +
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("tot_c"))
    val bad = alloc.join(totals, col("l_orderkey") === col("o_orderkey"))
      .where(col("alloc") =!= col("tot_c")).count()
    assert(bad == 0, s"$bad orders where allocation does not sum to total")
  }

  test("proration: every line within 1 cent of its exact proportional share") {
    val rows = Relational.qAllocProration.fn(spark, sfDir)
    val lines = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .withColumn("qsum", sum(col("q")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE) " +
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("tot_c")),
        col("l_orderkey") === col("o_orderkey"))
    val off = rows.join(lines, Seq("l_orderkey", "l_linenumber"))
      // |alloc - tot*q/Q| < 1 ⟺ alloc ∈ {floor, floor+1} of the exact share
      .where(abs(col("alloc_cents") * col("qsum") -
        col("tot_c") * col("q")) >= col("qsum")).count()
    assert(off == 0, s"$off lines drifted ≥1 cent from proportional share")
  }

  test("weighted median matches a brute-force per-segment computation") {
    val got = Aggregates.qAggWeightedMedian.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val weighted = rs.map { case (_, bal, key) => (bal, key, key % 10 + 1) }
        .sortBy { case (bal, key, _) => (bal, key) }
      val tot = weighted.map(_._3).sum
      var cum = 0L
      val med = weighted.find { case (_, _, w) =>
        cum += w; cum * 2 >= tot
      }.get._1
      assert(got(seg) == ((med, tot)), s"segment $seg: got ${got(seg)}")
    }
  }

  test("rolling median matches brute force over one partition") {
    val got = Windows.qWinRollingMedian.fn(spark, sfDir)
      .where(col("flag") === "A").orderBy("d").collect()
      .map(r => (r.getTimestamp(1), r.getInt(2), r.getDouble(3)))
    val series = got.map(_._1) // days in order; revs re-derived below
    val revs = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "A")
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(Det.dsum(col("l_extendedprice")).as("rev"))
      .orderBy("d").collect().map(_.getDouble(1))
    assert(series.length == revs.length)
    got.zipWithIndex.foreach { case ((_, nFrame, med), i) =>
      val frame = revs.slice(math.max(0, i - 6), i + 1).sorted
      assert(nFrame == frame.length)
      val expect =
        if (frame.length % 2 == 1) frame(frame.length / 2)
        else (frame(frame.length / 2 - 1) + frame(frame.length / 2)) / 2.0
      assert(med == expect, s"row $i: $med != $expect")
    }
  }

  test("URL canonicalization is idempotent and groups are consistent") {
    val out = Llm.qUrlCanonical.fn(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val canon = r.getString(0)
      // canonical forms carry none of the mess the transform removes
      assert(!canon.contains(":80") && !canon.contains("utm_") &&
        !canon.exists(_.isUpper), s"not canonical: $canon")
      assert(!canon.endsWith("/"), s"trailing slash survived: $canon")
      assert(r.getLong(1) >= r.getLong(2),
        "n_docs must be >= n_variants")
    }
    // dedup actually happened: at least one canonical absorbs >1 URL form
    assert(rows.exists(_.getLong(2) > 1), "no variant collapse observed")
  }

  test("Markov transition probabilities row-normalize to 1") {
    val rows = Windows.qMarkovTransitions.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val p = rs.map(_._3).sum
      assert(math.abs(p - 1.0) < 1e-9, s"src $src: probabilities sum to $p")
    }
  }

  test("calendar spine is dense: one row per day, gaps flagged not dropped") {
    val rows = Windows.qCalendarSpine.fn(spark, sfDir).collect()
    val days = rows.map(_.getTimestamp(0).toInstant)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.Duration.between(a, b).toDays == 1,
        s"spine hole between $a and $b")
    }
    rows.filter(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0,
        "missing day must be zero-filled")
    }
  }

  test("A/B lift: arms partition the users and z agrees with the lift sign") {
    val r = Aggregates.qAbLift.fn(spark, sfDir).collect().head
    val (n0, n1) = (r.getLong(0), r.getLong(2))
    val users = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(n0 + n1 == users, "arms must partition the user population")
    val (p0, p1, z) = (r.getDouble(4), r.getDouble(5), r.getDouble(7))
    assert(math.signum(p1 - p0) == math.signum(z),
      "z-score must carry the lift's sign")
  }

  test("as-of with tolerance only weakens the unconditioned as-of match") {
    val base = Relational.qJoinAsof.fn(spark, sfDir)
      .select(col("event_id"), col("signup_ts").as("base_ts"))
    val tol = Relational.qJoinAsofTolerance.fn(spark, sfDir)
    val joined = tol.join(base, "event_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val tolTs = Option(r.getTimestamp(r.fieldIndex("signup_ts")))
      val baseTs = Option(r.getTimestamp(r.fieldIndex("base_ts")))
      // tolerance never invents a match and never changes a kept one
      tolTs.foreach(t => assert(baseTs.contains(t)))
      if (tolTs.isEmpty && baseTs.nonEmpty) {
        val gapMs = r.getTimestamp(r.fieldIndex("ts")).getTime -
          baseTs.get.getTime
        assert(gapMs > 7L * 24 * 3600 * 1000,
          s"match dropped inside the 7-day horizon (gap ${gapMs}ms)")
      }
    }
  }

  test("inventory backlog starts positive and ends at exactly zero") {
    // every ordered unit eventually ships in the synthetic data, so the
    // running position must return to 0 on the final day — an exactness
    // property integer cumsums deliver and float ones would drift off
    val rows = Windows.qInventoryBacklog.fn(spark, sfDir)
      .orderBy("d").collect()
    assert(rows.head.getLong(3) > 0, "backlog should open positive")
    assert(rows.last.getLong(3) == 0L,
      s"final backlog ${rows.last.getLong(3)} != 0: units lost in transit")
    val totOpen = rows.map(_.getLong(1)).sum
    val totShip = rows.map(_.getLong(2)).sum
    assert(totOpen == totShip)
  }

  test("Pareto classes partition the catalog with descending value density") {
    val rows = Windows.qWinParetoAbc.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum == nParts, "classes must partition the parts")
    // value density (revenue per part) must fall strictly A > B > C
    val density = rows.map { case (_, n, rev) => rev / n }
    assert(density(0) > density(1) && density(1) > density(2),
      s"ABC density not descending: ${density.toSeq}")
  }

  test("RFM census covers every customer; quintiles are near-balanced") {
    val rows = Aggregates.qRfmSegments.fn(spark, sfDir).collect()
    val nCust = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == nCust)
    // each dimension's marginal is an ntile(5): sizes differ by at most 1
    Seq(0, 1, 2).foreach { dim =>
      val marginal = rows.groupBy(_.getInt(dim))
        .map { case (_, rs) => rs.map(_.getLong(3)).sum }
      assert(marginal.max - marginal.min <= 1,
        s"dimension $dim quintiles unbalanced: $marginal")
    }
  }

  test("degree histogram masses sum to the node count") {
    val hist = Relational.qGraphDegreeHist.fn(spark, sfDir)
    val nodes = hist.agg(sum(col("n_nodes"))).collect().head.getLong(0)
    val expect = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      .select(explode(array(col("a"), col("b"))).as("n"))
      .select(countDistinct(col("n"))).collect().head.getLong(0)
    assert(nodes == expect, s"histogram covers $nodes of $expect nodes")
  }
}
