package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-13 operators — the invariants the DuckDB
  * hash parity can't see (parity proves both engines agree; these prove
  * the agreed-on answer has the MATHEMATICAL shape the operator
  * advertises).
  */
class R13Spec extends AnyFunSuite with SparkFixture {

  test("Adamic-Adar pairs are same-side, ordered, hub-discounted") {
    val rows = SparkEntry.queries("q_graph_adamic_adar")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // supplier side = odd ids; canonical a < b; score monotone down the list
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a % 2 == 1 && b % 2 == 1 && a < b)
      assert(r.getLong(2) >= 1, "a scored pair needs >= 1 common neighbor")
    }
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.drop(1)).forall { case (x, y) => y <= x + 1e-12 },
      "top-20 must be non-increasing in score")
    // each common part has deg >= 2 => each term 1/ln(deg) <= 1/ln(2),
    // so score <= n_common / ln(2)
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getLong(2) / math.log(2.0) + 1e-9)
    }
  }

  test("local clustering coefficient lies in [0,1] and matches its parts") {
    val rows = SparkEntry.queries("q_graph_clustering_coeff")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri, lcc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(lcc >= 0.0 && lcc <= 1.0 + 1e-12, s"lcc out of range: $lcc")
      assert(tri <= deg * (deg - 1) / 2,
        "triangles cannot exceed neighbor pairs")
      if (deg >= 2)
        assert(math.abs(lcc - 2.0 * tri / (deg.toDouble * (deg - 1))) < 1e-12)
      else assert(lcc == 0.0)
    }
  }

  test("rolling distinct actives matches the naive definition on spot days") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_win_distinct_rolling")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val cd = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("c"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // brute-force count(distinct) over the trailing 30 days on a sample
    out.zipWithIndex.filter(_._2 % 97 == 0).map(_._1).foreach { r =>
      val (day, got) = (r.getInt(0), r.getLong(1))
      val want = cd.filter { case (_, d) => d >= day - 29 && d <= day }
        .map(_._1).distinct.length
      assert(got == want, s"day $day: sweep says $got, naive says $want")
    }
  }

  test("decomposition identity: residual = value - trend - seasonal") {
    val rows = SparkEntry.queries("q_time_decompose")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, t, sea, res) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(res == v.toDouble - t - sea,
        "residual must be the exact IEEE identity, not a re-derivation")
    }
  }

  test("cross-correlation is a valid Pearson r at every lag") {
    val rows = SparkEntry.queries("q_time_crosscorr")(spark, sfDir)
      .collect()
    assert(rows.length == 7)
    assert(rows.map(_.getInt(0)).toSeq == Seq(-3, -2, -1, 0, 1, 2, 3))
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val x = r.getDouble(2)
        assert(x >= -1.0 - 1e-12 && x <= 1.0 + 1e-12, s"r out of range: $x")
      }
      assert(r.getLong(1) >= 0)
    }
  }

  test("sequence pattern counts agree with a driver-side regex re-run") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_seq_pattern")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    // rebuild each user's sequence independently and re-count in plain Scala
    val seqs = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("cd"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3))))
      .groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).mkString
      }
    seqs.foreach { case (u, seq) =>
      val (n, vb, eb, lv) = out(u)
      assert(n == seq.length)
      assert(vb == "v+p".r.findAllIn(seq).size, s"user $u v+p in '$seq'")
      assert(eb == "ee+".r.findAllIn(seq).size, s"user $u ee+ in '$seq'")
      assert(lv == seq.takeWhile(_ == 'v').length)
    }
  }
}
