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

  test("ER blocking elects exactly one in-block best match per name") {
    val rows = SparkEntry.queries("q_er_blocking")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getString(0))
    assert(names.distinct.length == names.length,
      "best-match election must be unique per name")
    def blk(s: String) = "[a-z]+$".r.findFirstIn(s).getOrElse("")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { r =>
      val (n, m, dst) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(n != m, "a name cannot match itself")
      assert(blk(n) == blk(m), "match must come from the same block")
      assert(dst >= 1 && dst <= 4, s"distance $dst outside (0, 4]")
      assert(lev(n, m).toLong == dst,
        s"reported distance must be the exact edit distance for $n/$m")
    }
  }

  test("LOO target encoding is leakage-free and within (0, 1)") {
    val rows = SparkEntry.queries("q_feature_target_encode")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // rebuild category sufficient stats from the output itself
    val byNat = rows.groupBy(_.getInt(1)).map { case (nat, rs) =>
      nat -> (rs.map(_.getLong(2)).sum, rs.length.toLong)
    }
    val sg = rows.map(_.getLong(2)).sum.toDouble
    val ng = rows.length.toDouble
    // NOTE: output rows ARE the full fact set (every order scored), so
    // the rebuilt stats equal the operator's own. P is the global prior.
    val p = sg / ng
    rows.foreach { r =>
      val (nat, y, enc) = (r.getInt(1), r.getLong(2), r.getDouble(3))
      val (sc, nc) = byNat(nat)
      val want = ((sc - y).toDouble + 10.0 * p) / (nc - 1 + 10).toDouble
      assert(math.abs(enc - want) < 1e-12,
        s"nat $nat: enc $enc != LOO m-estimate $want")
      assert(enc > 0.0 && enc < 1.0, s"m-smoothed rate out of (0,1): $enc")
      // leakage-free: flipping this row's own label must move enc
      val leaky = (sc.toDouble + 10.0 * p) / (nc + 10).toDouble
      assert(enc != leaky || y == 0,
        "positive rows must not see their own label")
    }
  }

  test("SAX symbols respect breakpoints and z is a valid PAA z-score") {
    val rows = SparkEntry.queries("q_time_sax")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      val segs = rs.map(_.getInt(1)).sorted
      assert(segs.head >= 0 && segs.last <= 15,
        s"flag $flag: segment ids outside [0,15]")
      assert(segs.distinct.length == segs.length)
      // weighted mean of segment z-scores is 0: sum(nseg * z) = 0
      val wsum = rs.collect {
        case r if !r.isNullAt(3) => r.getLong(2) * r.getDouble(3)
      }.sum
      assert(math.abs(wsum) < 1e-6,
        s"flag $flag: PAA z-scores must be centered, got $wsum")
    }
    rows.foreach { r =>
      if (r.isNullAt(3)) assert(r.isNullAt(4),
        "zero-variance guard must null z and sym together")
      else {
        val (z, sym) = (r.getDouble(3), r.getString(4))
        val want =
          if (z < -0.6745) "a" else if (z < 0.0) "b"
          else if (z < 0.6745) "c" else "d"
        assert(sym == want, s"z=$z mapped to '$sym', expected '$want'")
      }
    }
  }

  test("bigram perplexity: H >= 0 and only held-out docs are scored") {
    val rows = SparkEntry.queries("q_text_perplexity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "scored docs need at least one bigram")
      val h = r.getDouble(2)
      assert(h >= 0.0, s"cross-entropy must be non-negative, got $h")
      assert(!h.isNaN && !h.isInfinite)
    }
    // the 80/20 hash split: scored docs are a strict minority subset
    val total = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.length < total / 2,
      "held-out split must be the ~20% side of the hash split")
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
