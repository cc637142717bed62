package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Llm, Relational, Windows}

/** Semantic pins for the round-9 operators — properties the DuckDB hash
  * match can't see (it proves engine agreement, not that the agreed-on
  * answer means what the operator claims).
  */
class Round9Spec extends AnyFunSuite with SparkFixture {

  test("chunking reproduces hand-computed slices and loses no tail tokens") {
    val chunks = Llm.qTextChunk.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet, "a doc produced no chunks")
    docs.take(1000).foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val expect = (0 to (toks.length - 1) / 24).map { i =>
        toks.slice(i * 24, i * 24 + 32).mkString(" ")
      }
      val got = chunks(id).sortBy(_._2).map(_._4).toSeq
      assert(got == expect, s"doc $id chunks differ from hand slices")
      // stride < width ⇒ the final token of the doc is in the last chunk
      assert(got.last.split(" ", -1).last == toks.last)
    }
  }

  test("linear interp: observed days pass through; gap values bracketed") {
    val rows = Windows.qTimeInterpLinear.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))
    assert(rows.count(_._4) > 0 && rows.count(!_._4) > 0)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      val obsIdx = s.zipWithIndex.collect { case ((_, _, Some(_), true), i) => i }
      s.zipWithIndex.foreach {
        case ((_, _, Some(v), false), i) =>
          val prev = obsIdx.filter(_ < i).maxOption
          val next = obsIdx.filter(_ > i).minOption
          assert(prev.isDefined && next.isDefined,
            "interpolated value without brackets on both sides")
          val (a, b) = (s(prev.get)._3.get, s(next.get)._3.get)
          assert(v >= math.min(a, b) - 1e-6 && v <= math.max(a, b) + 1e-6,
            s"gap value $v outside bracket [$a, $b]")
        case ((_, _, None, false), i) =>
          // leading/trailing gaps only: no bracket on at least one side
          assert(obsIdx.forall(_ > i) || obsIdx.forall(_ < i),
            "interior gap left NULL")
        case _ => ()
      }
    }
  }

  test("cdc apply matches a replay computed independently in Scala") {
    val log = graft.sources.Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
    val lastOp = log.groupBy(_._1).map { case (k, evs) =>
      val (_, _, seq, price) = evs.maxBy(e => (e._2, e._3))
      k -> (seq % 10 == 0, math.round(price * 100))
    }
    val base = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val expect = base.groupBy(_._2).map { case (seg, rs) =>
      val st = rs.map { case (k, _, bal) =>
        lastOp.get(k) match {
          case Some((true, _))   => ("delete", 0L)
          case Some((false, nb)) => ("update", nb)
          case None              => ("carry", bal)
        }
      }
      seg -> (rs.length.toLong,
        st.count(_._1 == "delete").toLong,
        st.count(_._1 == "update").toLong,
        st.filter(_._1 != "delete").map(_._2).sum)
    }
    val got = Relational.qCdcApply.fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect, s"replay mismatch: got $got expected $expect")
  }

  test("bm25 top-20: positive non-increasing scores, every doc matches a term") {
    val top = Llm.qTextBm25.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length == 20)
    assert(top.forall(_._2 > 0))
    assert(top.sliding(2).forall(p => p.head._2 >= p.last._2))
    val matching = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .filter(r => r.getString(1).split(" ")
        .exists(Set("join", "window", "scan")))
      .map(_.getLong(0)).toSet
    top.foreach { case (id, _) =>
      assert(matching(id), s"doc $id in top-20 contains no query term") }
  }

  test("rrf fuses the published ranks exactly and prefers dual-listed docs") {
    val rows = Llm.qSearchRrf.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, ra, rb, rrf) =>
      assert(ra.nonEmpty || rb.nonEmpty)
      (ra ++ rb).foreach(r => assert(r >= 1 && r <= 50))
      val expect = BigDecimal(
        ra.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          rb.map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect) < 2e-6,
        s"doc $id rrf $rrf != recomputed $expect")
    }
    // a doc ranked #1 by both systems must beat any single-system doc
    val dual = rows.filter(r => r._2.nonEmpty && r._3.nonEmpty).map(_._4)
    val single = rows.filter(r => r._2.isEmpty || r._3.isEmpty).map(_._4)
    if (dual.nonEmpty && single.nonEmpty)
      assert(dual.max >= single.max)
  }

  test("substr spans: fractions in [0,1], coverage bounded, duplication found") {
    val rows = Llm.qDedupSubstrSpans.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, cov, frac) =>
      assert(cov >= 0 && cov <= n, s"doc $id coverage $cov outside [0,$n]")
      assert(math.abs(frac - cov.toDouble / n) < 1e-12)
    }
    assert(rows.exists(_._4 > 0), "no duplicated span found — fixture changed?")
    assert(rows.exists(_._4 < 1), "every doc fully duplicated?")
  }
}
