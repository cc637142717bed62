package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Llm, Relational, Windows}
import graft.sources.Tables

/** Semantic pins for the round-10 batch-5 operators — invariants the
  * DuckDB hash match can't express (brute-force equivalence, conservation
  * laws, set-membership of selected elements).
  */
class R10Batch5Spec extends AnyFunSuite with SparkFixture {

  private val centsFml =
    "CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE) " +
      "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"

  test("regression matches brute-force least squares per brand") {
    val got = Aggregates.qAggRegression.fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").cast("long"),
        expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE) " +
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._2).sum.toDouble
      val sy = rs.map(_._3).sum.toDouble
      val sxy = rs.map(r => r._2 * r._3).sum.toDouble
      val sxx = rs.map(r => r._2 * r._2).sum.toDouble
      val syy = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble
      val (dxy, dxx, dyy) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      val (gn, gs, gi, gr2) = got(brand)
      assert(gn == rs.length)
      val slope = dxy / dxx
      assert(math.abs(gs - slope) <= 1e-9 * math.abs(slope),
        s"$brand slope $gs vs $slope")
      val icept = (sy - slope * sx) / n
      assert(math.abs(gi - icept) <= 1e-9 * math.abs(icept),
        s"$brand icept $gi vs $icept")
      val r2 = dxy * dxy / (dxx * dyy)
      assert(math.abs(gr2 - r2) <= 1e-9, s"$brand r2 $gr2 vs $r2")
    }
  }

  test("HHI matches brute force and sits in (0, 10000]") {
    val got = Aggregates.qAggHhi.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val firm = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(sum(expr(centsFml)).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    firm.groupBy(_._1).foreach { case (seg, rs) =>
      val revs = rs.map(r => BigInt(r._2))
      val tot = revs.sum.toDouble
      val hhi = 10000.0 * revs.map(r => r * r).sum.toDouble / (tot * tot)
      val (nf, gh) = got(seg)
      assert(nf == rs.length)
      assert(gh > 0.0 && gh <= 10000.0)
      assert(math.abs(gh - hhi) <= 1e-9 * hhi, s"$seg: $gh vs $hhi")
    }
    // equal shares floor: HHI ≥ 10000/n_firms for every segment
    got.foreach { case (seg, (nf, h)) =>
      assert(h >= 10000.0 / nf - 1e-9, s"$seg below equal-share floor")
    }
  }

  test("IQR fences: quartiles are elements, censuses match brute force") {
    val got = Aggregates.qAnomalyIqr.fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), expr(centsFml), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    vals.groupBy(_._1).foreach { case (pri, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(identity).map(_._1)
      val n = sorted.length
      val q1 = sorted(((n + 3) / 4 - 1).toInt)
      val q3 = sorted(((3 * n + 3) / 4 - 1).toInt)
      val nLow = sorted.count(v => 2 * v < 5 * q1 - 3 * q3)
      val nHigh = sorted.count(v => 2 * v > 5 * q3 - 3 * q1)
      assert(got(pri) == ((n.toLong, q1, q3, nLow.toLong, nHigh.toLong)),
        s"$pri: got ${got(pri)} want ($n,$q1,$q3,$nLow,$nHigh)")
      assert(sorted.contains(q1) && sorted.contains(q3))
    }
  }

  test("snapshot diff conserves keys and classifies consistently") {
    val d = Relational.qSnapshotDiff.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"))
    val inA = orders.where(col("o_orderdate") < lit("1997-01-01"))
    val aKeys = inA.select("o_orderkey")
    // removed = keys in A hit by the modular delete
    val removed = aKeys.where(col("o_orderkey") % 11 === 0).count()
    // added = post-cutoff keys that survive the delete
    val added = orders.where(col("o_orderdate") >= lit("1997-01-01") &&
      col("o_orderkey") % 11 =!= 0).count()
    // changed = surviving A keys whose status differs after the rewrite
    val changed = inA.where(col("o_orderkey") % 11 =!= 0 &&
      col("o_orderkey") % 7 === 0 && col("o_orderstatus") =!= "P").count()
    assert(d("removed")._1 == removed)
    assert(d("added")._1 == added)
    assert(d("changed")._1 == changed)
    val total = d.values.map(_._1).sum
    // every key of A ∪ B classified exactly once
    val union = orders.where(col("o_orderdate") < lit("1997-01-01") ||
      col("o_orderkey") % 11 =!= 0).count()
    assert(total == union, s"$total classified vs $union in union")
  }

  test("containment: inter bounded by set sizes; flagged pairs verified " +
    "against exact shingle sets") {
    val rows = Llm.qDedupContainment.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter <= math.min(na, nb))
      assert(10 * inter >= 9 * math.min(na, nb))
      assert(r.getDouble(5) == inter.toDouble / na)
      assert(r.getDouble(6) == inter.toDouble / nb)
    }
    // exact re-check of the first 5 flagged pairs via Scala set algebra
    val ids = rows.take(5).flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val sets = Llm.shingleSets(Tables.documents(spark, sfDir)
        .where(col("doc_id").isin(ids.toSeq: _*)))
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    rows.take(5).foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val inter = (sets(a) & sets(b)).size
      assert(r.getLong(2) == inter && r.getLong(3) == sets(a).size &&
        r.getLong(4) == sets(b).size)
    }
  }

  test("interarrival: gaps nonnegative and count to events minus users") {
    val got = Windows.qInterarrival.fn(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getLong(3) >= 0L, "negative gap — ts order violated")
      assert(r.getLong(3) <= r.getLong(4))
      assert(r.getDouble(2) >= r.getLong(3).toDouble &&
        r.getDouble(2) <= r.getLong(4).toDouble)
    }
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(got.map(_.getLong(1)).sum == expected)
  }
}
