package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Llm, Windows}
import graft.sources.{SourcesSinks, Tables}

/** Semantic pins for the round-10 batch-6 operators. */
class R10Batch6Spec extends AnyFunSuite with SparkFixture {

  test("vwap: last cumulative row per flag equals the global ratio") {
    val rows = Windows.qWinVwap.fn(spark, sfDir).collect()
    val last = rows.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.maxBy(_.getTimestamp(1).getTime) }
    val totals = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        sum(col("l_quantity").cast("long") *
          expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    last.foreach { case (f, r) =>
      val (q, n) = totals(f)
      assert(r.getDouble(3) == n.toDouble / q.toDouble,
        s"flag $f: ${r.getDouble(3)} != $n/$q")
    }
  }

  test("bollinger: bands bracket the mid; σ matches brute force") {
    val rows = Windows.qWinBollinger.fn(spark, sfDir)
      .where(col("flag") === "A").orderBy("d").collect()
    val daily = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "A")
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum(expr("CAST(floor(l_extendedprice * CAST(100.0 AS DOUBLE) " +
        "+ CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("v"))
      .orderBy("d").collect().map(_.getLong(1))
    assert(rows.length == daily.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = daily.slice(math.max(0, i - 6), i + 1)
      val n = frame.length.toDouble
      assert(r.getLong(2) == frame.length)
      val mean = frame.sum.toDouble / n
      val svv = frame.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val sd = math.sqrt((svv / n - mean * mean) max 0.0)
      assert(math.abs(r.getDouble(3) - mean) <= 1e-6 * mean)
      assert(r.getDouble(4) <= r.getDouble(3) && r.getDouble(3) <=
        r.getDouble(5), s"row $i: bands do not bracket mid")
      val width = (r.getDouble(5) - r.getDouble(4)) / 4.0
      assert(math.abs(width - sd) <= 1e-6 * (sd + 1), s"row $i σ")
    }
  }

  test("active users: WAU bounded by DAU and trailing-7 DAU sum") {
    val rows = Windows.qActiveUsersRolling.fn(spark, sfDir)
      .orderBy("d").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val dauByIdx = rows.map(_._2)
    rows.zipWithIndex.foreach { case ((d, dau, wau), i) =>
      assert(wau >= dau, s"$d: wau $wau < dau $dau")
      // days may be sparse; the trailing-7 CALENDAR sum over present
      // days is still an upper bound on the 7-day distinct union
      val lo = math.max(0, i - 6)
      val calSum = (lo to i).filter { j =>
        val dj = rows(j)._1.toLocalDateTime.toLocalDate
        val di = d.toLocalDateTime.toLocalDate
        java.time.temporal.ChronoUnit.DAYS.between(dj, di) <= 6
      }.map(dauByIdx).sum
      assert(wau <= calSum, s"$d: wau $wau > window dau sum $calSum")
    }
    // brute-force one interior day
    val mid = rows(rows.length / 2)
    val d0 = mid._1.toLocalDateTime.toLocalDate
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("ud")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expect = users.filter { case (_, ud) =>
      val diff = java.time.temporal.ChronoUnit.DAYS.between(ud, d0)
      diff >= 0 && diff <= 6
    }.map(_._1).distinct.length
    assert(mid._3 == expect, s"${mid._1}: wau ${mid._3} != $expect")
  }

  test("cooccur: lift recomputes from the row's own exact counts") {
    val nd = Llm.qTextCooccur.fn(spark, sfDir) // force plan once
    val rows = nd.collect()
    assert(rows.length == 20)
    val nDocs = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"), col("doc_id"))
      .where(length(col("t")) > 0).select("doc_id").distinct().count()
    rows.foreach { r =>
      val (cab, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cab >= 5 && cab <= math.min(ca, cb))
      assert(r.getDouble(5) ==
        cab.toDouble * nDocs.toDouble / (ca.toDouble * cb.toDouble))
    }
  }

  test("merge-schema read null-fills exactly the absent epoch") {
    val got = SourcesSinks.qSourceMergeSchema.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val expect = Tables.part(spark, sfDir)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        count(when(col("p_partkey") % 2 === 1, lit(1))).as("n_odd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expect)
  }
}
