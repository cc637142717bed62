package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Windows}

/** Semantic pins for the round-8 sequence/statistics operators — the
  * properties the DuckDB hash-compare can't state directly (hand-computed
  * expectations, order-constraint counterexamples, robustness contracts).
  */
class SeqOpsSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("EWMA matches the hand-computed lag-chain on a known sequence") {
    val rows = Windows.qWinEwma.fn(spark, sfDir)
      .orderBy("user_id", "event_id").collect()
    assert(rows.nonEmpty)
    // re-derive per user from the raw events: ewma_i over values v_i =
    // (v + .5 v-1 + .25 v-2 + .125 v-3 + .0625 v-4) / (present weights)
    val raw = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
      .orderBy("user_id", "ts", "event_id").collect()
      .groupBy(_.getLong(0))
    val expect = raw.flatMap { case (u, evs) =>
      val vs = evs.map(_.getDouble(3))
      evs.indices.map { i =>
        val ws = Seq(1.0, 0.5, 0.25, 0.125, 0.0625)
        val avail = (0 to math.min(4, i))
        val num = avail.foldLeft(0.0)((acc, k) => acc + ws(k) * vs(i - k))
        val den = avail.foldLeft(0.0)((acc, k) => acc + ws(k))
        (u, evs(i).getLong(1)) -> num / den
      }
    }
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val e = expect(k)
      assert(math.abs(r.getDouble(2) - e) < 1e-9,
        s"ewma mismatch at $k: got ${r.getDouble(2)}, expected $e")
    }
  }

  test("funnel enforces event ORDER, not mere presence") {
    val s = spark
    import s.implicits._
    // user 1 does view->click->purchase; user 2 purchases BEFORE clicking
    // (same event types present — a presence-only funnel would count both)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, ""),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0, ""),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 5.0, ""),
      (4L, ts("2024-01-01 09:00:00"), 2L, "purchase", 5.0, ""),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view", 0.0, ""),
      (6L, ts("2024-01-01 09:40:00"), 2L, "click", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the parquet fixture path would need ns-timestamp re-encoding for
    // Tables.events; the ordering semantics under test live in the
    // stage-chained aggregation, so run that logic directly on the frame
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("vt"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") >= col("vt"))
      .groupBy("user_id").agg(min(col("ts")).as("ct"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") >= col("ct"))
      .groupBy("user_id").agg(min(col("ts")).as("pt"))
    assert(v.count() == 2 && c.count() == 2,
      "both users viewed then clicked in order")
    val purchasers = p.select("user_id").collect().map(_.getLong(0)).toSet
    assert(purchasers == Set(1L),
      "user 2's purchase precedes their click and must not count")
  }

  test("MAD is robust to an outlier that moves max far more than the median") {
    val rows = Aggregates.qAggMad.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getDouble(1)
      val mad = r.getDouble(2)
      assert(mad >= 0 && mad < med,
        s"MAD $mad should be a small fraction of the median $med for " +
          "broad price data")
    }
  }

  test("kNN distances are exact integers and ranks are contiguous") {
    val rows = operators.Relational.qJoinKnn.fn(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length % 3 == 0)
    rows.foreach { r =>
      val d = r.getDouble(2)
      assert(d == math.rint(d), s"dist2 $d must be an exact integer")
    }
    rows.groupBy(_.get(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
      // ranks must be ordered by distance
      val byRank = g.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted)
    }
  }

  test("OHLC: open/close come from the temporal extremes of each bar") {
    val bars = Aggregates.qTimeOhlc.fn(spark, sfDir).limit(50).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (h, l) = (r.getLong(5), r.getLong(6))
      val (o, c) = (r.getLong(3), r.getLong(4))
      assert(l <= o && o <= h && l <= c && c <= h,
        "open/close must lie within [low, high]")
      if (r.getLong(2) == 1) assert(o == c && o == h && h == l,
        "single-trade bar collapses to one price")
    }
  }
}
