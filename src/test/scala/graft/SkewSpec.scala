package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Tables

/** Salting must be a pure partitioning change: row-identical results. */
class SkewSpec extends AnyFunSuite with SparkFixture {

  test("salted inner join equals plain inner join") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedInnerJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("t2 q_join_inner_salted is row-identical to q_join_inner") {
    val salted = Skew.qJoinInnerSalted.fn(spark, sfDir)
    val plain = graft.operators.Relational.qJoinInner.fn(spark, sfDir)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey")
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_orderkey")).as("s"))
    val salted = Skew.saltedSumAgg(li, "l_returnflag", "l_orderkey", 8, "s")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("hot-key fixture: salted join matches AQE join, AQE splits the skew") {
    // non-uniform evidence for the salting story: a lineitem variant where
    // ONE order key owns ~20% of all rows (every 5th key collapsed onto
    // the smallest), materialized in the session temp root like any other
    // fixture. Both mitigation paths must return row-identical joins, and
    // AQE — with thresholds scaled to test data — must actually split the
    // hot partition at runtime.
    val s = spark
    val hotKey = Tables.orders(s, sfDir)
      .agg(min(col("o_orderkey"))).first().getLong(0)
    val out = graft.sources.SourcesSinks.sessionTempDir(s)
      .resolve("lineitem_hotkey").toString
    Tables.lineitem(s, sfDir)
      .withColumn("l_orderkey",
        when(col("l_orderkey") % 5 === 0, lit(hotKey))
          .otherwise(col("l_orderkey")))
      .write.mode("overwrite").parquet(out)
    // AQE splits a skewed reduce partition by MAPPER ranges — a tiny
    // fixture scanned as one task has one mapper and nothing to split, so
    // spread the scan over several mappers first (at real scale the file
    // count does this naturally)
    val skewed = s.read.parquet(out).repartition(8)
    val share = skewed.where(col("l_orderkey") === hotKey).count().toDouble /
      skewed.count()
    assert(share > 0.15, f"fixture lost its skew: hot key owns $share%.2f")
    val dim = Tables.orders(s, sfDir).select("o_orderkey", "o_orderpriority")
    val confs = Seq(
      // sf0.001's hot partition is ~10KB of shuffle bytes — thresholds
      // scale down with the fixture (at real scale the defaults apply)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val plain = skewed.join(dim, col("l_orderkey") === col("o_orderkey"))
      // execute THIS df (not a derived .count plan): AQE re-plans from
      // runtime shuffle statistics, so the skew split is only visible on
      // the executed queryExecution
      plain.collect()
      val ep = plain.queryExecution.executedPlan.toString
      assert(ep.contains("skew=true"),
        s"AQE did not mark the hot-key join as skewed:\n${ep.take(1200)}")
      val salted =
        Skew.saltedInnerJoin(skewed, dim, "l_orderkey", "o_orderkey", 8)
      assert(salted.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(salted).count() == 0)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("hot-key fixture: salted agg equals plain agg, two-phase below the wire") {
    // the aggregation-path counterpart of the hot-key join fixture: one
    // group key owning ~20% of all rows must not serialize into a single
    // reducer. saltedSumAgg's first shuffle keys on (key, salt), spreading
    // the hot group over `salts` partitions; exact integer sums make the
    // two-phase result bit-identical to the plain groupBy.
    val s = spark
    val hotKey = Tables.orders(s, sfDir)
      .agg(min(col("o_orderkey"))).first().getLong(0)
    val skewed = Tables.lineitem(s, sfDir)
      .withColumn("l_orderkey",
        when(col("l_orderkey") % 5 === 0, lit(hotKey))
          .otherwise(col("l_orderkey")))
      .select("l_orderkey", "l_linenumber")
    val share = skewed.where(col("l_orderkey") === hotKey).count().toDouble /
      skewed.count()
    assert(share > 0.15, f"fixture lost its skew: hot key owns $share%.2f")
    val plain = skewed.groupBy("l_orderkey")
      .agg(sum(col("l_linenumber")).as("s"))
    val salted = Skew.saltedSumAgg(skewed, "l_orderkey", "l_linenumber", 8, "s")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the partial-agg evidence: both phases (salted partial and final)
    // keep their map-side combine, so the hot key crosses each wire
    // pre-reduced — 2 hash exchanges, >= 4 HashAggregate nodes
    val sp = salted.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert("Exchange hashpartitioning".r.findAllIn(sp).size == 2,
      s"expected the (key,salt) + key exchanges only:\n$sp")
    assert("HashAggregate".r.findAllIn(sp).size >= 4,
      s"partial+final must survive at BOTH phases:\n$sp")
    // and the hot key genuinely spreads: its rows land in >1 salt bucket
    val buckets = skewed.where(col("l_orderkey") === hotKey)
      .withColumn("_salt",
        pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets > 1, "hot key collapsed into one salt bucket")
  }

  test("salt actually spreads a hot key over multiple partitions") {
    val li = Tables.lineitem(spark, sfDir)
    val salts = li.withColumn("_salt",
        pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*), lit(8)))
      .where(col("l_returnflag") === "N")
      .select("_salt").distinct().count()
    assert(salts > 1, "hot key landed in a single salt bucket")
  }
}
