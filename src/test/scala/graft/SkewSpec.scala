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

  test("salt actually spreads a hot key over multiple partitions") {
    val li = Tables.lineitem(spark, sfDir)
    val salts = li.withColumn("_salt",
        pmod(xxhash64(li.columns.map(col).toIndexedSeq: _*), lit(8)))
      .where(col("l_returnflag") === "N")
      .select("_salt").distinct().count()
    assert(salts > 1, "hot key landed in a single salt bucket")
  }
}
