package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The `spark.sql(...)` entry point over registered fixture views: SQL text
  * and the DataFrame API must land on the same Catalyst plans and the same
  * results — a user of the engine can drive it entirely from SQL.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkFixture {

  test("registered views answer a multi-table SQL join identically to the API") {
    Tables.createViews(spark, sfDir)
    val sql = spark.sql(
      """SELECT n.n_name, count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin).collect().toSeq
    import org.apache.spark.sql.functions._
    val api = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_orders"))
      .orderBy("n_name").collect().toSeq
    assert(sql == api)
  }

  test("events view carries the ns-aware timestamp semantics into SQL") {
    Tables.createViews(spark, sfDir)
    val r = spark.sql(
      "SELECT min(ts) AS mn, max(ts) AS mx, count(*) AS n FROM events")
      .collect().head
    assert(r.getAs[java.sql.Timestamp]("mn").getTime > 0L)
    assert(r.getAs[Long]("n") > 0L)
  }

  test("SQL over views still prunes and pushes down to the parquet scan") {
    Tables.createViews(spark, sfDir)
    val p = spark.sql(
      "SELECT l_orderkey FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-01-01'")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "view indirection must not block parquet filter pushdown")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_shipdate:timestamp>"), "view must not widen the scan")
  }
}
