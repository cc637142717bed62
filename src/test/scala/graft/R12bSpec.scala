package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.sources.Tables

/** Round-12 second-batch pins: the Bloom runtime-filter join's exactness,
  * selectivity, and plan shape — the properties the DuckDB hash parity
  * can't see (parity proves result ≡ plain join; these prove the Bloom
  * actually filters and the joins take the intended physical forms).
  */
class R12bSpec extends AnyFunSuite with SparkFixture {

  private def simplePlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)

  test("bloom prefilter keeps every true-match line (no false negatives)") {
    val li = Tables.lineitem(spark, sfDir)
    val urgentKeys = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val trueMatches = li.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val passed = Relational.bloomPrefilteredLines(spark, sfDir)
    val passedTrue = passed.join(urgentKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(passedTrue === trueMatches,
      "Bloom dropped true-match rows — impossible by construction; " +
        "the hash seeds differ between build and probe")
  }

  test("bloom prefilter actually filters (passes < full fact side)") {
    val full = Tables.lineitem(spark, sfDir).count()
    val passed = Relational.bloomPrefilteredLines(spark, sfDir).count()
    // ~20% of lines match an urgent order; fpp adds a few percent. Anything
    // above half the table means the filter degenerated (m too small for n).
    assert(passed < full / 2,
      s"Bloom passed $passed of $full rows — filter is degenerate")
    assert(passed > 0L)
  }

  test("bloom query result is identical to the plain join aggregate") {
    val viaBloom = SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("m")
      .collect().map(_.toSeq).toSeq
    assert(viaBloom === plain)
  }

  test("q_join_dpp plants a dynamic pruning expression on the fact scan") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sfDir)
    df.count() // materialize the partitioned store + run once
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("dynamicpruningexpression"),
      s"expected a dynamicpruningexpression PartitionFilter on the " +
        s"partitioned orders scan:\n$p")
  }

  test("bloom word-table joins broadcast; final join is shuffle-merge") {
    val p = simplePlan(
      SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj === 3,
      s"expected 3 broadcast word-table probes, found $bhj in:\n$p")
    assert(p.contains("SortMergeJoin"),
      "final fact join must stay a shuffle-merge (the non-broadcastable-" +
        s"dim regime the operator models):\n$p")
  }
}
