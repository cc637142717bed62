package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 pins: BPE merge-application semantics (q_bpe_encode's fold),
  * beyond the DuckDB hash parity the driver already checks.
  */
class R12Spec extends AnyFunSuite with SparkFixture {

  private def encode(tokens: Seq[String], merges: Seq[String]): String = {
    val s = spark
    import s.implicits._
    val df = Seq((tokens, merges)).toDF("toks", "merges")
      .withColumn("s0",
        concat(lit("["), array_join(col("toks"), "]["), lit("]")))
      .withColumn("e", graft.operators.Llm.bpeFold("s0", "merges"))
      .select(expr("trim(BOTH '[]' FROM replace(e, '][', ' '))"))
    df.collect()(0).getString(0)
  }

  test("adjacent run merges greedily leftmost-first (even run)") {
    assert(encode(Seq("a", "a", "a", "a"), Seq("a|a")) === "aa aa")
  }

  test("odd run leaves a trailing singleton (BPE greedy semantics)") {
    assert(encode(Seq("a", "a", "a"), Seq("a|a")) === "aa a")
  }

  test("rules apply in rank order; later rule sees earlier rule's output") {
    // rank 1 builds 'thecat'; rank 2 references the merged surface form
    assert(encode(Seq("the", "cat", "sat"), Seq("the|cat", "thecat|sat"))
      === "thecatsat")
    // reversed priority: 'thecat|sat' finds nothing before 'the|cat' runs
    assert(encode(Seq("the", "cat", "sat"), Seq("thecat|sat", "the|cat"))
      === "thecat sat")
  }

  test("no cross-token substring matches (delimiters carry boundaries)") {
    // 'a b' must not match inside 'aa bb'
    assert(encode(Seq("aa", "bb"), Seq("a|b")) === "aa bb")
  }

  test("token counts drop by exactly the number of applied merges") {
    val out = encode(Seq("x", "y", "x", "y", "z"), Seq("x|y"))
    assert(out === "xy xy z")
  }
}
