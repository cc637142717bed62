package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Llm

/** The hot-bucket guard in LSH candidate generation: a degenerate band key
  * (thousands of identical vectors → one bucket) must be DROPPED, not
  * expanded into its quadratic pair set — that expansion is the 100 TB
  * compute-death mode of banded LSH.
  */
class LshGuardSpec extends AnyFunSuite with SparkFixture {

  test("degenerate bucket above the cap is dropped; normal pairs survive") {
    val s = TestSpark.spark
    import s.implicits._
    val dims = 64
    // MaxBucket + 6 copies of one direction → every band bucket holding
    // them exceeds the cap (4096) and must be dropped pre-expansion.
    val hot = (0 until Llm.MaxBucket + 6).map { i =>
      (i.toLong, Array.fill(dims)(1.0f))
    }
    // one near-dup pair in a different direction (cosine 1.0): its buckets
    // have 2 elements and must survive the cap
    val base = Array.tabulate(dims)(d => if (d % 2 == 0) 1.0f else -1.0f)
    val pair = Seq(
      (900000L, base),
      (900001L, base.map(_ * 2.0f)))
    val emb = (hot ++ pair).toDF("vec_id", "embedding")
    val out = Llm.cosineAnnLshPairs(emb, 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out.contains((900000L, 900001L)),
      "near-dup pair in a small bucket was lost")
    assert(!out.exists { case (a, b) => a < 900000L && b < 900000L },
      "degenerate hot bucket leaked candidate pairs past the cap")
  }

  test("candidate pairs are unique by construction (first-collision only)") {
    val s = TestSpark.spark
    import s.implicits._
    // a clique of 5 identical-direction vectors collides in EVERY band;
    // each pair must still be emitted exactly once
    val base = Array.tabulate(64)(d => (d + 1).toFloat)
    val emb = (0 until 5).map(i => (i.toLong, base.map(_ * (i + 1))))
      .toDF("vec_id", "embedding")
    val rows = Llm.cosineAnnLshPairs(emb, 0.4)
      .select("a", "b").as[(Long, Long)].collect()
    assert(rows.length == rows.distinct.length, "duplicate candidate pairs")
    assert(rows.length == 10, s"expected all 10 clique pairs, got ${rows.length}")
  }
}
