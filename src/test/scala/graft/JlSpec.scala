package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Llm
import graft.sources.Tables

/** The Johnson–Lindenstrauss CONTRACT, not just the arithmetic (the t2
  * oracle certifies the arithmetic): a sign-matrix projection 64 → 16 must
  * approximately preserve pairwise squared distances — E[‖Px−Py‖²] =
  * ‖x−y‖², concentration within (1±ε) for most pairs at k=16.
  */
class JlSpec extends AnyFunSuite with SparkFixture {

  test("projection preserves pairwise squared distances within JL bounds") {
    val proj = Llm.qEmbedProjectJl.fn(spark, sfDir)
    val pCols = (0 until 16).map(j => f"p$j%02d")
    val projected = proj.collect().map { r =>
      r.getLong(0) -> pCols.map(c => r.getAs[Double](c)).toArray
    }.toMap
    val orig = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 200)
      .collect().map { r =>
        r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray
      }.toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(40)
    val ratios = for {
      i <- ids.indices; k <- (i + 1) until ids.size
      o = d2(orig(ids(i)), orig(ids(k))) if o > 0
    } yield d2(projected(ids(i)), projected(ids(k))) / o
    assert(ratios.nonEmpty)
    // unbiasedness: the mean ratio concentrates near 1
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean distance ratio $mean")
    // concentration: ratio std ≈ √(2/k) ≈ 0.35 at k=16, so (1±0.6) is
    // ~1.7σ → expect ~85–90% inside for a sign matrix (measured 88.8% on
    // the fixtures)
    val inside = ratios.count(r => r > 0.4 && r < 1.6).toDouble / ratios.size
    assert(inside > 0.85, s"only ${inside * 100}%% of pairs inside (1±0.6)")
  }

  test("projection is a pure codegen row map: no shuffle in the plan") {
    val p = Llm.qEmbedProjectJl.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the presentation sort's range partition
    assert(!p.contains("hashpartitioning"),
      "JL projection must not shuffle")
  }
}
