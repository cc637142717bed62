package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Llm
import graft.sources.Tables

/** Int8 scalar quantization contract: codes stay in [0, 255], per-component
  * reconstruction error stays within step/2, round trip is value-stable.
  */
class QuantizeSpec extends AnyFunSuite with SparkFixture {

  test("codes in [0,255]; reconstruction error bounded by step/2") {
    val q = Llm.quantizeEmbeddings(Tables.embeddings(spark, sfDir)).cache()
    try {
      val codeRange = q.agg(min("code"), max("code")).first()
      assert(codeRange.getInt(0) >= 0 && codeRange.getInt(1) <= 255)
      // err <= step/2 (+1 ulp headroom for the divide/round float path)
      val viol = q.where(col("err") > col("step") * 0.5 * (1 + 1e-9)).count()
      assert(viol == 0, s"$viol components exceed the step/2 bound")
    } finally q.unpersist()
  }

  test("extreme values quantize exactly: mn -> code 0, mx -> code 255") {
    val q = Llm.quantizeEmbeddings(Tables.embeddings(spark, sfDir))
      .where(col("step") > 0)
    assert(q.where(col("x") === col("mn") && col("code") =!= 0)
      .count() == 0)
    assert(q.where(col("x") === col("mx") && col("code") =!= 255)
      .count() == 0)
  }

  test("quantized top-5 recalls >= 0.8 of the exact top-5 per probe") {
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("vec_id"))
        .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).toSet }
    val exact = topSets(Llm.qSimCosineTopk.fn(spark, sfDir))
    val quant = topSets(Llm.qSimCosineQuantized.fn(spark, sfDir))
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (p, ex) =>
      quant(p).intersect(ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean quantized recall $mean < 0.8")
  }

  test("per-label audit query: one row per label, errors non-negative") {
    val rows = Llm.qEmbedQuantize.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("max_abs_err") >= 0.0)
      assert(r.getAs[Double]("avg_abs_err") <= r.getAs[Double]("max_abs_err"))
    }
  }
}
