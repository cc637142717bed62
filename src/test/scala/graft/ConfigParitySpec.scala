package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Aggregates, Llm, Relational, Windows}

/** Results must not depend on the EXECUTION knobs that differ across real
  * clusters: AQE (runtime re-planning), the auto-broadcast threshold (plan
  * selection), and whole-stage codegen (interpreted vs generated
  * evaluation). Each config flip re-runs representative queries — joins,
  * windowed dedup, decimal/double aggregation, LSH dedup, z-scores — and
  * demands byte-identical rows vs the default config. A diff here means an
  * operator leaked plan- or evaluation-strategy-dependence into its VALUES,
  * which would surface as silent corruption on any differently-tuned
  * cluster.
  */
class ConfigParitySpec extends AnyFunSuite with SparkFixture {

  private val queries = Seq(
    Relational.qJoinMultiwayStar,
    Relational.qGeoGridJoin,
    Windows.qWinRownumDedupe,
    Aggregates.qAggIncrMerge,
    Llm.qDedupMinhashLsh,
    graft.streaming.StreamQueries.qStreamAnomaly,
    // the most delicate float paths: shared-formula IEEE chains (EWMA,
    // Gini), iterated Dec12 sums (PageRank), ln + Dec12 (entropy) — a
    // codegen/interpreted or plan-shape value difference here is exactly
    // the silent-corruption class this spec exists for
    Windows.qWinEwma,
    Relational.qGraphPagerank,
    Llm.qTextEntropy,
    Aggregates.qAggGini,
    // round 10 float paths: the A/B z chain (divisions + sqrt over
    // distinct counts) and the frame-array rolling median — both must
    // survive codegen/AQE/broadcast/ANSI flips value-identically
    Aggregates.qAbLift,
    Windows.qWinRollingMedian,
    // r11 (verdict #8): the real-codec decode paths (mapPartitions batch
    // shape + ImageIO/AudioSystem byte handling must not vary with plan
    // strategy) and the RRF rounding path (floor-quantized fused scores)
    graft.operators.Multimodal.qMultimodalDecode,
    graft.operators.Multimodal.qMultimodalAudioDecode,
    Llm.qSearchRrf,
    // r11 Prefix rewrites: three-bucket rank decomposition + ntile replay
    // and the Dec(26,12) two-phase cumsum must be plan-strategy-invariant
    Aggregates.qRfmSegments,
    Windows.qWinParetoAbc)

  private def runWith(confs: (String, String)*)(q: Q): Seq[String] = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try q.fn(spark, sfDir).toJSON.collect().toSeq.sorted
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val variants: Seq[(String, Seq[(String, String)])] = Seq(
    "AQE disabled" -> Seq("spark.sql.adaptive.enabled" -> "false"),
    "auto-broadcast disabled" ->
      Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
    "whole-stage codegen disabled" ->
      Seq("spark.sql.codegen.wholeStage" -> "false"),
    // Spark 4 defaults ANSI on; a cluster still running ansi=false must
    // get the same VALUES — our arithmetic never relies on ANSI-vs-legacy
    // overflow/cast behavior (exact cents, bounded products, no silent
    // wraparound in range)
    "ANSI mode disabled" -> Seq("spark.sql.ansi.enabled" -> "false"))

  for (q <- queries; (label, confs) <- variants)
    test(s"${q.name} values are identical with $label") {
      val ref = runWith()(q)
      assert(ref.nonEmpty, s"${q.name} returned no rows")
      assert(runWith(confs: _*)(q) == ref)
    }
}
