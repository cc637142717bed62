package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Llm
import graft.operators.{Aggregates, Layout, Relational, Windows}
import graft.functions.Sketches

/** Output must not depend on the parallelism it was computed with — the
  * property that lets the same query run on local[4] and a 1000-executor
  * cluster and hash-match. Each query runs under three different
  * spark.sql.shuffle.partitions settings (including a prime, so no bucket
  * boundary alignment can mask a dependency) and must produce identical
  * rows. toJSON canonicalizes nested arrays/structs/binary for comparison.
  *
  * qSimCosineIvf is the load-bearing member: KMeans aggregates centroid
  * sums in partition order, so this is the direct evidence that seed-fixed
  * KMeans at this scale yields partition-count-independent centroids (and
  * hence cell assignments and final top-k).
  */
class ParitySpec extends AnyFunSuite with SparkFixture {

  private val parallelisms = Seq("3", "7", "16")

  private def runAt(q: Q, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try q.fn(spark, sfDir).toJSON.collect().toSeq.sorted
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def assertParity(q: Q): Unit = {
    val runs = parallelisms.map(p => p -> runAt(q, p))
    val (refP, ref) = runs.head
    assert(ref.nonEmpty, s"${q.name} returned no rows")
    runs.tail.foreach { case (p, rows) =>
      assert(rows == ref,
        s"${q.name}: output at shuffle.partitions=$p differs from $refP " +
          s"(first diff: ${rows.zipAll(ref, "<missing>", "<missing>")
            .find { case (a, b) => a != b }})")
    }
  }

  for (q <- Seq(
      Llm.qSimCosineIvf,
      Llm.qSimCosineAnnLsh,
      Llm.qEmbedCentroids,
      Llm.qDedupClusters,
      Llm.qDedupMinhashLsh,
      Llm.qDedupSimhash,
      Llm.qTextTfidfTop,
      Llm.qTextFingerprint,
      Aggregates.qAggPercentile,
      Aggregates.qAggCorr,
      Aggregates.qAggMode,
      Windows.qTopkGlobal,
      // round 6: contraction CC (iterative joins), CMS certification
      // (sketch merge order), quantized re-rank (per-dim min/max aggs),
      // forward fill (window over left join)
      Llm.qDedupClustersBigstar,
      Llm.qSimCosineQuantized,
      Sketches.qSketchHeavyHitters,
      Windows.qWinGapFill,
      // round 7: contamination (two-join fan-in on shingles), grid spatial
      // join (cell replication), incremental merge (partial→final states),
      // z-order (range partitioner sampling must not leak into VALUES)
      Llm.qContamination,
      Relational.qGeoGridJoin,
      Aggregates.qAggIncrMerge,
      Layout.qLayoutZorder,
      Llm.qSampleStratified,
      streaming.StreamQueries.qStreamAnomaly,
      Llm.qCorpusPack,
      // round 8: iterated Dec-sum PageRank (per-partition decimal partials),
      // sessionization (two stacked windows + agg), entropy (ln + Dec12),
      // Gini (window rank feeding exact products)
      Relational.qGraphPagerank,
      Windows.qSessionStats,
      Llm.qTextEntropy,
      Aggregates.qAggGini,
      // round 9: semdedup (Dec12 centroid + broadcast cosine + max/min
      // prototype resolution), BM25 + RRF (ln scores, Dec12 term sums,
      // rank fusion), linear interp (4 window fns over a left join),
      // substr spans (shingle groupBy feeding window islands)
      Llm.qEmbedSemdedup,
      Llm.qTextBm25,
      Llm.qSearchRrf,
      Windows.qTimeInterpLinear,
      Llm.qDedupSubstrSpans,
      // round 10: rolling median (per-frame array sort), drawdown
      // (running max − Det sum), A/B lift (distinct-count Expand feeding
      // an IEEE chain incl. sqrt), Markov (window lead + normalization
      // division), weighted median (integer cumsum pick), proration
      // (integer div/mod + remainder rank), centroid ratio (Dec sums per
      // axis), floor-quantized RRF already above
      Windows.qWinRollingMedian,
      Windows.qWinDrawdown,
      Aggregates.qAbLift,
      Windows.qMarkovTransitions,
      Aggregates.qAggWeightedMedian,
      Relational.qAllocProration,
      graft.sources.SourcesSinks.qGeoCentroidWeighted))
    test(s"${q.name} output is identical at shuffle.partitions = " +
        parallelisms.mkString("/")) {
      assertParity(q)
    }
}
