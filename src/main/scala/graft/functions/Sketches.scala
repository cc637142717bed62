package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch surface beyond HLL (q_agg_approx_distinct): Count-Min heavy
  * hitters. At 100 TB a per-token exact count is a full shuffle of the
  * token stream; a CMS is a fixed-size mergeable summary built with one
  * pass and no shuffle of raw tokens (partial sketches merge on the
  * driver/reducer). Spark ships the implementation
  * (org.apache.spark.util.sketch); this wires it to the engine's token
  * stream and is accuracy-tested against exact counts.
  */
object Sketches {

  /** Build a CMS over a string column. eps: relative error vs total count;
    * confidence: probability the bound holds. Deterministic for a fixed
    * seed.
    */
  def countMinOver(df: DataFrame, column: String, eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(column, eps, confidence, seed)

  /** Estimated frequencies for the given items. */
  def estimate(cms: CountMinSketch, items: Seq[String]): Map[String, Long] =
    items.map(i => i -> cms.estimateCount(i)).toMap
}
