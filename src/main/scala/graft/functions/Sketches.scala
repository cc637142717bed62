package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import graft.Q

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

  /** The t2 heavy-hitters query: top-20 tokens by exact count, with every
    * surviving row CERTIFIED by the Count-Min sketch — each candidate must
    * satisfy exact ≤ estimate ≤ exact + ⌈eps·N⌉ (the CMS contract; N from
    * the sketch's own totalCount) or it is dropped and the DuckDB oracle —
    * which outputs the plain exact top-20 — catches the loss. That makes
    * the sketch estimate driver-visible and oracle-constrained even though
    * DuckDB cannot compute the sketch itself (the tight eps·N accuracy
    * bound stays in SketchesSpec). Deterministic: fixed seed, fixed corpus,
    * count-then-token total order.
    *
    * Scale posture: the sketch is a fixed-size mergeable summary built in
    * one pass (partials merge, no raw-token shuffle); the exact top-20 is
    * one groupBy + TakeOrderedAndProject; the estimate UDF runs over
    * exactly 20 rows against the broadcast sketch. At 100 TB the exact
    * groupBy is the expensive truth path — the production shape keeps only
    * the sketch and queries it directly, which Sketches.estimate models.
    */
  val qSketchHeavyHitters = Q(
    "q_sketch_heavy_hitters",
    (s, dir) => {
      val eps = 0.001
      val toks = graft.operators.Llm.tokens(
        graft.sources.Tables.documents(s, dir))
      val cms = countMinOver(toks, "tok", eps = eps)
      val maxErr = math.ceil(eps * cms.totalCount()).toLong
      val bc = s.sparkContext.broadcast(cms)
      val estimateTok = udf((t: String) => bc.value.estimateCount(t))
      toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(20)
        .withColumn("n_cms", estimateTok(col("tok")))
        .where(col("n_cms") >= col("n_exact") &&
          col("n_cms") <= col("n_exact") + lit(maxErr))
        .select("tok", "n_exact")
        .orderBy(col("n_exact").desc, col("tok"))
    },
    Some("""SELECT tok, count(*) AS n_exact
            FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
            GROUP BY tok
            ORDER BY n_exact DESC, tok LIMIT 20"""))

  val all: Seq[Q] = Seq(qSketchHeavyHitters)
}
