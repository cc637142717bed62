package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN crossover rehearsal at large N — the committed harness behind the
  * BASELINE.md "ANN crossover" tables (the r19 verdict's standing gap:
  * every embeddings axis topped out at 10⁴ vectors, where O(N²) brute
  * force trivially wins and the LSH/IVF walls said nothing about the
  * 100 TB regime; this runs the SAME library entry points at the
  * ScaleGenEmbed 10⁵ corpus where the crossover is observable).
  *
  * Measures, against one corpus directory:
  *  - brute-force cosine top-5 for 10 probes (Llm.qSimCosineTopk's plan)
  *    and the IVF probe search (Llm.ivfProbeTopk — cold wall includes
  *    the one-off index build, warm walls read the materialized
  *    cell-partitioned store), plus IVF recall@5 against the brute leg;
  *  - the brute-force near-dup pair TRUTH at threshold 0.95
  *    (Llm.cosineNearDupPairs — run ONCE; at 10⁵ vectors this is the
  *    5·10⁹-pair leg whose wall IS the crossover argument) — skippable
  *    via GRAFT_ANN_SKIP_BRUTE=1 for quick LSH-tuning iterations;
  *  - banded hyperplane LSH pairs at 0.95 (Llm.cosineAnnLshPairs) for
  *    each (bands, rows) shape in GRAFT_ANN_LSH (default "8x12,16x12"),
  *    warm min-of-2, with recall against the brute truth AND against
  *    the ScaleGenEmbed CONSTRUCTED truth (pairs sharing a base id —
  *    reported side by side so the construction itself is audited).
  *
  * Emits one JSON line (the Bench convention). Usage:
  *   runMain graft.AnnRehearsal <dir> [baseN]
  * where baseN is the pre-replication vector count (default 2000).
  */
object AnnRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val baseN = if (args.length > 1) args(1).toLong else 2000L
    val skipBrute = sys.env.get("GRAFT_ANN_SKIP_BRUTE").contains("1")
    val lshShapes = sys.env.getOrElse("GRAFT_ANN_LSH", "8x12,16x12")
      .split(",").toSeq.map { s =>
        val Array(b, r) = s.trim.split("x"); (b.toInt, r.toInt)
      }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.VectorFunctions.register(spark)

    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
    }
    val walls = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val recalls = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    val emb = graft.sources.Tables.embeddings(spark, dir)
    counts("n_vectors") = emb.count()

    // --- top-k family: brute baseline, then IVF cold (build) + warm ---
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bruteTop, wBrute1) = wall(
      topkSet(SparkEntry.queries("q_sim_cosine_topk")(spark, dir)))
    val (_, wBrute2) = wall(
      topkSet(SparkEntry.queries("q_sim_cosine_topk")(spark, dir)))
    walls("brute_topk_warm") = math.min(wBrute1, wBrute2)
    val (ivfCold, wIvfCold) = wall(
      topkSet(graft.operators.Llm.ivfProbeTopk(spark, dir)))
    val (ivfWarm, wIvf1) = wall(
      topkSet(graft.operators.Llm.ivfProbeTopk(spark, dir)))
    val (_, wIvf2) = wall(
      topkSet(graft.operators.Llm.ivfProbeTopk(spark, dir)))
    walls("ivf_topk_cold_with_build") = wIvfCold
    walls("ivf_topk_warm") = math.min(wIvf1, wIvf2)
    recalls("ivf_recall_at_5") =
      if (bruteTop.isEmpty) 1.0
      else math.round(1e4 * ivfWarm.intersect(bruteTop).size.toDouble /
        bruteTop.size) / 1e4
    require(ivfCold == ivfWarm, "IVF cold/warm result sets diverged")

    // --- pair family at the 0.95 dedup threshold ---
    // constructed truth (ScaleGenEmbed): pairs sharing a base id
    val ids = emb.select(col("vec_id"),
      pmod(col("vec_id"), lit(baseN)).as("base"))
    val truthConstructed = ids.toDF("a", "ba")
      .join(ids.toDF("b", "bb"), col("ba") === col("bb") &&
        col("a") < col("b"))
      .select("a", "b")
    counts("constructed_pairs") = truthConstructed.count()

    val bruteOut = s"$dir/_ann_brute_pairs_095"
    if (!skipBrute) {
      val (c, w) = wall {
        graft.operators.Llm.cosineNearDupPairs(emb, 0.95)
          .write.mode("overwrite").parquet(bruteOut)
        spark.read.parquet(bruteOut).count()
      }
      walls("brute_pairs_095_once") = w
      counts("brute_pairs_095") = c
    }
    val bruteTruth =
      if (new java.io.File(bruteOut).exists)
        Some(spark.read.parquet(bruteOut).select("a", "b"))
      else None
    bruteTruth.foreach { bt =>
      counts("brute_pairs_095") = bt.count()
      // construction audit: the brute 0.95 set should BE the
      // intra-cluster set (eps margin) — report both directions
      recalls("constructed_vs_brute") = math.round(
        1e4 * bt.intersect(truthConstructed).count().toDouble /
          math.max(1L, counts("brute_pairs_095"))) / 1e4
    }

    for ((bands, rows) <- lshShapes) {
      val tag = s"lsh_${bands}x$rows"
      def run() = graft.operators.Llm
        .cosineAnnLshPairs(emb, 0.95, bands, rows)
      val (c1, w1) = wall(run().count())
      val (_, w2) = wall(run().count())
      walls(s"${tag}_warm") = math.min(w1, w2)
      counts(s"${tag}_pairs") = c1
      val found = run().select("a", "b")
      val truth = bruteTruth.getOrElse(truthConstructed)
      val truthN = bruteTruth.map(_ => counts("brute_pairs_095"))
        .getOrElse(counts("constructed_pairs"))
      recalls(s"${tag}_recall") =
        if (truthN == 0) 1.0
        else math.round(1e4 * found.intersect(truth).count().toDouble /
          truthN) / 1e4
    }

    def j(m: scala.collection.Map[String, Any]): String =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"ann_rehearsal","dir":"$dir",""" +
      s""""walls_sec":${j(walls)},"counts":${j(counts)},""" +
      s""""recalls":${j(recalls)}}""")
    spark.stop()
  }
}
