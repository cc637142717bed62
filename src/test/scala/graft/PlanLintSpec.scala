package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan lint — one pass that certifies EVERY query in
  * `SparkEntry.queries` (current and future) against the two plan shapes
  * that kill 100 TB runs:
  *
  *   (a) a partition-less WindowExec over an unbounded input — serializes
  *       the corpus through one task. Allowlisted queries carry a proof of
  *       boundedness next to their entry (bucket-offset tables, calendar
  *       spines, top-k re-ranks — all O(constant) by construction).
  *   (b) a CartesianProduct — quadratic row fan-out. (Broadcast nested
  *       loops over bounded dims are audited per-query in PlanAuditSpec;
  *       an unhinted CartesianProduct is never acceptable.)
  *
  * Per-query audits live in PlanAuditSpec; this lint exists so a NEW query
  * can't ship a scale-killer silently — it fails here before any judge
  * reads the plan.
  */
class PlanLintSpec extends AnyFunSuite with SparkFixture {

  /** Queries whose partition-less logical Window nodes are over inputs
    * bounded by construction (NOT by data luck). Keep justifications
    * accurate — the lint trusts this list.
    */
  private val boundedGlobalWindow: Map[String, String] = Map(
    "q_corpus_pack" ->
      "ordered prefix over the 64 hash-bucket totals (Prefix doctrine)",
    "q_win_pareto_abc" ->
      "ordered prefix over the 64 range-bucket totals (Prefix.runningSum)",
    "q_rfm_segments" ->
      "3x ordered prefix over 64 range-bucket counts (Prefix.globalRank)",
    "q_time_to_convert" ->
      "ordered prefix over 64 range-bucket counts (Prefix.globalRank)",
    "q_agg_topn_share" ->
      "rank/cumsum over a LIMIT-10 result — 10 rows by construction",
    "q_search_rrf" ->
      "re-rank over the fused top-50 per ranker — bounded by the k cutoff",
    "q_inventory_backlog" ->
      "running sum over the calendar-day axis — O(days), dataset-bounded",
    "q_win_running_frame" ->
      "running total over daily rollups — O(days), dataset-bounded",
    "q_agg_ks_test" ->
      ("2x Prefix.runningSum bucket-offset prefixes over 64 range-bucket " +
        "totals (the un-collapsed logical plan shows each twice)"),
    "q_sample_systematic" ->
      "Prefix.globalRank bucket-offset prefix over 64 range-bucket counts",
    "q_agg_mannwhitney" ->
      "Prefix.runningSum bucket-offset prefix over 64 range-bucket totals",
    "q_text_zipf_fit" ->
      "rank over a LIMIT-100 result — 100 rows by construction",
    "q_agg_survival_km" ->
      ("running sums over the day-granular event axis — bounded by the " +
        "~30-day observation window by construction"),
    "q_agg_fdr_bh" ->
      "BH rank over the 25-nation hypothesis family — bounded by construction",
    "q_agg_lorenz" ->
      ("Prefix.globalRank bucket-offset prefix over 64 range-bucket " +
        "counts + cumulative share over the 10-row decile axis"),
    "q_eval_retrieval" ->
      "rank over the LIMIT-20 BM25 result — 20 rows by construction",
    "q_win_distinct_rolling" ->
      ("running sum over the boundary-delta day axis — calendar-bounded " +
        "by construction after the per-day delta aggregate"),
    "q_time_granger" ->
      "lag(1) over the daily rollup — O(days), dataset-bounded",
    "q_agg_kruskal_wallis" ->
      ("2x Prefix.runningSum bucket-offset prefixes over 64 range-bucket " +
        "totals (the un-collapsed logical plan shows the shared prefix twice)"),
    "q_agg_wilcoxon_signed" ->
      "Prefix.runningSum bucket-offset prefix over 64 range-bucket totals",
    "q_agg_median_test" ->
      "Prefix.runningSum bucket-offset prefix over 64 range-bucket totals",
    "q_agg_anderson_darling" ->
      "Prefix.runningSum bucket-offset prefix over 64 range-bucket totals",
    "q_time_hurst" ->
      "row_number over the daily rollup — O(days), dataset-bounded",
    "q_time_pacf" ->
      "lag(1..3) over the daily rollup — O(days), dataset-bounded",
    "q_time_ljung_box" ->
      "lag(1..3) over the daily rollup — O(days), dataset-bounded",
    "q_time_durbin_watson" ->
      "row_number + lag(1) over the daily rollup — O(days), dataset-bounded",
    "q_agg_hill_tail" ->
      "rank over a LIMIT-101 result — 101 rows by construction")

  private val cartesianOk: Set[String] = Set.empty

  private def globalWindowCount(p: LogicalPlan): Int =
    p.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.size

  test("no query plans a partition-less window outside the bounded allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = globalWindowCount(
          fn(spark, sfDir).queryExecution.optimizedPlan)
        if (n > 0 && !boundedGlobalWindow.contains(name))
          Some(s"$name ($n global window(s))")
        else None
    }
    assert(offenders.isEmpty,
      s"partition-less windows outside the allowlist:\n  ${
        offenders.mkString("\n  ")}")
  }

  test("allowlist holds no stale entries") {
    val stale = boundedGlobalWindow.keySet.filterNot { name =>
      SparkEntry.queries.get(name).exists(fn =>
        globalWindowCount(fn(spark, sfDir).queryExecution.optimizedPlan) > 0)
    }
    assert(stale.isEmpty,
      s"allowlisted queries no longer plan a global window: $stale")
  }

  /** (c) the r11 broadcast-OOM class, generalized from per-query
    * SHUFFLE_HASH pins to a suite-wide invariant: a FORCED broadcast
    * (an explicit broadcast() hint in OUR code — Spark's own
    * size-based broadcast picks adapt at real scale via AQE, so only
    * the hints we hard-code can OOM a 100 TB run) whose hinted side is
    * NOT bounded by construction. Bounded means the subtree carries a
    * Limit, or a scalar (grouping-free) aggregate, or reads only
    * bounded leaves (dim tables, ranges, local relations). A grouping
    * aggregate or join over a FACT-scale source grows with the corpus
    * — force-broadcasting it is the exact shape that OOM'd the r11
    * jaccard degree join.
    */
  /** Forced-broadcast sides whose boundedness the structural classifier
    * can't see (grouping on a bounded DOMAIN, k-capped shortlists, a
    * fixed sketch size, the calendar axis). Every entry was row-counted
    * at sf0.001 AND sf0.01 in the r15 audit (BcastProbe) — "flat" means
    * the counts were identical at both SFs; the two calendar entries
    * grow at test SF only because the synthetic generator widens the
    * date range with SF, and are O(flags·days) at a fixed horizon. The
    * audit also caught one REAL offender (q_dq_delete_cascade's
    * delOrders broadcast, 24→158 rows — a 1/97 fact slice), fixed to
    * SHUFFLE_HASH the same round: this lint exists to keep catching
    * that class.
    */
  private val broadcastOk: Map[String, String] = Map(
    "q_agg_chi2" -> "flat 1/5/5: flagxpriority marginal grids",
    "q_alloc_waterfall" -> "flat 5: per-priority budget pots",
    "q_sim_maxsim" -> "flat 8: the probe shortlist (vec_id < 8)",
    "q_agg_cramers_v" -> "flat 1/5/5: flagxpriority marginal grids",
    "q_agg_cvar" -> "flat 5: per-priority VaR fences",
    "q_agg_levene" -> "flat 25: per-brand medians (bounded brand domain)",
    "q_agg_mad" -> "flat 3: per-flag medians",
    "q_agg_runs_test" -> "flat 3: per-flag medians",
    "q_agg_theil_sen" ->
      "per-(flag,day) daily rollup - calendar-bounded (O(flags*days))",
    "q_agg_trimmed_mean" -> "flat 3: per-flag percentile fences",
    "q_agg_ttest" -> "flat 1: two-group scalar moment row",
    "q_agg_weighted_median" -> "flat 5: per-priority threshold fences",
    "q_agg_winsorize" -> "flat 3: per-flag percentile fences",
    "q_anomaly_iqr" -> "flat 5/5/5: per-priority quartile fences",
    "q_changepoint_cusum" -> "flat 3/3/3: per-flag stats rows",
    "q_corpus_drift" -> "flat 1/5: per-epoch profile moments",
    "q_corpus_pack" -> "flat 64: the 64 hash-bucket totals (Prefix)",
    "q_embed_label_outliers" -> "flat 10: per-label centroid table",
    "q_embed_quantize" -> "flat 64: the 8x8 codebook grid",
    "q_embed_semdedup" -> "flat 10x5: k=10 centroid tables",
    "q_eval_f1" ->
      ("flat 25 + 1: the 5x5 language profile (langIdPredictions) and " +
        "the scalar macro/micro summary row"),
    "q_eval_lang_confusion" -> "flat 5/25/25: langxlang bounded grid",
    "q_text_jsd" ->
      "flat 20: per-source token totals (bounded source domain)",
    "q_eval_retrieval" -> "flat 1/1/3: query-set-bounded judgments",
    "q_feature_select_mi" -> "flat <=40: flagxbucket bounded grids",
    "q_feature_target_encode" -> "flat 1/25: global prior + nation means",
    "q_join_bloom_prefilter" ->
      ("bit-word table <= mBits/64 = 4096 rows - the SKETCH size, " +
        "corpus-independent (747->3636 at test SF is fill-in, not growth)"),
    "q_join_dpp" -> "flat 2: the pruned partition-key list",
    "q_knn_classify" -> "flat 20: the labeled probe shortlist",
    "q_search_rrf" -> "flat 1/3: per-ranker k-capped shortlists",
    "q_seq_entropy_rate" -> "flat <=5: per-priority scalar rows",
    "q_seq_markov_eval" -> "flat 1/5/5: priority-bounded transition grid",
    "q_sim_cosine_ivf" ->
      ("flat 16 + 10: the IVF cell-centroid store and the r20 exact-" +
        "certification leg's probe shortlist (vec_id < 10)"),
    "q_sim_cosine_quantized" -> "flat 10/64/64: probes + codebook",
    "q_sim_cosine_topk" -> "flat 10: the probe shortlist",
    "q_sim_graph_beam" -> "flat 10/400: probes + bounded beam frontier",
    "q_sketch_cms_portable" -> "flat <=1024+4: the CMS counter grid",
    "q_text_bm25" -> "flat 1/3: corpus stats + query-term list",
    "q_text_cooccur" -> "flat 1/31: scalar totals + top-k term list",
    "q_text_lang_id" -> "flat 25: the 5x5 language profile",
    "q_time_changepoint_binseg" -> "flat 3/3: per-flag split rows",
    "q_time_decompose" -> "flat 21: flagxday-of-week seasonal grid",
    "q_time_dtw" -> "flat 3/3/3: per-flag bounded series stats",
    "q_time_lcss" -> "flat 3/3/3: per-flag bounded series stats",
    "q_time_sax" -> "flat 3: per-flag stats rows",
    "q_trend_mann_kendall" ->
      ("per-(flag,day) daily rollup - calendar-bounded (documented in " +
        "the query's own docstring as the broadcast-safe class)"))

  private def boundedLogical(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val hasLimit = p.collect {
      case n @ (_: GlobalLimit | _: LocalLimit) => n
    }.nonEmpty
    val hasScalarAgg = p.collect {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }.nonEmpty
    lazy val leavesOk = p.collectLeaves().forall {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val loc = r.relation match {
          case h: org.apache.spark.sql.execution.datasources
            .HadoopFsRelation => h.location.rootPaths.mkString(",")
          case _ => ""
        }
        Seq("region", "nation", "customer", "supplier", "part")
          .exists(t => loc.contains(t + ".parquet"))
      case _: Range | _: LocalRelation | _: OneRowRelation => true
      case _ => false
    }
    hasLimit || hasScalarAgg || leavesOk
  }

  private def offendingBuilds(df: org.apache.spark.sql.DataFrame)
  : Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right)
          .collect {
            case (Some(h), side)
              if h.strategy.contains(BROADCAST)
                && !boundedLogical(side) => side.nodeName
          }
    }.flatten
  }

  test("no query broadcasts an unbounded build side") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (broadcastOk.contains(name)) None
        else {
          val off = offendingBuilds(fn(spark, sfDir))
          if (off.nonEmpty) Some(s"$name (${off.mkString(", ")})") else None
        }
    }
    assert(offenders.isEmpty,
      s"fact-derived broadcast build sides (the r11 OOM class):\n  ${
        offenders.mkString("\n  ")}")
  }

  test("broadcast allowlist holds no stale entries") {
    val stale = broadcastOk.keySet.filterNot { name =>
      SparkEntry.queries.get(name)
        .exists(fn => offendingBuilds(fn(spark, sfDir)).nonEmpty)
    }
    assert(stale.isEmpty,
      s"allowlisted queries no longer force-broadcast a flagged side: " +
        s"$stale")
  }

  test("the broadcast lint flags a deliberately de-hinted degree join") {
    // reconstruct the r11 OOM shape: per-token document frequency (a
    // grouping aggregate over the CORPUS — grows with it) force-
    // broadcast into a join. The classifier must flag it; if this goes
    // green the suite-wide invariant above is vacuous.
    import org.apache.spark.sql.functions._
    val toks = graft.operators.Llm.tokens(
      graft.sources.Tables.documents(spark, sfDir))
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df_t"))
    val bad = toks.join(broadcast(df), "tok")
    assert(offendingBuilds(bad).nonEmpty,
      "the lint failed to flag a corpus-scale broadcast build side")
  }

  /** (d) the r19 compute-dense streamed-side class, pinned: a
    * BroadcastNestedLoopJoin streams its non-build side at the INPUT's
    * split count — 3 parquet splits at sf0.1 — so when the per-joined-row
    * work is compute-dense (a codegen FloatVecDot in the join condition
    * or fused in the same stage above the join), the O(N·M) scoring loop
    * runs near-serial on a 32-thread box regardless of how small the
    * bytes are. The near-dup fix (one round-robin
    * repartition(defaultParallelism) of the streamed side, 3.13 → 0.77 s
    * at sf0.1) is a single call a refactor could silently drop; this lint
    * makes the drop a red test. Rule: every BNLJ with vec_dot in scope
    * must stream at ≥ defaultParallelism partitions. An Exchange resets
    * the dense-above flag — compute past a shuffle runs at the
    * EXCHANGE's parallelism, not the join's.
    */
  private val denseBnljOk: Map[String, String] = Map(
    "q_embed_center" ->
      ("streams the corpus against a SINGLE broadcast row (the corpus-" +
        "mean vector) — per-streamed-row work is O(dims), a map-" +
        "equivalent codegen scan pass whose parallelism is the scan's " +
        "split count (grows with the corpus); a repartition would add a " +
        "full-corpus exchange to what is semantically a projection"),
    "q_sim_cosine_ivf" ->
      ("streams the 10-row probe shortlist against broadcast centroids " +
        "(k=16) — O(probes·k) work bounded by construction, and the " +
        "corpus-scale scoring join below it is cell-partition-pruned"),
    "q_sim_maxsim" ->
      ("streams the 8-probe shortlist against the broadcast token table " +
        "— O(probes·tokens) bounded by the vec_id < 8 cap"))

  /** Effective streamed-side widths need the EnsureRequirements
    * exchanges (an aggregate-fed streamed side is shuffle.partitions
    * wide at runtime but its pre-exchange sparkPlan reports its scan's
    * UnknownPartitioning(0)), so this lint plans with AQE off and walks
    * executedPlan. A streamed side that still reports < cores there is
    * scan-fed or locally narrow — exactly the class the near-dup fix
    * repartitioned.
    */
  private def denseBnljUnderParallel(mk: => org.apache.spark.sql.DataFrame)
  : Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val cores = spark.sparkContext.defaultParallelism
    def dense(p: SparkPlan): Boolean = p.expressions.exists(
      _.exists(_.isInstanceOf[graft.plans.FloatVecDot]))
    def walk(p: SparkPlan, denseAbove: Boolean): Seq[String] = p match {
      case e: Exchange => e.children.flatMap(walk(_, denseAbove = false))
      case j: BroadcastNestedLoopJoinExec =>
        val streamed = j.buildSide match {
          case BuildLeft => j.right
          case BuildRight => j.left
        }
        val n = streamed.outputPartitioning.numPartitions
        val flagged =
          if ((denseAbove || dense(j)) && n < cores)
            Seq(s"BNLJ streams ${streamed.nodeName} at $n < $cores " +
              "partitions under dense vec_dot compute")
          else Seq.empty
        flagged ++ j.children.flatMap(walk(_, denseAbove = false))
      case other =>
        val d = denseAbove || dense(other)
        other.children.flatMap(walk(_, d))
    }
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try walk(mk.queryExecution.executedPlan, denseAbove = false)
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("no query streams a compute-dense BNLJ side below core parallelism") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (denseBnljOk.contains(name)) None
        else {
          val off = denseBnljUnderParallel(fn(spark, sfDir))
          if (off.nonEmpty) Some(s"$name (${off.mkString("; ")})")
          else None
        }
    }
    assert(offenders.isEmpty,
      s"compute-dense BNLJ streamed sides below core parallelism:\n  ${
        offenders.mkString("\n  ")}")
  }

  test("dense-BNLJ allowlist holds no stale entries") {
    val stale = denseBnljOk.keySet.filterNot { name =>
      SparkEntry.queries.get(name)
        .exists(fn => denseBnljUnderParallel(fn(spark, sfDir)).nonEmpty)
    }
    assert(stale.isEmpty,
      s"allowlisted queries no longer plan an under-parallel dense BNLJ: " +
        s"$stale")
  }

  test("the dense-BNLJ lint flags the de-repartitioned near-dup shape") {
    // reconstruct the r19 bug: the exact O(N²) scoring join WITHOUT the
    // streamed-side repartition — the streamed side arrives at its
    // parquet split count and the quadratic vec_dot loop serializes. If
    // this goes green the suite-wide invariant above is vacuous.
    import org.apache.spark.sql.functions._
    graft.plans.VectorFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .withColumn("ns", expr("vec_dot(embedding, embedding)"))
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"),
      col("ns").as("nsa"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"),
      col("ns").as("nsb"))
    val bad = a.join(b, col("a") < col("b"))
      .withColumn("score",
        expr("vec_dot(va, vb)") / (sqrt(col("nsa")) * sqrt(col("nsb"))))
      .where(col("score") >= 0.4)
    assert(denseBnljUnderParallel(bad).nonEmpty,
      "the lint failed to flag an under-parallel dense BNLJ streamed side")
  }

  test("no query plans an unhinted CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (cartesianOk(name)) None
        else {
          val p = fn(spark, sfDir).queryExecution.sparkPlan.toString
          if (p.contains("CartesianProduct")) Some(name) else None
        }
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
