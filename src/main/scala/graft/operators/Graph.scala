package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — public algorithm, re-expressed on
  * DataFrames). Converges in O(log n) rounds REGARDLESS of component
  * diameter, which is the scale-robust complement to q_dedup_clusters'
  * min-label propagation (diameter-bounded — ideal for clique-shaped
  * near-dup clusters, pathological for chain-shaped graphs; the
  * propagation loop `require`s convergence and points here).
  *
  * Each round is two groupBy-join passes over the CURRENT edge set — no
  * collect_set arrays (a 100 TB star center would OOM an array-per-node
  * formulation; the min is computed with a plain two-phase min agg), no
  * driver-side graph. Edges only ever point "downhill" toward smaller
  * ids, so the edge count never exceeds the input after canonicalization
  * and the fixpoint is exactly the star graph (node → component min).
  * Deterministic by construction: min is order-independent, the fixpoint
  * is unique, so the result hash-matches a recursive-CTE oracle.
  */
object Graph {

  /** Release the executor blocks behind a SUPERSEDED localCheckpoint'd
    * frame. localCheckpoint truncates lineage, so its blocks are the ONLY
    * copy of the data — this must be called exclusively on frames that
    * will never be executed again (the previous round of a driver loop),
    * never on the frame a caller will consume. Without this, every round
    * of every iterative query leaves its full intermediate edge/label
    * table pinned in the block manager for the rest of the JVM's life
    * (ContextCleaner only reclaims on GC of the weak ref), which taxes
    * everything that runs after the graph family in a long session.
    */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Order-independent (count, hash-xor) witness of a canonical edge set —
    * one scalar aggregate per round, same policy as the propagation loop's
    * monotone label sum (no row-level old-vs-new diff). bit_xor, not sum:
    * xor is order-independent AND cannot overflow under ANSI mode (a long
    * sum of xxhash64 values throws ARITHMETIC_OVERFLOW on the 3rd row).
    * The set is distinct by construction, so xor cancellation of repeated
    * rows cannot occur.
    */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      bit_xor(xxhash64(col("a"), col("b")))).first()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star round: every node's strictly-LARGER neighbors re-attach to
    * the min of its closed neighborhood (computed by symmetrizing then one
    * min agg + one join — never a per-node neighbor array).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b"))).distinct()
    val m = sym.groupBy("a").agg(min(col("b")).as("mb"))
      .select(col("a"), least(col("a"), col("mb")).as("m"))
    sym.join(m, "a").where(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star round: orient edges downhill (bigger → smaller), then every
    * node's smaller neighbors and the node itself re-attach to its min
    * neighbor. Output stays in canonical downhill orientation.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct()
    val m = or.groupBy("a").agg(min(col("b")).as("m"))
    or.join(m, "a")
      .select(col("b").as("a"), col("m").as("b"))
      .where(col("a") =!= col("b"))
      .union(m.select(col("a"), col("m").as("b")))
      .distinct()
  }

  /** Connected components of the undirected graph given by `edges` (two
    * numeric/orderable columns named `a`, `b`; duplicates and self-loops
    * tolerated). Returns (node, component) for every endpoint, component =
    * min node id of its component. `maxRounds` is a safety cap far above
    * the O(log n) need; non-convergence raises instead of returning wrong
    * labels.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val nodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct()
    var e = edges.where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct()
      // localCheckpoint each round: 2 joins + 2 distincts per round would
      // otherwise stack a lineage Catalyst re-analyzes from scratch every
      // iteration (planning time grows superlinearly by round 10+).
      // LAZY checkpoint + the checksum action that follows = ONE Spark
      // job per round (materialize-and-witness fused); the eager form
      // spent a second full job per round just to persist blocks the
      // checksum was about to read anyway — at small-graph scale
      // (dbscan's grid cells) per-round job overhead WAS the wall.
      .localCheckpoint(false)
    var prev = checksum(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val cs = checksum(next)
      if (cs == prev && e.exceptAll(next).isEmpty) {
        // The count component of the checksum is exact, so equal checksums
        // mean equal cardinalities; a ~2^-64 xor collision is the only way
        // two DIFFERENT sets could land here — and it would end iteration
        // with wrong labels and no loud failure. One exact set-difference
        // on the (checkpointed, shrunken) fixpoint edge set per run makes
        // that failure mode impossible at negligible cost: a detected
        // collision is treated as ordinary non-convergence (fall through to
        // the else and keep iterating), not an abort — the very case the
        // guard exists for must recover, and the maxRounds cap still
        // bounds a pathological repeat.
        release(next) // next ≡ e as sets; e carries on into the labels plan
        converged = true
      } else { release(e); e = next; prev = cs; round += 1 }
    }
    require(converged,
      s"large-star/small-star did not converge in $maxRounds rounds " +
        "(cap is far above the O(log n) bound — inspect the edge input)")
    // fixpoint IS the star graph: every non-min node points at its
    // component min; min nodes appear only as targets → label themselves.
    // The min agg is a no-op on a true star — kept so a node can never
    // fan out rows even if the fixpoint invariant were ever violated.
    val labels = e.groupBy(col("a")).agg(min(col("b")).as("component"))
      .withColumnRenamed("a", "node")
    nodes.join(labels, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }

  /** Fixed-iteration PageRank over an undirected graph given as a
    * canonical (a < b, distinct) edge list — the centrality measure a
    * curation pipeline uses to weight authoritative sources (and the
    * classic iterative-dataflow stress test). r₀ = 1/N;
    * rᵢ₊₁(v) = (1−d)/N + d·Σ rᵢ(u)/deg(u) over neighbors u.
    *
    * Determinism doctrine: the per-neighbor contribution r/deg is one IEEE
    * division, but the Σ over in-neighbors is a shuffle aggregation whose
    * double order is engine-internal — so contributions go through the
    * Dec12 cast (exact, order-free sum; same boundary-safety argument as
    * davg12) and the final affine step is shared formula text. Each
    * iteration is one join + one two-phase agg over (edges ⋈ ranks); the
    * rank table is O(nodes) and re-shuffles on the same key every round —
    * on a cluster, pre-partition both sides on the node key so iterations
    * are exchange-free. Iterations are a PLAN (no driver-side loop state),
    * so `iters` must stay small (3–5) or lineage needs checkpointing —
    * callers wanting convergence should localCheckpoint between rounds.
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val e = edges.toDF("a", "b")
    // materialize the (static) adjacency and degree tables once —
    // otherwise every iteration's lazy plan re-runs the upstream
    // scan+distinct per join side (measured 11 s → 3 s at sf0.1); same
    // localCheckpoint policy as connectedComponents. These two blocks
    // live as long as the RETURNED plan (it reads them lazily), so this
    // convenience wrapper is for small/test graphs — the production path
    // is pageRankIterate over Bucketing.ensureBucketed parquet tables
    // (q_graph_pagerank), which pins no executor blocks at all
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst").localCheckpoint(true)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    pageRankIterate(und, deg, iters, damping)
  }

  /** Iteration core over a PRE-BUILT undirected adjacency (`und`: both
    * orientations as (src, dst)) and degree table (`deg`: (src, deg)).
    * Split from [[pageRank]] so callers can materialize the static graph
    * tables through `graft.sources.Incremental` — at 100 TB the
    * scan+distinct+symmetrize graph build is a write-path job keyed by the
    * input dir, and the query pays iteration cost only. Values are
    * identical either way: the tables hold exact integers/longs, so a
    * parquet round trip cannot perturb the Dec12 iteration arithmetic.
    */
  def pageRankIterate(und: DataFrame, deg: DataFrame, iters: Int,
                      damping: Double = 0.85): DataFrame = {
    val nodes = deg.select(col("src").as("node"), col("deg"))
    val nN = nodes.count().toDouble
    // empty graph: 1/N would raise under ANSI — the rank table is empty
    // either way, so return it directly (empty-partition robustness)
    if (nN == 0) return nodes.select(col("node"), lit(0.0).as("r"))
    var ranks = nodes.withColumn("r", lit(1.0) / lit(nN))
    for (_ <- 0 until iters) {
      val contrib = und
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("r") / col("deg").cast("double")).as("c"))
      val summed = contrib.groupBy("node")
        // DECIMAL(18,12), not (38,12): contributions are ≤ 1 and their sum
        // is bounded by the total rank mass (= 1), so 6 integer digits is
        // unreachable headroom — and precision ≤ 18 keeps Spark's Decimal
        // long-backed (the (38,12) BigDecimal path measured ~2× slower
        // across the 3 iterations). Same exact values at the same scale.
        .agg(sum(col("c").cast(org.apache.spark.sql.types.DecimalType(18, 12)))
          .cast("double").as("s"))
      ranks = nodes
        .join(summed, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit((1.0 - damping) / nN) +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    ranks.select("node", "r")
  }

  /** Root + depth of every node in a FOREST (each node one parent; roots
    * are their own parent... or simply listed with themselves), by POINTER
    * DOUBLING: each round rewrites every node's known ancestor to that
    * ancestor's ancestor and adds the distances, so the frontier depth
    * doubles per round and a depth-D hierarchy resolves in ⌈log₂ D⌉
    * self-joins — the scale-safe alternative to one-level-per-round BFS
    * (depth-64 chain: 6 shuffle rounds, not 64). `nodes` must have columns
    * (node, parent, is_root) with is_root boolean; every parent chain must
    * terminate at a root (cycles raise via the round cap). Returns (node,
    * root, depth). Same driver-loop + localCheckpoint doctrine as
    * connectedComponents: each round is one equi-join + projection over an
    * O(nodes) table, shuffled on the ancestor key.
    */
  def rootAndDepth(nodes: DataFrame, maxRounds: Int = 20): DataFrame = {
    var lab = nodes.select(col("node"),
        when(col("is_root"), col("node")).otherwise(col("parent")).as("anc"),
        when(col("is_root"), lit(0L)).otherwise(lit(1L)).as("d"),
        col("is_root").as("settled"))
      .localCheckpoint(true)
    var round = 0
    var open = lab.where(!col("settled")).limit(1).count()
    while (open > 0 && round < maxRounds) {
      val a = lab.select(col("node").as("ak"), col("anc").as("aanc"),
        col("d").as("ad"), col("settled").as("asettled"))
      val doubled = lab.join(a, col("anc") === col("ak"), "left")
        .select(col("node"),
          when(col("settled"), col("anc"))
            .otherwise(coalesce(col("aanc"), col("anc"))).as("anc"),
          when(col("settled"), col("d"))
            .otherwise(col("d") + coalesce(col("ad"), lit(0L))).as("d"),
          (col("settled") || coalesce(col("asettled"), lit(false)))
            .as("settled"))
        .localCheckpoint(true) // eager: old lab fully read before release
      release(lab)
      lab = doubled
      round += 1
      open = lab.where(!col("settled")).limit(1).count()
    }
    require(open == 0,
      s"pointer doubling did not settle in $maxRounds rounds " +
        "(depth > 2^rounds or a parent cycle — inspect the hierarchy)")
    lab.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }

  /** Min-hop distance from a SEED SET over an undirected graph (`und`:
    * both edge directions present, columns (src, dst)) — multi-source
    * BFS, the traversal primitive behind "within-k-hops" neighborhood
    * queries (supplier reach, link-spam radius, GNN neighborhood
    * sampling). Frontier expansion: each round joins the CURRENT
    * frontier against the adjacency, anti-joins nodes already settled,
    * and tags survivors with the round number — hop h shuffles
    * O(frontier·degree) rows, never O(nodes); when `und` is a bucketed
    * table on src the adjacency side of every round's join is
    * exchange-free (the same §7.3 pre-partitioned-iteration posture as
    * pageRankIterate). Hops are CAPPED (`maxHops`): an uncapped BFS over
    * a connected 100 TB graph is the whole corpus — the cap is the
    * operator's scale guard, and it is part of the semantics (also in
    * the oracle). Returns (node, hops:int) with hops = exact BFS
    * distance ≤ maxHops, one row per reached node (seeds at hop 0).
    * Deterministic (set semantics per round) → recursive-CTE oracle.
    * Same driver-loop + localCheckpoint lineage doctrine as
    * connectedComponents; early-exits when a frontier empties.
    */
  def bfsHops(und: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // Checkpoint ONLY each round's frontier (O(frontier) rows), never the
    // accumulated distance table: `dist` stays the LAZY union of the ≤
    // maxHops+1 checkpointed frontiers, so the settled set is written once
    // per node total instead of once per node PER HOP — re-materializing
    // the full table every round is O(reached·hops) block writes, which at
    // 100 TB is rewriting the accumulated BFS result each iteration. The
    // union plan is ≤ maxHops+1 LogicalRDD leaves, so the per-round
    // anti-join and the returned frame read cached frontier blocks with no
    // recompute and no growing-lineage re-analysis.
    // LAZY checkpoint + the count that follows = ONE fused job per round
    // (materialize-and-witness, the connectedComponents doctrine): the
    // eager form spent a second job per round persisting blocks the
    // liveness probe was about to read anyway — at sf0.1 the per-round
    // job latency, not data volume, was the sssp wall (r18 verdict #8).
    // count() (not isEmpty) is deliberate: it computes EVERY partition,
    // so the lazy checkpoint finalizes inside the witness action instead
    // of leaving stragglers to re-derive from lineage later.
    val seed0 = seeds.select(col("node")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(false)
    var dist = seed0
    var frontier = seed0.select("node")
    var h = 1
    var live = seed0.count() > 0
    while (h <= maxHops && live) {
      val next = frontier.join(und, frontier("node") === und("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(false)
      live = next.count() > 0
      if (live) {
        dist = dist.union(next)
        frontier = next.select("node")
      } else release(next) // empty frontier: nothing to keep
      h += 1
    }
    dist
  }

  /** Triangle + wedge census of an undirected graph given as a canonical
    * (a < b, distinct) edge list. Triangles count once each via the
    * ordered a<b<c 3-join (no orientation dedup pass); wedges are
    * Σ d(d−1)/2 from one degree aggregate; global clustering coefficient
    * = 3·triangles/wedges (0 when wedge-free). All-integer until the one
    * final division. Three shuffle joins over the edge list — at 100 TB
    * pre-bucket the edge table on the join key and cap super-node degrees
    * (a web-scale hub makes the wedge join quadratic; dedup graphs are
    * near-cliques and have no hubs).
    *
    * Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    * clustering_coeff).
    */
  def triangleCensus(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    val nodes = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
    val deg = nodes.groupBy("n").agg(count(lit(1)).as("d"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val wedges = deg.agg(sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val tri = e.toDF("x", "y")
      .join(e.toDF("y2", "z"), col("y") === col("y2"))
      .join(e.toDF("x3", "z3"),
        col("x") === col("x3") && col("z") === col("z3"))
      .agg(count(lit(1)).as("n_triangles"))
    // four 1-row aggregates → bounded broadcast cross joins
    nNodes.crossJoin(nEdges).crossJoin(wedges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_wedges"), lit(0L)).as("n_wedges"),
        col("n_triangles"),
        when(coalesce(col("n_wedges"), lit(0L)) === 0, lit(0.0))
          .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges"))
          .as("clustering_coeff"))
  }
}
