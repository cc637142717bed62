package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.{Det, Q}
import graft.sources.Tables

/** LLM-training-data pipeline operators — SURVEY.md §2.J (mandated
  * extension; the reference has no text corpus, so these run on the
  * driver-provided `documents` / `embeddings` tables).
  *
  * Scale posture (100 TB):
  *  - exact dedup is hash-groupBy — embarrassingly parallel, one shuffle;
  *  - exact Jaccard goes through 3-gram SHINGLES, not raw tokens: shingle
  *    doc-frequency is bounded (measured max 25 at sf0.1 vs 3 923 for
  *    tokens), so the shingle-equijoin fan-out stays near-linear;
  *  - MinHash+LSH banding is the documented big-corpus path: candidate
  *    generation is a groupBy on (band, signature) — no pairwise join at
  *    all — followed by exact verification on candidates only;
  *  - SimHash gives a second near-dup signal with 60-bit signatures and
  *    banded Hamming candidate generation;
  *  - brute-force cosine is the correctness baseline (O(probes·N)); the
  *    LSH-bucketed variant (random hyperplanes) is the ANN scale path.
  */
object Llm {

  /** Tokenize the space-separated synthetic corpus. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")

  /** Tokenize, CARRYING extra per-doc columns through the generator.
    * The de-join shape (r14 verdict): re-joining the exploded token
    * stream back to `documents` on doc_id to recover a doc attribute
    * is a whole corpus×corpus shuffle; the generator projection
    * carries the column for free (explode duplicates the attribute
    * per token — a few bytes per row vs an exchange of the entire
    * token stream at 100 TB). DuckDB mirrors it: unnest in a select
    * list repeats sibling columns the same way.
    */
  def tokens(docs: DataFrame, extraCols: String*): DataFrame =
    docs.select(col("doc_id") +: extraCols.map(col) :+
        explode(split(col("text"), " ")).as("tok"): _*)
      .where(col("tok") =!= "")

  /** Distinct 3-gram shingles per doc, with 1-based position retained.
    * Guard: sequence(1, n) with n < 1 would generate a DESCENDING sequence
    * in Spark — docs shorter than 3 tokens are filtered out instead.
    */
  def shinglesWithPos(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), (col("pos") + 1).cast(IntegerType).as("pos"),
        col("col").as("shingle"))

  /** Distinct shingle set per doc (the Jaccard/MinHash universe). */
  def shingleSets(docs: DataFrame): DataFrame =
    shinglesWithPos(docs).select("doc_id", "shingle").distinct()

  /** Default bucket-size cap for LSH candidate generation. A bucket of size
    * m yields m(m-1)/2 candidate pairs; a degenerate band key (all-zero
    * vectors, a boilerplate-dominated corpus) can put millions of rows under
    * ONE key, whose pair set is compute-death at 100 TB (10^12+ pairs) and
    * carries almost no signal (a band that can't discriminate isn't evidence
    * of similarity). Standard LSH practice is to drop oversized buckets; the
    * cap is applied IDENTICALLY in the DuckDB oracles so parity is exact by
    * construction, and at the test scale factors no bucket comes near it, so
    * outputs are unchanged.
    */
  val MaxBucket = 4096

  /** Expand each bucket's sorted element array into its (earlier, later)
    * element pairs — LSH candidate generation WITHOUT a self-join. The
    * self-join formulation recomputes the whole signature subtree once per
    * join side (measured 2× the signature cost at sf0.1); grouping postings
    * into one bucket row and expanding pairs in-place computes it once.
    *
    * Memory posture: expansion is TWO-STEP — posexplode to one row per
    * bucket element first, then one slice/transform per element — so a row
    * materializes at most O(|bucket|) pairs, never the O(|bucket|²) full
    * pair set of the single-step flatten(transform(transform)) formulation
    * (the round-2 OOM hazard). Buckets above `maxBucket` are dropped (see
    * MaxBucket). `pairStruct` builds the output struct from the column `x`
    * (earlier element) and lambda var `y` (later element); `keep` lists the
    * bucket columns to carry alongside the pairs (e.g. the band index).
    */
  private def expandBucketPairs(buckets: DataFrame, arr: String,
                                pairStruct: String, keep: Seq[String],
                                maxBucket: Int = MaxBucket): DataFrame =
    buckets
      .where(size(col(arr)).between(2, maxBucket))
      .select(keep.map(col) ++ Seq(col(arr), posexplode(col(arr))): _*)
      .toDF(keep ++ Seq(arr, "i", "x"): _*)
      .select(keep.map(col) :+ explode(expr(
        s"transform(slice($arr, i + 2, size($arr) - i - 1), " +
          s"y -> $pairStruct)")).as("p"): _*)

  /** First-collision filter — emits a candidate pair only from the FIRST
    * band in which the two elements collide, making pairs unique BY
    * CONSTRUCTION and eliminating the corpus-scale `distinct()` shuffle over
    * the full candidate set (the dominant cost of the round-2 formulation:
    * at sf0.1 the ANN query's candidate multiset is ~8× its distinct size).
    * Requires columns `band` (0-based) and `ka`/`kb` (each element's full
    * band-key array); a pair seen at band b is kept iff no earlier band
    * key matches. slice(_, 1, 0) is the empty array, so band 0 needs no
    * special case. Output set is IDENTICAL to distinct() — the oracles'
    * SELECT DISTINCT self-join is unchanged.
    *
    * Type contract (ADVICE r19): `band_prefix_collides` hard-rejects
    * array<int> with containsNull=true at ANALYSIS time (a null slot
    * would decode as a phantom 0==0 collision). In-repo `ka`/`kb` come
    * straight from HyperplaneBandKeys (containsNull=false) so this
    * pipeline type-checks unchanged — but band-key arrays PERSISTED to
    * parquet and read back default to containsNull=true. A caller
    * consuming STORED keys must first prove elements non-null with the
    * documented escape hatch: `transform(ka, x -> coalesce(x, <sentinel>))`
    * (or a cast through the non-null schema), choosing a sentinel outside
    * the hash range so a masked null can never manufacture a collision.
    */
  private def firstCollisionOnly(pairs: DataFrame): DataFrame =
    // native early-exit loop (BandPrefixCollides), not the interpreted
    // exists(zip_with(slice…)) HOF chain — evaluated once per candidate
    // pair, it was the ANN query's whole wall at sf0.1 (r18); callers
    // register it via VectorFunctions.register
    pairs.where(!expr("band_prefix_collides(ka, kb, band)"))

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: content hash → canonical survivor (min doc_id). */
  val qDedupExactHash = Q(
    "q_dedup_exact_hash",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          sha2(lower(trim(col("text"))), 256).as("content_hash"))
        .groupBy("content_hash")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
        .orderBy("content_hash"),
    Some("""SELECT content_hash, min(doc_id) AS keeper, count(*) AS n_dups
            FROM (SELECT doc_id, sha256(lower(trim(text))) AS content_hash
                  FROM documents)
            GROUP BY content_hash ORDER BY content_hash"""))

  /** Shared dedup-family build (r17 verdict #6): the exact-dup collapse
    * (md5 text groups → members/representatives) and the representative
    * shingle-postings table with its df and per-doc sizes — built ONCE
    * per corpus dir, localCheckpoint-pinned (all four tables are
    * rep/vocab-bounded, never corpus-text-sized), and memoized for the
    * JVM. q_dedup_ppjoin, q_dedup_jaccard_pairs and q_dedup_containment
    * previously each re-ran the corpus scan + shingle explode + distinct
    * from scratch (39 MB of identical shuffle per query at sf0.1); now
    * the corpus text is shingled exactly once per session and the
    * full-corpus postings DERIVE from the collapse (a clone's shingle
    * set IS its representative's), which also makes the derivation
    * clone-multiplicity-free — the dup-heavy-crawl posture the r14
    * rehearsal demanded. Build wall rides BuildTimer so the bench
    * attributes it as build_s, not query cost.
    */
  final case class DedupBase(members: DataFrame, sh: DataFrame,
                             dfreq: DataFrame, sizes: DataFrame)
  // Cache key doctrine (ADVICE r18 + r18 verdict #5):
  //  - SESSION identity rides applicationId + SparkContext startTime —
  //    unique per context LIFECYCLE, unlike identityHashCode whose
  //    value can be reused by a later session and hand it checkpointed
  //    RDDs bound to a dead SparkContext. (localCheckpoint pins live at
  //    context scope, so sibling sessions of one context may share.)
  //  - CORPUS identity rides a version stamp of the documents.parquet
  //    part files (count + newest mtime): a caller that rewrites a
  //    corpus dir in place and re-queries the same path now misses the
  //    stale entry instead of reading pinned plans over deleted files.
  //  - Entries whose context has STOPPED are evicted on the next access
  //    from any session, so dead checkpoint RDDs don't pin for the JVM
  //    lifetime.
  private val dedupBaseCache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.SparkContext, DedupBase)]()
  // Monotone token for the stamp's failure arm: a transient listing error
  // must produce a key that aliases NOTHING (not even another failure) —
  // the shared "0" sentinel it replaces silently reused a stale pinned
  // build across the very rewrite the stamp exists to detect (ADVICE r19).
  private val stampFailSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def corpusStamp(dir: String): String = {
    val p = java.nio.file.Paths.get(dir, "documents.parquet")
    try {
      if (!java.nio.file.Files.isDirectory(p))
        return java.nio.file.Files.getLastModifiedTime(p).toMillis.toString +
          "@" + java.nio.file.Files.size(p)
      var n = 0L
      var newest = 0L
      var bytes = 0L
      val st = java.nio.file.Files.list(p)
      try {
        st.forEach { f =>
          n += 1
          newest = math.max(newest,
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          // total byte size folds in (ADVICE r19): a same-part-count
          // rewrite landing inside one mtime millisecond still changes
          // the stamp unless it is also byte-identical
          bytes += (try java.nio.file.Files.size(f)
                    catch { case _: java.io.IOException => 0L })
        }
      } finally st.close()
      s"$n@$newest@$bytes"
    } catch { case _: java.io.IOException =>
      "ioerr#" + stampFailSeq.incrementAndGet()
    }
  }
  private def dedupBase(s: SparkSession, dir: String): DedupBase = {
    val sc = s.sparkContext
    val it = dedupBaseCache.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue._1.isStopped) it.remove()
    val prefix = sc.applicationId + "@" + sc.startTime + "|" + dir + "|"
    val key = prefix + corpusStamp(dir)
    // Stamp-miss eviction (ADVICE r19, medium): a new stamp for the same
    // (session, dir) means the corpus was rewritten in place — the
    // displaced entry's three pinned checkpoint frames would otherwise
    // stay resident until the context stops, so a long-lived session
    // rewriting corpora repeatedly would accumulate pinned blocks without
    // bound. The "|" terminator after dir keeps /a/b from matching /a/bc.
    val old = dedupBaseCache.entrySet().iterator()
    while (old.hasNext) {
      val e = old.next()
      if (e.getKey != key && e.getKey.startsWith(prefix)) {
        val b = e.getValue._2
        Seq(b.members, b.sh, b.sizes).foreach(Graph.release)
        old.remove()
      }
    }
    dedupBaseCache.computeIfAbsent(key, _ => sc -> buildDedupBase(s, dir))._2
  }
  private def buildDedupBase(s: SparkSession, dir: String): DedupBase =
        graft.sources.BuildTimer.timed {
          import org.apache.spark.sql.expressions.Window
          val base = Tables.documents(s, dir)
            .select(col("doc_id"), col("text"), md5(col("text")).as("th"))
            .withColumn("gid", min(col("doc_id"))
              .over(Window.partitionBy("th")))
          val members = base.select(col("doc_id"), col("gid"))
            .localCheckpoint(true)
          // reps re-join the corpus against the PINNED membership (the
          // rep id set auto-broadcasts) instead of re-running the md5
          // window lineage inside the sh materialization job
          val reps = Tables.documents(s, dir)
            .join(members.where(col("doc_id") === col("gid"))
              .select(col("doc_id")), "doc_id")
            .select(col("doc_id"), col("text"))
          // Bucket on xxhash64(shingle) instead of the shingle string:
          // ~5× smaller shuffle payload and long-compare instead of
          // string-compare. A 64-bit collision over a ~27k-shingle
          // vocabulary is ~1e-11 — and the input corpus is fixed, so
          // parity is deterministic, not probabilistic.
          // r21: the shingle walk + per-doc distinct is the native
          // ShingleXxh64Set kernel (same XXH64 seed-42 bytes, distinct
          // on the hash as before) — the interpreted transform lambda
          // AND the (doc_id, h) distinct EXCHANGE are gone: per-doc
          // distinct keyed by doc_id IS the global distinct.
          graft.plans.VectorFunctions.register(s)
          val sh = reps
            .select(col("doc_id"), explode(
              expr("shingle_xxh64_set(split(text, ' '))")).as("h"))
            .localCheckpoint(true)
          // df stays a LAZY aggregate over the pinned postings: single
          // consumer (ppjoin's prefix), one small two-phase agg — a pin
          // would spend a whole job to save nothing. sizes IS pinned:
          // ppjoin reads it under four different aliases (na/nb sides,
          // prefix, intra expansion) whose renamed subtrees defeat
          // ReusedExchange, so unpinned it recomputed four times
          // (measured +1 s on ppjoin).
          val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
          val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
            .localCheckpoint(true)
          DedupBase(members, sh, dfreq, sizes)
        }

  /** Expand REP-level verified pairs (a, b, inter, na, nb over
    * representative ids) to MEMBER-level pairs — the output-bound tail
    * of the exact-dup collapse shared by ppjoin/jaccard/containment:
    * inter-group pairs inherit the reps' exact inter/na/nb (sets are
    * identical within a group; sizes follow the doc ids, so when member
    * ids flip the (a, b) order relative to the rep order, na/nb flip
    * too), intra-group pairs are exact dups (inter = na = nb — J = 1,
    * containment 1.0) and only groups whose representative HAS shingles
    * participate, exactly as in the naive all-pairs oracle. The work is
    * output-bound where the output itself is quadratic (a clone corpus
    * MUST emit every clone pair) — never compute-quadratic.
    */
  private def dedupExpandRepPairs(bb: DedupBase,
                                  repPairs: DataFrame): DataFrame = {
    val members = bb.members
    val inter = repPairs
      .join(members.select(col("gid").as("a"), col("doc_id").as("da")),
        "a")
      .join(members.select(col("gid").as("b"), col("doc_id").as("db")),
        "b")
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"),
        col("inter"),
        when(col("da") < col("db"), col("na")).otherwise(col("nb"))
          .as("na"),
        when(col("da") < col("db"), col("nb")).otherwise(col("na"))
          .as("nb"))
    val intra = members
      .join(bb.sizes.select(col("doc_id").as("gid"), col("n")), "gid")
      .select(col("gid"), col("doc_id"), col("n"))
    val intraPairs = intra.toDF("gid", "da", "na")
      .join(intra.toDF("gid2", "db", "nb"),
        col("gid") === col("gid2") && col("da") < col("db"))
      .select(col("da").as("a"), col("db").as("b"),
        col("na").as("inter"), col("na"), col("nb"))
    inter.union(intraPairs)
  }

  /** Rep-level exact intersection counts from UNCAPPED postings buckets
    * (truth semantics: a dropped hot shingle would bias `inter` itself,
    * not just recall — the capped scale paths are LSH/ppjoin-prefix):
    * one shuffle groups rep postings per shingle hash, in-bucket pairs
    * explode with no self-join, sizes ride SHUFFLE_HASH (the §7.6
    * broadcast trap: Catalyst's static estimate of the pair aggregate
    * is tiny, and broadcasting the O(pairs) side OOM'd the r11 10×
    * rehearsal at a mere 50 k-doc clone corpus).
    */
  private def dedupRepPairsAll(b: DedupBase): DataFrame = {
    val buckets = b.sh.groupBy("h")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    expandBucketPairs(buckets, "ids", "struct(x AS a, y AS b)",
        Nil, maxBucket = Int.MaxValue)
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(b.sizes.toDF("a", "na").hint("shuffle_hash"), "a")
      .join(b.sizes.toDF("b", "nb").hint("shuffle_hash"), "b")
  }

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.5) over 3-shingle
    * sets. This is the small-scale truth; LSH below is the scale path.
    */
  val qDedupJaccardPairs = Q(
    "q_dedup_jaccard_pairs",
    (s, dir) => {
      // Truth values on the collapse (r18): rep-level uncapped buckets
      // give exact inter/na/nb per representative pair, the integer
      // threshold (3·inter ≥ na+nb ⟺ J ≥ 0.5, no float boundary)
      // filters at rep level (inter/na/nb are expansion-invariant up to
      // the na/nb swap, and the predicate is symmetric), and the member
      // expansion emits the quadratic OUTPUT without quadratic WORK —
      // the 10× clone rehearsal read 54.8 s on the full-corpus bucket
      // form (every bucket 10× members → 100× pairs) vs clone-invariant
      // here. The ORACLE stays the naive all-pairs join over the full
      // corpus, so parity certifies the whole composition loses nothing.
      val b = dedupBase(s, dir)
      dedupExpandRepPairs(b,
          dedupRepPairsAll(b).where(expr("3 * inter >= na + nb")))
        .withColumn("jac", col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
        .select("a", "b", "inter", "na", "nb", "jac")
        .orderBy("a", "b")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
                 sh AS (SELECT DISTINCT doc_id,
                          unnest([array_to_string(toks[i:i+2], ' ')
                                  FOR i IN range(1, greatest(len(toks)-1, 1))])
                            AS shingle
                        FROM d),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
                 p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                       FROM sh x JOIN sh y
                         ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                       GROUP BY 1, 2)
            SELECT a, b, inter, sa.n AS na, sb.n AS nb,
                   CAST(inter AS DOUBLE)
                     / CAST(sa.n + sb.n - inter AS DOUBLE) AS jac
            FROM p JOIN sz sa ON p.a = sa.doc_id
                   JOIN sz sb ON p.b = sb.doc_id
            WHERE CAST(inter AS DOUBLE)
                    / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.5
            ORDER BY a, b"""))

  /** LABEL-OUTLIER mining over the embedding store — the mislabeled-
    * point detector (Northcutt-style confident-learning's geometric
    * cousin): distance from each vector to its OWN label's centroid,
    * top-20 farthest — the points whose label disagrees most with
    * their neighborhood, the first candidates for relabeling or
    * dropping in a training corpus. Per-label centroids from one
    * posexplode aggregate (davg12 + round-6, the q_embed_center
    * portability doctrine), broadcast back as a bounded |labels|-row
    * array table; dist² = ‖x‖² − 2x·µ + ‖µ‖² via the shared
    * sequential-fold dot product (vec_dot ↔ list_dot_product — same
    * order, same doubles). Total order (dist² DESC, vec_id). Scale:
    * centroid table is labels×dims bounded; the scoring pass is
    * map-side against the broadcast — one scan, no pair join anywhere.
    */
  val qEmbedLabelOutliers = Q(
    "q_embed_label_outliers",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val ex = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").cast(IntegerType).as("dim"),
          col("col").cast(DoubleType).as("x"))
      val mu = ex.groupBy("label", "dim")
        .agg(round(Det.davg12(col("x")), 6).as("mu"))
        .groupBy("label")
        .agg(expr(
          "transform(sort_array(collect_list(struct(dim, mu))), s -> s.mu)")
          .as("mva"))
        .withColumn("dmm", expr("vec_dot(mva, mva)"))
      Tables.embeddings(s, dir)
        .join(broadcast(mu), "label")
        .select(col("vec_id"), col("label"),
          expr("vec_dot(embedding, embedding)" +
            " - 2.0 * vec_dot(embedding, mva) + dmm").as("dist2"))
        .withColumn("dist", expr("sqrt(greatest(dist2, 0.0))"))
        .select(col("vec_id"), col("label"), col("dist"))
        .orderBy(col("dist").desc, col("vec_id"))
        .limit(20)
    },
    Some(s"""WITH ex AS (SELECT label, vec_id,
                    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                    unnest(embedding) AS x
                  FROM embeddings),
                 cent AS (SELECT label, dim,
                            round(${Det.sqlAvg12("x")}, 6) AS mu
                          FROM ex GROUP BY label, dim),
                 mv AS (SELECT label, list(mu ORDER BY dim) AS mva
                        FROM cent GROUP BY label),
                 d AS (SELECT e.vec_id, e.label,
                         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[]))
                         - 2.0 * list_dot_product(
                             CAST(e.embedding AS DOUBLE[]), mva)
                         + list_dot_product(mva, mva) AS dist2
                       FROM embeddings e JOIN mv ON e.label = mv.label)
             SELECT vec_id, label, sqrt(greatest(dist2, 0.0)) AS dist
             FROM d ORDER BY dist DESC, vec_id LIMIT 20"""))

  /** S-stemmer vocabulary folding (Harman's public 3-rule stemmer —
    * the conservative plural collapser IR systems use when Porter is
    * too aggressive): ies→y (unless aies/eies), es→e (unless
    * aes/ees/oes), trailing s dropped (unless us/ss). The rules are a
    * pure CASE cascade over right()/substr() — no regex engine
    * semantics in play at all, so cross-engine agreement is by
    * construction. Output: top-20 stems with token volume and the
    * number of distinct surface forms folded (n_forms > 1 rows are the
    * stemmer earning its keep). Scale: stateless map + one
    * map-combining aggregate; the distinct-form count shuffles on the
    * stem key — the vocabulary, not the corpus.
    */
  val qTextStem = Q(
    "q_text_stem",
    (s, dir) => {
      val stemFml =
        """CASE
             WHEN length(tok) > 4 AND right(tok, 3) = 'ies'
                  AND right(tok, 4) NOT IN ('aies', 'eies')
               THEN concat(substr(tok, 1, length(tok) - 3), 'y')
             WHEN length(tok) > 3 AND right(tok, 2) = 'es'
                  AND right(tok, 3) NOT IN ('aes', 'ees', 'oes')
               THEN substr(tok, 1, length(tok) - 1)
             WHEN length(tok) > 2 AND right(tok, 1) = 's'
                  AND right(tok, 2) NOT IN ('us', 'ss')
               THEN substr(tok, 1, length(tok) - 1)
             ELSE tok END"""
      tokens(Tables.documents(s, dir))
        .select(lower(col("tok")).as("tok"))
        .withColumn("stem", expr(stemFml))
        .groupBy("stem")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_forms"))
        .orderBy(col("n_tokens").desc, col("stem"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT lower(tok) AS tok FROM
                   (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents) WHERE tok <> ''),
             st AS (SELECT tok,
                      CASE
                        WHEN length(tok) > 4 AND right(tok, 3) = 'ies'
                             AND right(tok, 4) NOT IN ('aies', 'eies')
                          THEN substr(tok, 1, length(tok) - 3) || 'y'
                        WHEN length(tok) > 3 AND right(tok, 2) = 'es'
                             AND right(tok, 3) NOT IN ('aes', 'ees', 'oes')
                          THEN substr(tok, 1, length(tok) - 1)
                        WHEN length(tok) > 2 AND right(tok, 1) = 's'
                             AND right(tok, 2) NOT IN ('us', 'ss')
                          THEN substr(tok, 1, length(tok) - 1)
                        ELSE tok END AS stem
                    FROM toks)
            SELECT stem, count(*) AS n_tokens,
                   count(DISTINCT tok) AS n_forms
            FROM st GROUP BY stem
            ORDER BY n_tokens DESC, stem LIMIT 20"""))

  /** PPJoin-style PREFIX-FILTERED similarity join (Xiao/Wang/Lin's
    * public prefix-filtering principle) — the SCALE PATH for exact
    * Jaccard ≥ τ that q_dedup_jaccard_pairs computes by brute postings
    * expansion: under ANY consistent global token order, two sets with
    * J ≥ τ MUST share a token inside their first |x| − ⌈τ·|x|⌉ + 1
    * tokens (pigeonhole), so candidates are generated from PREFIXES
    * ONLY and the full intersection is counted just for candidate
    * pairs. Ordering tokens by ASCENDING document frequency puts the
    * corpus's hot shingles (boilerplate, stop phrases) at the BACK of
    * every prefix — the quadratic bucket blowup the uncapped truth
    * query risks simply never materializes, with ZERO recall loss
    * (unlike MinHash-LSH, this is exact). τ = 0.5 spelled as the
    * integer predicate 3·inter ≥ na+nb — no float boundary; the
    * reported jac is one shared division. The global order is
    * (df, shingle-hash) — engine-local but used consistently on both
    * join sides, which is all the theorem needs; the oracle is the
    * NAIVE all-pairs join, so parity certifies the filter loses
    * nothing. Result ≡ q_dedup_jaccard_pairs by construction (pinned
    * in R14Spec). Scale: prefix postings are df-ascending, so bucket
    * fanout is bounded by rare-token df; verification is
    * candidate-bounded; sizes ride SHUFFLE_HASH (the §7.6 broadcast
    * trap).
    */
  val qDedupPpjoin = Q(
    "q_dedup_ppjoin",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // EXACT-DUP COLLAPSE FIRST (the production composition): the r14
      // 10x rehearsal's clone-degenerate corpus put 63x wall on the
      // rep-naive form — candidate verification is quadratic in clone
      // multiplicity, and clones are the one degeneracy a crawl corpus
      // is GUARANTEED to have. Group identical texts (md5), run the
      // prefix-filtered join on REPRESENTATIVES only (distinct texts —
      // scale-invariant under cloning), then expand groups back into
      // member pairs: intra-group pairs are J=1 by construction,
      // inter-group pairs inherit the representatives' exact
      // inter/na/nb. Output identical to the naive all-pairs oracle;
      // the work is output-bound where the output itself is quadratic.
      // The collapse, rep postings, df and sizes all come from the
      // SHARED pinned dedupBase build (r17 verdict #6) — the corpus is
      // scanned and shingled once per session for the whole family.
      val bb = dedupBase(s, dir)
      val sh = bb.sh
      val dfreq = bb.dfreq
      val sizes = bb.sizes
      val wDoc = Window.partitionBy("doc_id").orderBy("df", "h")
      // prefix is consumed by BOTH candidate-join sides on different
      // keys (h vs h2) — no exchange reuse possible — so pin it once:
      // it is rep-bounded (≤ n/2+1 rows per rep) and its lineage holds
      // the df-order window. rn/n ride along for the r21 positional and
      // length filters below (two small ints per posting).
      val prefix = sh.join(dfreq, "h")
        .join(sizes.hint("shuffle_hash"), "doc_id")
        .withColumn("rn", row_number().over(wDoc))
        .where(col("rn") <= expr("n DIV 2 + 1"))
        .select("doc_id", "h", "rn", "n")
        .localCheckpoint(true)
      // r21 optimization (guide §2.3/§8: decide with small rows, move
      // heavy rows once): the verify step below attaches each rep's FULL
      // shingle array to every candidate pair, and that array-carrying
      // exchange was 162 MB of the query's 185 MB at sf0.1 (408 647
      // candidate pairs × ~430 B array). PPJoin's classic LENGTH and
      // POSITIONAL filters prune candidates using only the small ints
      // already in the prefix postings, BEFORE any array is attached:
      //  - length: J ≥ 0.5 ⟹ inter ≤ min(na,nb) and 3·inter ≥ na+nb
      //    ⟹ 3·min(na,nb) ≥ na+nb — applied inside the join condition.
      //  - positional: under the consistent global (df, h) order, every
      //    shared token ordered before the LAST shared prefix token is
      //    inside both prefixes (positions are monotone in the global
      //    order), so it is counted by alpha = |prefix(a) ∩ prefix(b)|;
      //    the remaining shared tokens sit after position pa = max(rn_a)
      //    in a AND after pb = max(rn_b) in b, hence
      //    inter ≤ alpha + min(na − pa, nb − pb). Pairs failing
      //    3·(alpha + min(na−pa, nb−pb)) ≥ na+nb can never pass the
      //    exact verify predicate — dropping them cannot change output
      //    (the verify step still applies 3·inter ≥ na+nb exactly).
      // Measured at sf0.1: 408 647 → 119 543 candidates (3.4×), query
      // shuffle 185 MB → ~60 MB. Zero recall loss by construction.
      val cand = prefix.toDF("a", "h", "ra", "na")
        .join(prefix.toDF("b", "h2", "rb", "nb"),
          col("h") === col("h2") && col("a") < col("b") &&
            expr("3 * least(na, nb) >= na + nb"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("alpha"),
          max(col("ra")).as("pa"), max(col("rb")).as("pb"),
          first(col("na")).as("pna"), first(col("nb")).as("pnb"))
        .where(expr(
          "3 * (alpha + least(pna - pa, pnb - pb)) >= pna + pnb"))
        .select("a", "b")
      // Verification by PER-PAIR set intersection (the classic PPJoin
      // verify step), not a postings re-join: exploding both docs'
      // full posting lists per candidate and re-aggregating was ~30 MB
      // of shuffle at sf0.1 — the query's whole residual cost. Each
      // rep's (distinct) shingle array is collected once off the pinned
      // postings (rep-bounded rows, doc-length-bounded arrays — the
      // same boundedness collect_list already assumes in the bucket
      // family) and the candidate pair intersects two arrays row-local:
      // inter = |A∩B| via array_intersect (h distinct per doc), na/nb
      // are the array sizes — identical values to the postings
      // formulation, a fraction of the exchange.
      val docArrs = sh.groupBy("doc_id")
        .agg(sort_array(collect_list(col("h"))).as("hs"))
        .localCheckpoint(true)
      val repPairs = cand
        .join(docArrs.toDF("a", "ha").hint("shuffle_hash"), "a")
        .join(docArrs.toDF("b", "hb").hint("shuffle_hash"), "b")
        .select(col("a"), col("b"),
          expr("size(array_intersect(ha, hb))").cast(LongType).as("inter"),
          expr("size(ha)").cast(LongType).as("na"),
          expr("size(hb)").cast(LongType).as("nb"))
        .where(expr("3 * inter >= na + nb"))
        // r21: pin the (tiny) verified pair set. The final global
        // orderBy's range-sampling pass otherwise re-executes this
        // subtree — the array-carrying exchange above was read TWICE
        // (2 × 61 MB at sf0.1, jobs adjacent in the probe) just to
        // range-partition ~25 rows. Verified pairs are output-bounded,
        // so the pin is a few rows, and the sort samples those instead.
        .localCheckpoint(true)
      dedupExpandRepPairs(bb, repPairs)
        .withColumn("jac", col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
        .select("a", "b", "inter", "na", "nb", "jac")
        .orderBy("a", "b")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
                 sh AS (SELECT DISTINCT doc_id,
                          unnest([array_to_string(toks[i:i+2], ' ')
                                  FOR i IN range(1, greatest(len(toks)-1, 1))])
                            AS shingle
                        FROM d),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
                 p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                       FROM sh x JOIN sh y
                         ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                       GROUP BY 1, 2)
            SELECT a, b, inter, sa.n AS na, sb.n AS nb,
                   CAST(inter AS DOUBLE)
                     / CAST(sa.n + sb.n - inter AS DOUBLE) AS jac
            FROM p JOIN sz sa ON p.a = sa.doc_id
                   JOIN sz sb ON p.b = sb.doc_id
            WHERE 3 * inter >= sa.n + sb.n
            ORDER BY a, b"""))

  /** ASYMMETRIC shingle containment — the quote/excerpt detector Jaccard
    * structurally misses: a short doc fully embedded in a long one has
    * tiny Jaccard (union is dominated by the long doc) but containment
    * |A∩B|/|A| ≈ 1. This is the dedup pass that catches boilerplate
    * wrappers, quoted posts and partial mirrors in a training corpus.
    * Same single-exchange bucket shape as q_dedup_jaccard_pairs
    * (postings from the SHARED pinned dedupBase build → in-bucket
    * pairs → per-pair intersection; sizes from the same shared
    * build); the ≥0.9 threshold is applied as the integer
    * predicate 10·inter ≥ 9·min(na,nb) — no float boundary anywhere in
    * the FILTER, the reported scores are one division on identical
    * integer operands. Truth query: uncapped buckets (a capped bucket
    * would bias `inter` itself); the capped scale path is the LSH family.
    * Collision note (shared with q_dedup_jaccard_pairs): Spark shingles
    * ride xxhash64 while the oracle compares raw shingle strings, so a
    * 64-bit collision would skew inter/na/nb — accepted at ~n²/2⁶⁵ odds,
    * the standard shingle-hashing trade every MinHash pipeline makes.
    */
  val qDedupContainment = Q(
    "q_dedup_containment",
    (s, dir) => {
      // Same collapse+expansion shape as q_dedup_jaccard_pairs (r18):
      // the ≥0.9 threshold (10·inter ≥ 9·min(na,nb) — min is symmetric
      // under the expansion's na/nb swap) filters at rep level; the
      // oracle stays the naive full-corpus join.
      val b = dedupBase(s, dir)
      dedupExpandRepPairs(b,
          dedupRepPairsAll(b)
            .where(col("inter") * 10 >= least(col("na"), col("nb")) * 9))
        .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
          (col("inter").cast(DoubleType) / col("na").cast(DoubleType))
            .as("cont_a"),
          (col("inter").cast(DoubleType) / col("nb").cast(DoubleType))
            .as("cont_b"))
        .orderBy("a", "b")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents
                       WHERE len(string_split(text, ' ')) >= 3),
                 sh AS (SELECT DISTINCT doc_id,
                          unnest([array_to_string(toks[i:i+2], ' ')
                                  FOR i IN range(1, greatest(len(toks)-1, 1))])
                            AS shingle
                        FROM d),
                 sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
                 p AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
                       FROM sh x JOIN sh y
                         ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                       GROUP BY 1, 2)
            SELECT a, b, inter, sa.n AS na, sb.n AS nb,
                   CAST(inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a,
                   CAST(inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b
            FROM p JOIN sz sa ON p.a = sa.doc_id
                   JOIN sz sb ON p.b = sb.doc_id
            WHERE inter * 10 >= least(sa.n, sb.n) * 9
            ORDER BY a, b"""))

  // association lift = P(ab)/(P(a)·P(b)) — rank-equivalent to PMI (log of
  // the same ratio) without the libm log that §7.2 bans cross-engine; the
  // two multiplies + one divide run on identical exact-integer operands
  private val liftFml = "CAST(cab AS DOUBLE) * CAST(nd AS DOUBLE) " +
    "/ (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))"

  /** Token co-occurrence lift — the phrase-mining / collocation signal
    * (PMI's rank-equivalent, log-free per §7.2): document-level exact
    * counts c(a), c(b), c(a,b) over DISTINCT per-doc tokens, lift =
    * c(ab)·N / (c(a)·c(b)), top-20 with support ≥ 5. Pair generation is
    * a per-doc self-join bounded by the DISTINCT-token count (≤ |vocab|
    * per doc — never raw length), and the pair space collapses to
    * ≤ |vocab|² keys at the groupBy, so the aggregate is bounded no
    * matter the corpus size. df/N broadcast onto the pair table; final
    * ranking is TakeOrdered with (ta, tb) tie-break. All counts exact
    * integers; lift is two multiplies + one divide on identical operands.
    */
  val qTextCooccur = Q(
    "q_text_cooccur",
    (s, dir) => {
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0).distinct()
      val df = t.groupBy("tok").agg(count(lit(1)).as("c"))
      val nDocs = t.agg(countDistinct(col("doc_id")).as("nd"))
      val pairs = t.toDF("doc_id", "ta")
        .join(t.toDF("doc_id2", "tb"),
          col("doc_id") === col("doc_id2") && col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("cab"))
        .where(col("cab") >= 5)
      pairs
        .join(broadcast(df.toDF("ta", "ca")), "ta")
        .join(broadcast(df.toDF("tb", "cb")), "tb")
        .crossJoin(broadcast(nDocs))
        .select(col("ta"), col("tb"), col("cab"), col("ca"), col("cb"),
          expr(liftFml).as("lift"))
        .orderBy(col("lift").desc, col("ta"), col("tb"))
        .limit(20)
    },
    Some(s"""WITH t AS (SELECT DISTINCT doc_id, tok
                   FROM (SELECT doc_id,
                           unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE len(tok) > 0),
             n AS (SELECT count(DISTINCT doc_id) AS nd FROM t),
             df AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
             p AS (SELECT x.tok AS ta, y.tok AS tb, count(*) AS cab
                   FROM t x JOIN t y
                     ON x.doc_id = y.doc_id AND x.tok < y.tok
                   GROUP BY 1, 2
                   HAVING count(*) >= 5),
             j AS (SELECT ta, tb, cab, x.c AS ca, y.c AS cb, nd
                   FROM p JOIN df x ON p.ta = x.tok
                          JOIN df y ON p.tb = y.tok, n)
            SELECT ta, tb, cab, ca, cb, $liftFml AS lift
            FROM j ORDER BY lift DESC, ta, tb LIMIT 20"""))

  // total-variation distance with an ALL-INTEGER numerator: |p−q| per token
  // cross-multiplied to |c_lt·N − c_t·N_l| (exact WIDE integers — decimal
  // in Spark, int128 in DuckDB; int64 would overflow past ~3e9 tokens),
  // summed as exact decimal, ONE division at the end — the denominator
  // product is built in doubles by shared formula text (each factor
  // ≤2^53-exact, identical operands → identical IEEE product both engines)
  private val tvFml = "CAST(num AS DOUBLE) / (CAST(2.0 AS DOUBLE) " +
    "* CAST(nl AS DOUBLE) * CAST(nt AS DOUBLE))"

  /** Corpus drift — the distribution-shift monitor a training-data
    * pipeline runs per source/slice (is this slice's token mix diverging
    * from the corpus?): total-variation distance between each language's
    * token frequency distribution and the global one. TV = ½Σ|p_t − q_t|
    * needs EVERY token of the global vocabulary per slice (absent tokens
    * contribute q_t), so the slice×vocab grid is built explicitly —
    * bounded by |langs|·|vocab|, independent of corpus size — and the
    * per-token deviation is cross-multiplied to the integer
    * |c_lt·N − c_t·N_l| (no per-token division, no float accumulation):
    * one exact decimal sum per slice, one shared-formula division at the
    * end. KL/JS need libm log (§7.2 cross-engine ban); TV is the exact
    * alternative with the same monotone drift signal. Scale: the token
    * rollups are two-phase bounded-key aggregates off one corpus scan;
    * everything after is vocab-sized.
    */
  val qCorpusDrift = Q(
    "q_corpus_drift",
    (s, dir) => {
      val Dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val t = Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val lt = t.groupBy("lang", "tok").agg(count(lit(1)).as("clt"))
      val tg = lt.groupBy("tok").agg(sum(col("clt")).as("ct"))
      val ln = lt.groupBy("lang").agg(sum(col("clt")).as("nl"))
      val nTot = ln.agg(sum(col("nl")).as("nt"))
      // the cross-multiplication rides WIDE integers (the q_agg_hhi
      // carrier split: Spark DECIMAL(18,0) products → (37,0), DuckDB
      // HUGEINT int128 — identical exact values): in int64 a corpus past
      // ~3e9 tokens would overflow c_lt·N at 2^63 (r10 advice)
      val Dec18 = org.apache.spark.sql.types.DecimalType(18, 0)
      tg.crossJoin(broadcast(ln)).crossJoin(broadcast(nTot))
        .join(lt, Seq("lang", "tok"), "left")
        .select(col("lang"), col("nl"), col("nt"),
          abs(coalesce(col("clt"), lit(0L)).cast(Dec18) *
            col("nt").cast(Dec18) -
            col("ct").cast(Dec18) * col("nl").cast(Dec18)).as("dev"))
        .groupBy("lang", "nl", "nt")
        .agg(sum(col("dev").cast(Dec0)).cast("double").as("num"))
        .select(col("lang"), col("nl").as("n_tokens"),
          expr(tvFml).as("tv"))
        .orderBy("lang")
    },
    Some(s"""WITH t AS (SELECT lang, tok
                   FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE len(tok) > 0),
             lt AS (SELECT lang, tok, count(*) AS clt
                    FROM t GROUP BY 1, 2),
             tg AS (SELECT tok, CAST(sum(clt) AS BIGINT) AS ct
                    FROM lt GROUP BY 1),
             ln AS (SELECT lang, CAST(sum(clt) AS BIGINT) AS nl
                    FROM lt GROUP BY 1),
             n AS (SELECT CAST(sum(clt) AS BIGINT) AS nt FROM lt),
             g AS (SELECT ln.lang, ln.nl, tg.tok, tg.ct, n.nt
                   FROM tg, ln, n),
             j AS (SELECT g.lang, g.nl, g.nt,
                     abs(CAST(COALESCE(lt.clt, 0) AS HUGEINT)
                           * CAST(g.nt AS HUGEINT)
                         - CAST(g.ct AS HUGEINT)
                           * CAST(g.nl AS HUGEINT)) AS dev
                   FROM g LEFT JOIN lt
                     ON lt.lang = g.lang AND lt.tok = g.tok),
             a AS (SELECT lang, nl, nt,
                     CAST(SUM(CAST(dev AS DECIMAL(38,0))) AS DOUBLE) AS num
                   FROM j GROUP BY lang, nl, nt)
            SELECT lang, nl AS n_tokens, $tvFml AS tv
            FROM a ORDER BY lang"""))

  /** Vocabulary health per slice — hapax-legomena rate (share of the
    * slice's vocabulary seen exactly once: high = open vocabulary /
    * noisy OCR / code-switching; near zero = templated or looping text)
    * and type-token ratio (lexical diversity) — the two classic corpus
    * screens run before training-mix decisions (Heaps'-law inputs). All
    * counts exact integers off ONE (lang, tok) rollup; the two rates are
    * one IEEE division each on identical operands. Scale: the rollup is
    * a two-phase bounded-key aggregate (|langs|·|vocab| keys); the
    * per-slice census is vocab-sized.
    */
  val qTextHapax = Q(
    "q_text_hapax",
    (s, dir) => {
      val lt = Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      lt.groupBy("lang")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          count(when(col("c") === 1, lit(1))).as("hapax"))
        .select(col("lang"), col("n_tokens"), col("vocab"), col("hapax"),
          expr("CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE)")
            .as("hapax_rate"),
          expr("CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)")
            .as("ttr"))
        .orderBy("lang")
    },
    Some("""WITH lt AS (SELECT lang, tok, count(*) AS c
                  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  WHERE len(tok) > 0 GROUP BY lang, tok),
             a AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
                     count(*) AS vocab,
                     count(CASE WHEN c = 1 THEN 1 END) AS hapax
                   FROM lt GROUP BY lang)
            SELECT lang, n_tokens, vocab, hapax,
                   CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
                     AS hapax_rate,
                   CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
            FROM a ORDER BY lang"""))

  /** Near-dup pair table MATERIALIZED once per (session, input dir) via
    * Incremental.materialize and shared by every downstream consumer
    * (q_dedup_clusters, q_corpus_curate): through r5 each consumer
    * recomputed the full shingle→bucket→verify pair query as a subplan
    * (~4 s each at sf0.1), which is exactly the "pair graph is a
    * precomputed table" production shape the Scaladocs below describe —
    * now the engine actually does it. Freshness is mtime-based against the
    * documents input, so a changed corpus rebuilds and a repeated bench /
    * verify run reuses. Output lives under the per-session temp root
    * (removed on JVM exit), keyed by the input dir so concurrent scale
    * factors never cross-contaminate. q_dedup_jaccard_pairs itself stays
    * a live computation — it IS the pair-generation benchmark.
    */
  private def pairTable(s: SparkSession, dir: String): DataFrame = {
    // collision-free md5 keying centralized in dirKeyedTempPath (a lossy
    // character substitution would map distinct dirs to one cache entry,
    // and mtime-only freshness could then serve another corpus's pairs)
    val out = graft.sources.SourcesSinks
      .dirKeyedTempPath(s, dir, "jaccard_pairs")
    val (df, _) = graft.sources.Incremental.materialize(
      s, Seq(s"$dir/documents.parquet"), out)(qDedupJaccardPairs.fn(s, dir))
    df
  }

  /** Duplicate CLUSTERS from the near-dup pair graph — the step a curation
    * pipeline runs after pair generation (keep `min(doc_id)` per cluster,
    * drop the rest). Connected components via iterative min-label
    * propagation: every doc starts labeled with itself; each round pushes
    * the smallest known label across edges; fixpoint = each doc holds the
    * min doc_id of its component, which IS the cluster id (and the keeper).
    *
    * Scale posture: one shuffle-join + one groupBy per round over
    * (node, label) rows — never a transitive-closure blowup; rounds needed
    * = component diameter (near-dup clusters are small cliques, so single
    * digits; for adversarial chain-shaped graphs switch to the
    * large-star/small-star contraction, which converges in O(log n)
    * rounds). Labels only ever decrease, so sum(label) is a monotone
    * convergence witness — one scalar aggregate per round, no row-level
    * old-vs-new diff. Each round's result is cached and the previous
    * unpersisted: lineage stays O(1) deep per round and nothing leaks into
    * the shared session's storage. Deterministic by construction (min is
    * order-independent) → full DuckDB oracle via recursive CTE.
    */
  val qDedupClusters = Q(
    "q_dedup_clusters",
    (s, dir) => {
      val pairs = pairTable(s, dir).select(col("a"), col("b"))
      val edges = pairs.union(pairs.select(col("b"), col("a")))
        .toDF("src", "dst").cache()
      // iterate ONLY over the pair subgraph: docs in no pair are singleton
      // clusters by definition and join back at the end — the per-round
      // shuffles touch O(pairs) rows, not O(corpus), which at 100 TB is
      // the difference between reshuffling the lake per round and
      // reshuffling the (tiny) duplicate graph
      val pairDocs = edges.select(col("src").as("doc_id")).distinct()
      var labels = pairDocs.withColumn("lbl", col("doc_id")).cache()
      try {
        // sum over an EMPTY label set (corpus with no near-dup pairs) is
        // null — treat as 0 so the loop converges on the first check
        def labelSum(df: DataFrame): Long = {
          val r = df.agg(sum("lbl")).first()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        var prevSum = labelSum(labels)
        var converged = false
        var round = 0
        val maxRounds = 50
        while (!converged && round < maxRounds) {
          val prop = edges
            .join(labels.withColumnRenamed("doc_id", "src"), "src")
            .select(col("dst").as("doc_id"), col("lbl"))
          val next = labels.union(prop)
            .groupBy("doc_id").agg(min("lbl").as("lbl")).cache()
          val nextSum = labelSum(next)
          if (nextSum == prevSum) { next.unpersist(blocking = false); converged = true }
          else {
            labels.unpersist(blocking = false)
            labels = next
            prevSum = nextSum
            round += 1
          }
        }
        // a component with diameter > maxRounds (adversarial chain graph)
        // would exit the loop with WRONG labels; fail loudly instead of
        // silently diverging from the oracle — the fix at that shape is
        // the large-star/small-star contraction noted above
        require(converged,
          s"label propagation did not converge in $maxRounds rounds; " +
            "component diameter exceeds the cap — switch to " +
            "large-star/small-star contraction for chain-shaped graphs")
        // the loop ran its jobs against the caches, which are released
        // below — localCheckpoint materializes the fixpoint and TRUNCATES
        // the per-round lineage, so executing the returned plan later reads
        // the checkpointed rows instead of replaying every round uncached
        // (on a cluster, prefer a reliable checkpoint dir over executor
        // blocks)
        val fixpoint = labels.localCheckpoint(true)
        val singletons = Tables.documents(s, dir).select("doc_id")
          .join(fixpoint.select("doc_id"), Seq("doc_id"), "left_anti")
          .withColumn("lbl", col("doc_id"))
        fixpoint.union(singletons)
          .select(col("doc_id"), col("lbl").as("cluster_id"))
          .orderBy("doc_id")
      } finally {
        edges.unpersist(blocking = false)
        labels.unpersist(blocking = false)
      }
    },
    Some(s"""WITH RECURSIVE
               pairs AS (${qDedupJaccardPairs.oracle.get}),
               edges AS (SELECT a AS src, b AS dst FROM pairs
                         UNION ALL SELECT b, a FROM pairs),
               reach(doc_id, lbl) AS (
                 SELECT doc_id, doc_id FROM documents
                 UNION
                 SELECT e.dst, r.lbl
                 FROM reach r JOIN edges e ON e.src = r.doc_id)
             SELECT doc_id, min(lbl) AS cluster_id
             FROM reach GROUP BY doc_id ORDER BY doc_id"""))

  /** The same duplicate clusters through Graph.connectedComponents
    * (large-star/small-star contraction) — the O(log n)-round path that
    * survives chain-shaped components where min-label propagation needs
    * diameter rounds. Identical output contract and the IDENTICAL DuckDB
    * oracle as q_dedup_clusters, so the driver hash-proves the two
    * algorithms agree on the real pair graph every round; GraphSpec
    * additionally pins a diameter-200 chain (propagation's worst case).
    * Pair input comes from the shared materialized pair table, so this
    * adds only the contraction cost to the bench.
    */
  val qDedupClustersBigstar = Q(
    "q_dedup_clusters_bigstar",
    (s, dir) => {
      val pairs = pairTable(s, dir).select(col("a"), col("b"))
      val cc = Graph.connectedComponents(pairs)
      val singletons = Tables.documents(s, dir).select("doc_id")
        .join(cc.select(col("node")), col("doc_id") === col("node"),
          "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      cc.select(col("node").as("doc_id"), col("component").as("cluster_id"))
        .union(singletons)
        .orderBy("doc_id")
    },
    qDedupClusters.oracle)

  /** Embedding-space near-duplicate CLUSTERS: connected components over
    * the exact cosine near-dup pair graph (threshold 0.4) via the
    * large-star/small-star contraction — the brief's "embedding-cosine
    * near-dup" dedup completed from pairs to keeper groups, the same
    * pairs→components step q_dedup_clusters runs for text shingles. The
    * CC iterates only over the pair subgraph (vectors in no pair are
    * singletons by definition); the oracle chains the near-dup pair SQL
    * into the same recursive-CTE reachability used by q_dedup_clusters,
    * so the driver hash-proves pair generation AND contraction together.
    */
  /** Cosine near-dup pair table materialized once per (session, dir) —
    * same Incremental seam as the jaccard pairTable: the O(N²) scoring
    * join is the expensive part, and every downstream consumer (cluster
    * contraction, triangle census) re-reads the parquet instead of
    * re-scoring. q_sim_cosine_near_dup itself stays a live computation —
    * it IS the pair-generation benchmark.
    */
  private def embedPairTable(s: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.SourcesSinks
      .dirKeyedTempPath(s, dir, "embed_pairs")
    val (df, _) = graft.sources.Incremental.materialize(
      s, Seq(s"$dir/embeddings.parquet"), out)(
      cosineNearDupPairs(Tables.embeddings(s, dir), 0.4))
    df
  }

  // lazy: the oracle embeds qSimCosineNearDup's SQL, which is declared
  // later in this object — a strict val here would read null at init
  lazy val qDedupEmbedClusters: Q = Q(
    "q_dedup_embed_clusters",
    (s, dir) => {
      val pairs = embedPairTable(s, dir).select(col("a"), col("b"))
      val cc = Graph.connectedComponents(pairs)
      val singletons = Tables.embeddings(s, dir).select("vec_id")
        .join(cc.select(col("node")), col("vec_id") === col("node"),
          "left_anti")
        .select(col("vec_id"), col("vec_id").as("cluster_id"))
      cc.select(col("node").as("vec_id"), col("component").as("cluster_id"))
        .union(singletons)
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE
               pairs AS (${graft.Det.sqlDropOrderBy(
                  qSimCosineNearDup.oracle.get, "ORDER BY a, b")}),
               edges AS (SELECT a AS src, b AS dst FROM pairs
                         UNION ALL SELECT b, a FROM pairs),
               reach(vec_id, lbl) AS (
                 SELECT vec_id, vec_id FROM embeddings
                 UNION
                 SELECT e.dst, r.lbl
                 FROM reach r JOIN edges e ON e.src = r.vec_id)
             SELECT vec_id, min(lbl) AS cluster_id
             FROM reach GROUP BY vec_id ORDER BY vec_id"""))

  /** Per-node LOCAL clustering coefficient over the near-dup pair graph —
    * the node-resolution companion to q_graph_triangles' global census:
    * lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), where tri(v) = edges among
    * v's neighbors. A doc sitting in a true duplicate clique scores ≈1;
    * a doc gluing two unrelated clusters (the chained-false-positive
    * failure mode) scores near 0 — this is the per-doc signal a curation
    * pipeline uses to cut poisoned components before survivor election.
    * tri(v) enumerates wedges centered at v (adjacency self-join on the
    * center, x < y canonical order) and closes them against the (a<b)
    * edge list — each neighbor-edge counted once per center. Scale: wedge
    * fan-out is Σ deg², the same bound as q_graph_adamic_adar; on the
    * near-dup graph degrees are clique-sized by construction. For general
    * graphs the standard degree-ordered orientation halves the work —
    * noted, not needed at clique-shaped degrees. All-integer until the
    * one shared-text coefficient division (deg < 2 → 0.0, no pole).
    */
  val qGraphClusteringCoeff = Q(
    "q_graph_clustering_coeff",
    (s, dir) => {
      val e = pairTable(s, dir).select(col("a"), col("b"))
      val und = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
        .toDF("n", "x")
      val deg = und.groupBy("n").agg(count(lit(1)).as("deg"))
      val tri = und.select(col("n"), col("x").as("a"))
        .join(und.select(col("n"), col("x").as("b")), Seq("n"))
        .where(col("a") < col("b"))
        .join(e, Seq("a", "b"))
        .groupBy("n").agg(count(lit(1)).as("tri"))
      deg.join(tri, Seq("n"), "left")
        .select(col("n").as("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("n_tri"),
          expr("CASE WHEN deg < 2 THEN CAST(0.0 AS DOUBLE) " +
            "ELSE CAST(2.0 AS DOUBLE) * CAST(coalesce(tri, 0) AS DOUBLE) " +
            "/ (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)) END")
            .as("lcc"))
        .orderBy("node")
    },
    Some(s"""WITH e AS (SELECT a, b FROM
                  (${Det.sqlDropOrderBy(qDedupJaccardPairs.oracle.get,
                     "ORDER BY a, b")})),
              und AS (SELECT a AS n, b AS x FROM e
                      UNION ALL SELECT b, a FROM e),
              deg AS (SELECT n, count(*) AS deg FROM und GROUP BY n),
              tri AS (SELECT u1.n, count(*) AS tri
                      FROM und u1 JOIN und u2
                        ON u1.n = u2.n AND u1.x < u2.x
                      JOIN e ON e.a = u1.x AND e.b = u2.x
                      GROUP BY u1.n)
            SELECT deg.n AS node, deg.deg,
                   COALESCE(tri.tri, 0) AS n_tri,
                   CASE WHEN deg.deg < 2 THEN CAST(0.0 AS DOUBLE)
                        ELSE CAST(2.0 AS DOUBLE)
                          * CAST(COALESCE(tri.tri, 0) AS DOUBLE)
                          / (CAST(deg.deg AS DOUBLE)
                             * CAST(deg.deg - 1 AS DOUBLE)) END AS lcc
            FROM deg LEFT JOIN tri ON deg.n = tri.n
            ORDER BY node"""))

  /** Triangle census of the near-dup pair graph — the structural health
    * check a dedup pipeline runs on its candidate graph (a true duplicate
    * cluster is a near-clique: many triangles per wedge; a low clustering
    * coefficient flags chained false positives gluing distinct docs into
    * one component). Triangles count via the canonical a<b<c ordered
    * 3-join over the (a<b) edge list — each triangle counted exactly once,
    * no orientation dedup pass; wedges Σ d(d−1)/2 from one degree
    * aggregate. All-integer until the final coefficient division (guarded
    * for the wedge-free graph). Reads the materialized pair table, so the
    * census costs three shuffle joins over the (tiny) duplicate subgraph —
    * never touches the corpus.
    */
  val qGraphTriangles = Q(
    "q_graph_triangles",
    (s, dir) =>
      Graph.triangleCensus(pairTable(s, dir).select(col("a"), col("b"))),
    Some(s"""WITH e AS (SELECT a, b FROM
                  (${qDedupJaccardPairs.oracle.get.replace(
                      "ORDER BY a, b", "")})),
              nodes AS (SELECT a AS n FROM e UNION ALL SELECT b FROM e),
              deg AS (SELECT n, count(*) AS d FROM nodes GROUP BY n),
              agg AS (SELECT
                  (SELECT count(*) FROM deg) AS n_nodes,
                  (SELECT count(*) FROM e) AS n_edges,
                  (SELECT COALESCE(CAST(sum(d * (d - 1) // 2) AS BIGINT), 0)
                   FROM deg) AS n_wedges,
                  (SELECT count(*)
                   FROM e e1 JOIN e e2 ON e1.b = e2.a
                        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
                    AS n_triangles)
            SELECT n_nodes, n_edges, n_wedges, n_triangles,
                   CASE WHEN n_wedges = 0 THEN CAST(0.0 AS DOUBLE)
                        ELSE CAST(3.0 AS DOUBLE) * n_triangles / n_wedges
                        END AS clustering_coeff
            FROM agg"""))

  /** Per-doc token-distribution (Shannon) entropy — the diversity signal
    * quality filters use to catch keyword-stuffed / boilerplate docs that
    * length and type-token ratio miss. H = −Σ p·ln(p) over the doc's
    * token frequencies. Determinism: ln is bit-identical across Java's
    * Math.log, glibc and DuckDB (verified empirically, 0/1900 ulp
    * mismatches across magnitudes); double ADDITION order is not — and a
    * window running-sum is no rescue, because DuckDB evaluates window
    * aggregates with a SEGMENT TREE (pairwise combine order, not the
    * sequential fold Spark runs). So each p·ln(p) term — itself a fixed
    * IEEE op sequence from shared formula text — goes through the Dec12
    * doctrine: cast to DECIMAL(38,12), summed exactly (order-free), one
    * final cast back. Entropy ≤ ln(vocab) ≈ 10, far inside scale-12
    * headroom. Plan: explode → two-level agg + one bounded window for the
    * doc total — no rounding anywhere.
    */
  private val entropyTerm =
    "(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))"

  /** Entropy pipeline over any documents frame (doc_id, text) — exposed
    * for degenerate-input tests; see qTextEntropy for the doctrine.
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val cnts = tok.groupBy("doc_id", "w")
      .agg(count(lit(1)).as("cnt"))
    val wDoc = Window.partitionBy("doc_id")
    cnts
      .withColumn("n", sum(col("cnt")).over(wDoc))
      .withColumn("term", expr(entropyTerm))
      .groupBy("doc_id")
      .agg(first(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        (-sum(col("term").cast(Det.Dec12)).cast(DoubleType))
          .as("entropy"))
      .orderBy("doc_id")
  }

  val qTextEntropy = Q(
    "q_text_entropy",
    (s, dir) => tokenEntropy(Tables.documents(s, dir)),
    Some(s"""WITH tok AS (SELECT doc_id, w
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                        FROM documents) WHERE w <> ''),
             cnts AS (SELECT doc_id, w, count(*) AS cnt
                      FROM tok GROUP BY doc_id, w),
             terms AS (SELECT doc_id, w, cnt,
                         sum(cnt) OVER (PARTITION BY doc_id) AS n
                       FROM cnts)
             SELECT doc_id, CAST(first(n) AS BIGINT) AS n_tokens,
                    count(*) AS n_types,
                    -CAST(sum(CAST(($entropyTerm) AS DECIMAL(38,12)))
                          AS DOUBLE) AS entropy
             FROM terms GROUP BY doc_id ORDER BY doc_id"""))

  /** Flesch-style readability scoring — the classic quality-filter signal
    * for instruction/tutorial corpora. Syllables are proxied by vowel-
    * group runs ([aeiouy]+ on the lowercased text — a standard public
    * approximation), sentences by [.!?]+ runs with non-blank content.
    * Both counts are plain character-class regexes that Java's engine and
    * RE2 treat identically (no lookaround/backrefs — the same contract
    * q_text_lang_id relies on). The Flesch formula is shared text over
    * exact integer counts; non-prose degenerate docs (no sentence marks /
    * no words) yield NULL rather than an infinity.
    */
  private val fleschFormula =
    "CAST(206.835 AS DOUBLE) - CAST(1.015 AS DOUBLE) * " +
      "(CAST(w AS DOUBLE) / CAST(sent AS DOUBLE)) - " +
      "CAST(84.6 AS DOUBLE) * (CAST(vg AS DOUBLE) / CAST(w AS DOUBLE))"

  /** Readability pipeline over any documents frame — exposed for
    * degenerate-input tests; see qTextReadability for the doctrine.
    */
  def readability(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").as("w"),
          expr("size(filter(split(text, '[.!?]+'), " +
            "x -> length(trim(x)) > 0))").as("sent"),
          expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
            .as("vg"))
        .select(col("doc_id"), col("w").cast("long").as("n_words"),
          col("sent").cast("long").as("n_sentences"),
          col("vg").cast("long").as("n_vowel_groups"),
          when(col("w") > 0 && col("sent") > 0, expr(fleschFormula))
            .as("flesch"))
        .orderBy("doc_id")

  val qTextReadability = Q(
    "q_text_readability",
    (s, dir) => readability(Tables.documents(s, dir)),
    Some(s"""SELECT doc_id, w AS n_words, sent AS n_sentences,
                    vg AS n_vowel_groups,
                    CASE WHEN w > 0 AND sent > 0 THEN $fleschFormula
                         ELSE NULL END AS flesch
             FROM (SELECT doc_id,
                     CAST(len(list_filter(string_split(text, ' '),
                       x -> x <> '')) AS BIGINT) AS w,
                     CAST(len(list_filter(
                       regexp_split_to_array(text, '[.!?]+'),
                       x -> length(trim(x)) > 0)) AS BIGINT) AS sent,
                     CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS BIGINT) AS vg
                   FROM documents)
             ORDER BY doc_id"""))

  private val MinhashK = 16  // 4 bands × 4 rows
  private val MinhashBands = 4
  private val MinhashP = 4294967311L // smallest prime > 2^32

  /** Universal-hash MinHash family h_i(x) = (a_i·x + b_i) mod p over a
    * 32-bit base hash. Constants derive from chained XXH64 (seed-fixed, so
    * the family is part of the operator definition); a_i is capped at 2^30
    * so a_i·h < 2^62 never overflows signed-64 arithmetic — which is what
    * makes the EXACT same integers computable in DuckDB SQL (the oracle
    * embeds the same (a_i, b_i) literals). One md5 per shingle + K affine
    * transforms replaces K independent string hashes (~16× less hashing).
    */
  private def mhAB(i: Int): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def pos(h: Long): Long = h & Long.MaxValue
    val a = pos(XXH64.hashLong(i.toLong, 7L)) % (1L << 30) + 1L
    val b = pos(XXH64.hashLong(i.toLong, 13L)) % MinhashP
    (a, b)
  }

  /** MinHash+LSH near-dup: the 100 TB path. Candidate pairs come from a
    * groupBy on (band, band-signature) — NO pairwise join over the corpus —
    * then only candidates get exact Jaccard verification. The portable
    * md5-based base hash (Det.pHash32) plus the integer universal-hash
    * family make the identical signatures computable in DuckDB → full
    * oracle; unit test asserts recall ≥ 0.9 vs the exact query.
    */
  val qDedupMinhashLsh = Q(
    "q_dedup_minhash_lsh",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // r21: the whole per-doc frame is MAP-SIDE now. ShingleMd5Set
      // yields the sorted pHash32 multiset over per-doc distinct
      // shingle strings (value-identical to shingleSets + Det.pHash32,
      // pinned by R21OptSpec) — which IS sort_array(collect_list(h));
      // MinhashSigs folds the K universal-hash minima over that array
      // in one pass (same long arithmetic as the min((a*h+b)%p)
      // aggregates it replaces, pinned by R21OptSpec). The (doc_id, h)
      // explode + groupBy exchange is gone — a MinHash signature is a
      // per-document value, the map-side-signature property that makes
      // it the 100 TB path. n = size(hs) = the old count(1).
      graft.plans.VectorFunctions.register(s)
      val r = MinhashK / MinhashBands
      val ab = (0 until MinhashK).map(mhAB)
      val sigsFn = graft.plans.VectorFunctions.registerMinhashSigs(
        s, ab.map(_._1), ab.map(_._2), MinhashP)
      // r22 (verdict #3): single-evaluation pin. The r21 map-side form
      // left the kernel re-evaluated up to ~6× per doc — THREE scans of
      // documents (bands + both verify sides) each recomputing
      // shingle_md5p32_set, and the pushed size(hs) > 0 filter evaluating
      // it a second time per scan. Two fixes: (a) the row filter is the
      // CHEAP pushable predicate size(split) ≥ 3 — equivalent to
      // size(hs) > 0 by the ShingleKernel < 3-token contract — so the
      // kernel never rides a Filter; (b) the per-doc (sigs, hs, n) frame
      // is localCheckpoint-pinned, so the kernel runs ONCE per document
      // and bands/verify read the pinned rows. The pin is the same bytes
      // the pre-r21 (doc_id, h) groupBy exchange materialized (~550 B/doc
      // — doc-bounded, never pair-bounded), traded for ~6× of the
      // dominant md5-per-shingle map cost; recomputed per invocation.
      val perDoc = docs
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          expr("shingle_md5p32_set(split(text, ' '))").as("hs"))
        .withColumn("sigs", expr(s"$sigsFn(hs)"))
        .select(Seq(col("doc_id")) ++
          (0 until MinhashK).map(i =>
            expr(s"sigs[$i]").as(s"sig_$i")) ++
          Seq(col("hs"), size(col("hs")).cast(LongType).as("n")): _*)
        .localCheckpoint(true)
      // band key = ordered concat of the r signature values in the band
      val bandKeys = (0 until MinhashBands).map { b =>
        concat_ws(",", (b * r until (b + 1) * r)
          .map(i => col(s"sig_$i").cast("string")): _*).as(s"band_$b")
      }
      val bands = perDoc
        .select(col("doc_id") +: bandKeys: _*)
        .select(col("doc_id"), posexplode(
          array((0 until MinhashBands).map(b => col(s"band_$b")): _*)))
        .select(col("doc_id"), col("pos").as("band"),
          col("col").as("band_key"))
      // in-bucket pair expansion — signature subtree computed once, no
      // self-join (see expandBucketPairs); oversized buckets dropped, the
      // cap mirrored in the oracle's bsz CTE
      val cand = expandBucketPairs(
          bands.groupBy("band", "band_key")
            .agg(sort_array(collect_list(col("doc_id"))).as("ids")),
          "ids", "struct(x AS a, y AS b)", Nil)
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
      // exact verification on candidates ONLY: each pair gets both docs'
      // sorted hash sets attached and intersected in-place (codegen
      // array_intersect) — no corpus-wide equi-join on shingles.
      // The sets hold 32-bit hashes (pHash32, shared with the signatures),
      // so `inter` can overcount on a hash collision: P ≈ n²/2³³ per doc
      // pair (n = shingles per doc, ~50 here → ~3e-7). The oracle computes
      // the same hashes, so parity is unaffected; a corpus with million-
      // shingle docs should switch the verification sets to pHash60.
      val slim = perDoc.select(col("doc_id"), col("hs"), col("n"))
      cand
        .join(slim.toDF("a", "ha", "na"), "a")
        .join(slim.toDF("b", "hb", "nb"), "b")
        .withColumn("inter",
          size(array_intersect(col("ha"), col("hb"))).cast(LongType))
        .withColumn("jac", col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
        .where(col("jac") >= 0.5)
        .select("a", "b", "jac")
        .orderBy("a", "b")
    },
    Some {
      val r = MinhashK / MinhashBands
      val sigDefs = (0 until MinhashK).map { i =>
        val (a, b) = mhAB(i)
        s"min(($a * h + $b) % $MinhashP) AS s_$i"
      }.mkString(", ")
      val bandKeys = (0 until MinhashBands).map { b =>
        (b * r until (b + 1) * r)
          .map(i => s"CAST(s_$i AS VARCHAR)").mkString(" || ',' || ")
      }.mkString("[", ", ", "]")
      val bandIdx = (0 until MinhashBands).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                     FROM documents
                     WHERE len(string_split(text, ' ')) >= 3),
               sh AS (SELECT DISTINCT doc_id,
                        unnest([array_to_string(toks[i:i+2], ' ')
                                FOR i IN range(1, greatest(len(toks)-1, 1))])
                          AS shingle
                      FROM d),
               hs AS (SELECT doc_id, ${Det.sqlPHash32("shingle")} AS h
                      FROM sh),
               sig AS (SELECT doc_id, $sigDefs FROM hs GROUP BY doc_id),
               bands AS (SELECT doc_id, unnest($bandIdx) AS band,
                                unnest($bandKeys) AS band_key
                         FROM sig),
               bsz AS (SELECT band, band_key, count(*) AS m
                       FROM bands GROUP BY band, band_key),
               cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                        FROM bands x JOIN bands y
                          ON x.band = y.band AND x.band_key = y.band_key
                         AND x.doc_id < y.doc_id
                        JOIN bsz s
                          ON s.band = x.band AND s.band_key = x.band_key
                         AND s.m <= $MaxBucket),
               sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               p AS (SELECT c.a, c.b, count(*) AS inter
                     FROM cand c
                     JOIN sh x ON x.doc_id = c.a
                     JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
                     GROUP BY c.a, c.b)
          SELECT a, b, CAST(inter AS DOUBLE)
                         / CAST(sa.n + sb.n - inter AS DOUBLE) AS jac
          FROM p JOIN sz sa ON p.a = sa.doc_id
                 JOIN sz sb ON p.b = sb.doc_id
          WHERE CAST(inter AS DOUBLE)
                  / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.5
          ORDER BY a, b"""
    })

  /** SimHash near-dup: 60-bit signature (sign of tf-weighted hash-bit sums
    * over the portable md5-60bit token hash), banded into 4×15-bit keys for
    * Hamming-≤3 candidate generation, then exact Hamming verification via
    * bit_count(xor). The signature arithmetic is pure integer sums over a
    * hash both engines compute identically → full DuckDB oracle. 60 bits
    * (not 64) because Det.pHash60 is the widest md5 prefix that fits a
    * signed BIGINT in both engines.
    */
  val qDedupSimhash = Q(
    "q_dedup_simhash",
    (s, dir) => {
      val tok = tokens(Tables.documents(s, dir))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .withColumn("h", Det.pHash60(col("tok")))
      // 60 per-bit tf-weighted sums in ONE codegen aggregation pass (no
      // 60x row explosion, no interpreted lambda), then fold signs to bits
      val bitSums = (0 until 60).map(j =>
        sum(expr(s"CASE WHEN ((h >> $j) & 1) = 1 THEN tf ELSE -tf END"))
          .as(s"w_$j"))
      val bitsExpr = (0 until 60).map(j =>
        s"(CASE WHEN w_$j > 0 THEN shiftleft(CAST(1 AS BIGINT), $j) " +
          s"ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
      val sig = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash", expr(bitsExpr))
        .select("doc_id", "simhash")
      val banded = sig.select(col("doc_id"), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> (simhash >> (b * 15)) & 32767)")))
        .select(col("doc_id"), col("simhash"), col("pos").as("band"),
          col("col").as("band_key"))
      // in-bucket pair expansion — the signature subtree (tokenize + 60-way
      // aggregate) is computed once, not once per self-join side; oversized
      // buckets dropped, the cap mirrored in the oracle's bsz CTE
      expandBucketPairs(
          banded.groupBy("band", "band_key")
            .agg(sort_array(
              collect_list(struct(col("doc_id"), col("simhash")))).as("ids")),
          "ids",
          "struct(x.doc_id AS a, y.doc_id AS b, " +
            "x.simhash AS sa, y.simhash AS sb)", Nil)
        .select(col("p.a").as("a"), col("p.b").as("b"),
          col("p.sa").as("sa"), col("p.sb").as("sb"))
        .distinct()
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
        .where(col("hamming") <= 3)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    },
    Some(s"""WITH tok AS (SELECT doc_id, tok, count(*) AS tf
                          FROM (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS tok
                                FROM documents)
                          WHERE tok <> '' GROUP BY doc_id, tok),
                 th AS (SELECT doc_id, tf, ${Det.sqlPHash60("tok")} AS h
                        FROM tok),
                 bits AS (SELECT doc_id, j.j AS j,
                            sum(CASE WHEN ((h >> j.j) & 1) = 1
                                     THEN tf ELSE -tf END) AS w
                          FROM th CROSS JOIN range(60) AS j(j)
                          GROUP BY doc_id, j.j),
                 sig AS (SELECT doc_id,
                           CAST(sum(CASE WHEN w > 0
                                         THEN (CAST(1 AS BIGINT) << j)
                                         ELSE 0 END) AS BIGINT) AS simhash
                         FROM bits GROUP BY doc_id),
                 banded AS (SELECT doc_id, simhash, b.b AS band,
                              (simhash >> (b.b * 15)) & 32767 AS band_key
                            FROM sig CROSS JOIN range(4) AS b(b)),
                 bsz AS (SELECT band, band_key, count(*) AS m
                         FROM banded GROUP BY band, band_key),
                 cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                                 x.simhash AS sa, y.simhash AS sb
                          FROM banded x JOIN banded y
                            ON x.band = y.band AND x.band_key = y.band_key
                           AND x.doc_id < y.doc_id
                          JOIN bsz s
                            ON s.band = x.band AND s.band_key = x.band_key
                           AND s.m <= $MaxBucket)
            SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
            ORDER BY a, b"""))

  /** End-to-end curation verdicts — the composition a training-data
    * pipeline actually ships: every doc gets exactly one verdict under the
    * precedence duplicate → too_short → too_long → low_quality → keep.
    * "Duplicate" = greedy keep-first near-dup dedup: a doc is dropped iff
    * it is the LARGER id of some jaccard-0.5 pair (for pair cliques this
    * keeps exactly the min member; q_dedup_clusters is the
    * transitive-closure refinement). Quality/length reuse the exact
    * q_text_quality formulas, so the stages compose without re-deriving
    * semantics.
    *
    * Scale posture: verdict columns are pure per-row projections; the dup
    * flag is one left semi-style join against the (tiny relative to
    * corpus) pair b-side — broadcastable in practice, hash join at worst.
    * The verdict columns add one pruned scan and one join on top of the
    * pair query's own cost (in production the pair graph is a precomputed
    * table, making this a pure scan + small join).
    */
  val qCorpusCurate = Q(
    "q_corpus_curate",
    (s, dir) => {
      val dupB = pairTable(s, dir)
        .select(col("b").as("doc_id")).distinct()
        .withColumn("is_dup", lit(1))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast(LongType)
            .as("n_types"))
        .withColumn("quality", round(
          least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)) *
            (col("n_types").cast(DoubleType) /
              col("n_tokens").cast(DoubleType)), 6))
        .join(dupB, Seq("doc_id"), "left")
        .withColumn("verdict",
          when(col("is_dup").isNotNull, "duplicate")
            .when(col("n_tokens") < 15, "too_short")
            .when(col("n_tokens") > 95, "too_long")
            .when(col("quality") < 0.12, "low_quality")
            .otherwise("keep"))
        .select("doc_id", "n_tokens", "quality", "verdict")
        .orderBy("doc_id")
    },
    Some(s"""WITH pairs AS (${qDedupJaccardPairs.oracle.get}),
                  dupb AS (SELECT DISTINCT b AS doc_id FROM pairs),
                  q AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS n_tokens,
                          CAST(len(list_distinct(string_split(text, ' ')))
                            AS BIGINT) AS n_types
                        FROM documents)
             SELECT q.doc_id, q.n_tokens,
                    round(least(CAST(q.n_tokens AS DOUBLE) / 100.0, 1.0)
                      * (CAST(q.n_types AS DOUBLE)
                         / CAST(q.n_tokens AS DOUBLE)), 6) AS quality,
                    CASE WHEN d.doc_id IS NOT NULL THEN 'duplicate'
                         WHEN q.n_tokens < 15 THEN 'too_short'
                         WHEN q.n_tokens > 95 THEN 'too_long'
                         WHEN round(least(CAST(q.n_tokens AS DOUBLE) / 100.0,
                                          1.0)
                           * (CAST(q.n_types AS DOUBLE)
                              / CAST(q.n_tokens AS DOUBLE)), 6) < 0.12
                           THEN 'low_quality'
                         ELSE 'keep' END AS verdict
             FROM q LEFT JOIN dupb d ON q.doc_id = d.doc_id
             ORDER BY q.doc_id"""))

  /** Dedup SURVIVOR ELECTION — the actionable manifest the dedup family
    * exists to produce (pairs and clusters are diagnostics; a pipeline
    * keeps exactly one doc per duplicate cluster and needs to know
    * WHICH): per connected near-dup cluster, the member with the highest
    * curation quality wins (tie → min doc_id — deterministic), emitted
    * with the cluster census (members, dropped). Quality is the
    * q_corpus_curate formula verbatim; clusters are the q_dedup_clusters
    * fixpoint (shared pair store — this query adds only the election
    * joins). The argmax is max-then-equality-join + min tie-break, NOT
    * max_by (tie-unspecified) and NOT a per-cluster window (the semdedup
    * scale posture). Oracle: the recursive-CTE clusters composed with
    * the same quality text.
    */
  val qDedupSurvivors = Q(
    "q_dedup_survivors",
    (s, dir) => {
      val clusters = qDedupClusters.fn(s, dir)
      val q = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast(LongType)
            .as("n_types"))
        .withColumn("quality", round(
          least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)) *
            (col("n_types").cast(DoubleType) /
              col("n_tokens").cast(DoubleType)), 6))
        .select("doc_id", "quality")
      val scored = clusters.join(q, "doc_id")
      val mx = scored.groupBy("cluster_id")
        .agg(max(col("quality")).as("best_quality"),
          count(lit(1)).as("n_members"))
      scored.join(mx, "cluster_id")
        .where(col("quality") === col("best_quality"))
        .groupBy("cluster_id", "best_quality", "n_members")
        .agg(min(col("doc_id")).as("survivor"))
        .select(col("cluster_id"), col("survivor"), col("n_members"),
          (col("n_members") - 1).as("n_dropped"), col("best_quality"))
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE
               pairs AS (${qDedupJaccardPairs.oracle.get}),
               edges AS (SELECT a AS src, b AS dst FROM pairs
                         UNION ALL SELECT b, a FROM pairs),
               reach(doc_id, lbl) AS (
                 SELECT doc_id, doc_id FROM documents
                 UNION
                 SELECT e.dst, r.lbl
                 FROM reach r JOIN edges e ON e.src = r.doc_id),
               clusters AS (SELECT doc_id, min(lbl) AS cluster_id
                            FROM reach GROUP BY doc_id),
               q AS (SELECT doc_id,
                       round(least(CAST(len(string_split(text, ' '))
                           AS DOUBLE) / 100.0, 1.0)
                         * (CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE)
                            / CAST(len(string_split(text, ' '))
                              AS DOUBLE)), 6) AS quality
                     FROM documents),
               scored AS (SELECT c.doc_id, c.cluster_id, q.quality
                          FROM clusters c JOIN q ON c.doc_id = q.doc_id),
               mx AS (SELECT cluster_id, max(quality) AS best_quality,
                        CAST(count(*) AS BIGINT) AS n_members
                      FROM scored GROUP BY cluster_id)
             SELECT s.cluster_id, min(s.doc_id) AS survivor,
                    m.n_members, m.n_members - 1 AS n_dropped,
                    m.best_quality
             FROM scored s JOIN mx m ON s.cluster_id = m.cluster_id
               AND s.quality = m.best_quality
             GROUP BY s.cluster_id, m.n_members, m.best_quality
             ORDER BY s.cluster_id"""))

  // ------------------------------------------------------- similarity

  /** Per-label centroid embeddings in long form (label, dim, n, mu) — the
    * class-prototype / coarse-quantizer build step of a curation pipeline
    * (IVF cells, per-domain prototypes, outlier scoring all start here).
    * posexplode + one groupBy((label, dim)) is a LINEAR dim-fold with a
    * single shuffle whose key space (labels × dims) is tiny — scale-safe at
    * any corpus size. Components sum via the Det decimal policy, so the
    * result is partition-order-independent and matches DuckDB bit-exactly
    * (ml.stat.Summarizer.mean would be one pass without the explode, but
    * its double accumulation is order-dependent → no oracle; at 64 dims the
    * explode costs nothing).
    */
  val qEmbedCentroids = Q(
    "q_embed_centroids",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos").cast(IntegerType).as("dim"))
        .agg(count(lit(1)).as("n"),
          round(Det.davg12(col("col")), 6).as("mu"))
        .orderBy("label", "dim"),
    Some(s"""WITH ex AS (SELECT label,
                    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                    unnest(embedding) AS x
                  FROM embeddings)
             SELECT label, dim, count(*) AS n,
                    round(${Det.sqlAvg12("x")}, 6) AS mu
             FROM ex GROUP BY label, dim ORDER BY label, dim"""))

  /** Semantic dedup (the SemDeDup shape): within each label cluster, the
    * vector CLOSEST to the class centroid is the kept prototype and every
    * other vector inside the redundant core (cosine-to-centroid ≥ 0.25)
    * is droppable — the curation step that thins dense regions of
    * embedding space where near-interchangeable samples add tokens but no
    * diversity. Per-vec verdict table (proto / drop / keep).
    *
    * Determinism: centroid COMPONENTS are Dec12 order-free means
    * quantized to 6 decimals (the exact qEmbedCentroids OUTPUT contract
    * — see the inline comment for why the raw davg12 double is not
    * cross-engine safe here);
    * the centroid is then assembled into a dim-ordered DOUBLE array and
    * every dot product (x·mu, x·x, mu·mu) runs through vec_dot ≡
    * list_dot_product — the same sequential left-to-right IEEE fold
    * contract the ann_lsh family certifies — so cosines are
    * BIT-IDENTICAL across engines with NO rounding step at all: raw
    * doubles hash-match. (A Dec12 quantization of the PRODUCTS instead
    * hits the engines' double→decimal rounding-rule divergence — the
    * same trap as round(); it failed parity at sf0.1 by one last-ulp
    * row.) The prototype is resolved by max(cos) + min(vec_id)-among-
    * ties (two aggregates + an equality join on the exact double), NOT
    * max_by (tie-unspecified) and NOT a per-label window rank: at
    * 100 TB a full sort inside a 10-key partition is one task per
    * label, while this shape is all map-side combinable aggregation.
    * Scale: the centroid explode is a linear dim-fold on a
    * (labels × dims) key space; the k-row centroid-array table
    * broadcasts onto the corpus scan — scoring is one codegen pass,
    * no per-vector shuffle at all.
    */
  val qEmbedSemdedup = Q(
    "q_embed_semdedup",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val ex = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"),
          col("pos").cast(IntegerType).as("dim"),
          col("col").cast(DoubleType).as("x"))
      // mu at 6 decimals — the qEmbedCentroids OUTPUT contract (proven
      // hash-green tri-scale), not the raw davg12 double: one raw
      // component hit an exact decimal tie at the 1e-12 quantum where
      // DuckDB rounds half-even on the exact expansion and Spark
      // half-up on the shortest repr (2e-14 apart) — the 6-decimal
      // quantize is upstream of every dot product, so the engines score
      // against bit-identical centroids
      val cva = ex.groupBy("label", "dim")
        .agg(round(Det.davg12(col("x")), 6).as("mu"))
        .groupBy("label")
        .agg(expr(
          "transform(sort_array(collect_list(struct(dim, mu))), s -> s.mu)")
          .as("cva"))
        .withColumn("dcc", expr("vec_dot(cva, cva)"))
      val scored = Tables.embeddings(s, dir)
        .join(broadcast(cva), Seq("label"))
        .select(col("vec_id"), col("label"),
          (expr("vec_dot(embedding, cva)") /
            (sqrt(expr("vec_dot(embedding, embedding)")) *
              sqrt(col("dcc")))).as("cos_c"))
      val mx = scored.groupBy("label").agg(max(col("cos_c")).as("m"))
      val proto = scored.join(broadcast(mx), Seq("label"))
        .where(col("cos_c") === col("m"))
        .groupBy("label").agg(min(col("vec_id")).as("pv"))
      scored.join(broadcast(proto), Seq("label"))
        .select(col("vec_id"), col("label"), col("cos_c"),
          when(col("vec_id") === col("pv"), "proto")
            .when(col("cos_c") >= 0.25, "drop")
            .otherwise("keep").as("verdict"))
        .orderBy("vec_id")
    },
    Some(s"""WITH ex AS (SELECT vec_id, label,
                    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                    unnest(embedding) AS x
                  FROM embeddings),
                 cent AS (SELECT label, dim,
                            round(${Det.sqlAvg12("x")}, 6) AS mu
                          FROM ex GROUP BY label, dim),
                 cva AS (SELECT label, list(mu ORDER BY dim) AS cva
                         FROM cent GROUP BY label),
                 s AS (SELECT e.vec_id, e.label,
                         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          c.cva) /
                           (sqrt(list_dot_product(
                              CAST(e.embedding AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[]))) *
                            sqrt(list_dot_product(c.cva, c.cva))) AS cos_c
                       FROM embeddings e JOIN cva c ON e.label = c.label),
                 mx AS (SELECT label, max(cos_c) AS m FROM s GROUP BY label),
                 proto AS (SELECT s.label, min(s.vec_id) AS pv
                           FROM s JOIN mx ON s.label = mx.label
                            AND s.cos_c = mx.m
                           GROUP BY s.label)
             SELECT s.vec_id, s.label, s.cos_c,
                    CASE WHEN s.vec_id = p.pv THEN 'proto'
                         WHEN s.cos_c >= 0.25 THEN 'drop'
                         ELSE 'keep' END AS verdict
             FROM s JOIN proto p ON s.label = p.label
             ORDER BY s.vec_id"""))

  /** Global mean-centering + renorm readout — the standard embedding
    * PREPROCESSING step before ANN/clustering (an off-center embedding
    * cloud wrecks cosine contrast; centering restores it — the
    * whitening-lite every retrieval pipeline runs): per vector, the norm
    * before/after subtracting the corpus-mean vector and the cosine to
    * the mean. No centered vector is materialized — the centered norm is
    * the EXPANSION ‖x−μ‖² = x·x − 2·x·μ + μ·μ over three vec_dot
    * products (bit-exact: the semdedup doctrine — μ assembled from
    * 6-decimal Dec12 per-dim means, every dot a sequential fold ≡
    * list_dot_product; the combination is shared-formula IEEE, clamped
    * at 0 so rounding can't NaN the sqrt). Scale: one 64-key explode
    * aggregate for μ, then a broadcast of one array row onto the corpus
    * scan — scoring is a single codegen pass, zero per-vector shuffle.
    */
  val qEmbedCenter = Q(
    "q_embed_center",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val ex = Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")))
        .select(col("pos").cast(IntegerType).as("dim"),
          col("col").cast(DoubleType).as("x"))
      val mu = ex.groupBy("dim")
        .agg(round(Det.davg12(col("x")), 6).as("mu"))
        .agg(expr(
          "transform(sort_array(collect_list(struct(dim, mu))), s -> s.mu)")
          .as("mva"))
        .withColumn("dmm", expr("vec_dot(mva, mva)"))
      Tables.embeddings(s, dir).crossJoin(broadcast(mu))
        .select(col("vec_id"),
          expr("vec_dot(embedding, embedding)").as("dxx"),
          expr("vec_dot(embedding, mva)").as("dxm"),
          col("dmm"))
        .select(col("vec_id"),
          sqrt(col("dxx")).as("norm_before"),
          sqrt(greatest(
            col("dxx") - lit(2.0) * col("dxm") + col("dmm"),
            lit(0.0))).as("norm_after"),
          (col("dxm") / (sqrt(col("dxx")) * sqrt(col("dmm"))))
            .as("cos_to_mean"))
        .orderBy("vec_id")
    },
    Some(s"""WITH ex AS (SELECT vec_id,
                    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                    unnest(embedding) AS x
                  FROM embeddings),
                 cent AS (SELECT dim, round(${Det.sqlAvg12("x")}, 6) AS mu
                          FROM ex GROUP BY dim),
                 mv AS (SELECT list(mu ORDER BY dim) AS mva FROM cent),
                 d AS (SELECT e.vec_id,
                         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS dxx,
                         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                           mva) AS dxm,
                         list_dot_product(mva, mva) AS dmm
                       FROM embeddings e CROSS JOIN mv)
             SELECT vec_id, sqrt(dxx) AS norm_before,
                    sqrt(greatest(dxx - 2.0 * dxm + dmm, 0.0))
                      AS norm_after,
                    dxm / (sqrt(dxx) * sqrt(dmm)) AS cos_to_mean
             FROM d ORDER BY vec_id"""))

  /** Int8 scalar quantization of the embedding store — the memory shape
    * that makes a 100 TB vector corpus searchable (4 bytes → 1 byte per
    * component; IVF/LSH candidates re-rank against these codes, full floats
    * page in only for the final top-k). Per-dim min/max comes from ONE
    * posexplode aggregation over a 64-key space, broadcast back onto the
    * exploded components; code = floor((x − mn)/step + 0.5) — nearest-int
    * spelled with floor, NOT round(); see the inline comment — with
    * step = (mx − mn)/255, so reconstruction error ≤ step/2 per component
    * (QuantizeSpec bound).
    * Returns the exploded per-component frame (dim, x, code, recon, err +
    * the dim stats) for downstream re-assembly or error audits.
    */
  def quantizeEmbeddings(emb: DataFrame): DataFrame = {
    val ex = emb
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"),
        col("pos").cast(IntegerType).as("dim"),
        col("col").cast(DoubleType).as("x"))
    val stats = ex.groupBy("dim")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .withColumn("step", (col("mx") - col("mn")) / 255.0)
    ex.join(broadcast(stats), "dim")
      // floor(t + 0.5), NOT round(t): Spark's round on DOUBLE goes through
      // the value's shortest DECIMAL representation (BigDecimal.valueOf)
      // while DuckDB rounds the exact binary expansion — divergent exactly
      // on the code boundaries. floor is a pure IEEE operation in both
      // engines, and t is built from the identical IEEE op sequence
      // (sub, div, add of the same doubles), so the codes are engine-exact
      // — which is what upgraded this query from "no oracle by design" to
      // hash-matched. Nearest-int semantics are unchanged for t >= 0.
      .withColumn("code",
        when(col("step") === 0, lit(0))
          .otherwise(floor((col("x") - col("mn")) / col("step") + 0.5)
            .cast(IntegerType)))
      .withColumn("recon", col("mn") + col("code") * col("step"))
      .withColumn("err", abs(col("recon") - col("x")))
  }

  /** Per-label quantization-error audit over the int8 codes — ORACLE-
    * checked since the floor(t+0.5) code formula made the codes (hence
    * recon and err) bit-identical doubles in both engines: max(err) is
    * exact and order-independent as-is, avg goes through the Dec12
    * doctrine. QuantizeSpec keeps the step/2 error contract and the
    * 0..255 code range as belt-and-braces.
    */
  val qEmbedQuantize = Q(
    "q_embed_quantize",
    (s, dir) =>
      quantizeEmbeddings(Tables.embeddings(s, dir))
        .groupBy("label")
        .agg(count(lit(1)).as("n_comp"),
          max(col("err")).as("max_abs_err"),
          Det.davg12(col("err")).as("avg_abs_err"))
        .orderBy("label"),
    Some(s"""WITH ex AS (SELECT vec_id, label,
                    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                    CAST(unnest(embedding) AS DOUBLE) AS x
                  FROM embeddings),
             stats AS (SELECT dim, min(x) AS mn, max(x) AS mx,
                              (max(x) - min(x)) / 255.0 AS step
                       FROM ex GROUP BY dim),
             q AS (SELECT e.label,
                          CASE WHEN s.step = 0 THEN 0
                               ELSE CAST(floor((e.x - s.mn) / s.step + 0.5)
                                         AS INTEGER) END AS code,
                          s.mn, s.step, e.x
                   FROM ex e JOIN stats s USING (dim)),
             r AS (SELECT label,
                          abs(mn + code * step - x) AS err FROM q)
             SELECT label, count(*) AS n_comp,
                    max(err) AS max_abs_err,
                    ${Det.sqlAvg12("err")} AS avg_abs_err
             FROM r GROUP BY label ORDER BY label"""))

  /** Cosine top-5 over the RECONSTRUCTED int8 vectors — proof the
    * quantized store actually searches: at 100 TB the scan runs against
    * the 1-byte codes (4× less memory traffic) and only the final top-k
    * pages in full floats. Vectors re-assemble from the exploded codes by
    * dim-sorted collect (struct sort = dim order, 64 elements per row);
    * scoring is the same broadcast-probe codegen vec_dot shape as
    * q_sim_cosine_topk. ORACLE-checked since the floor(t+0.5) code formula
    * (see quantizeEmbeddings) made recon bit-identical across engines: the
    * oracle rebuilds the same recon vectors in DuckDB (list ordered by
    * dim) and scores them with list_cosine_similarity — the same
    * left-to-right IEEE fold as vec_dot, the contract q_sim_cosine_topk
    * already proves. QuantizeSpec keeps the recall bound as belt-and-
    * braces.
    */
  val qSimCosineQuantized = Q(
    "q_sim_cosine_quantized",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val recon = quantizeEmbeddings(Tables.embeddings(s, dir))
        .groupBy("vec_id", "label")
        .agg(expr("transform(array_sort(collect_list(struct(dim, recon)))," +
          " p -> p.recon)").as("rvec"))
      val withNorm = recon.withColumn("ns", expr("vec_dot(rvec, rvec)"))
      val probes = withNorm.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("rvec").as("pvec"),
          col("ns").as("pns"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("qscore").desc, col("vec_id"))
      withNorm.join(broadcast(probes), col("probe_id") =!= col("vec_id"))
        .withColumn("qscore", round(
          expr("vec_dot(pvec, rvec)") /
            (sqrt(col("pns")) * sqrt(col("ns"))), 6))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5)
        .select("probe_id", "vec_id", "qscore", "rk")
        .orderBy("probe_id", "rk")
    },
    Some("""WITH ex AS (SELECT vec_id, label,
                   CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS x
                 FROM embeddings),
            stats AS (SELECT dim, min(x) AS mn, max(x) AS mx,
                             (max(x) - min(x)) / 255.0 AS step
                      FROM ex GROUP BY dim),
            r AS (SELECT e.vec_id,
                         e.dim,
                         s.mn + (CASE WHEN s.step = 0 THEN 0
                                 ELSE CAST(floor((e.x - s.mn) / s.step + 0.5)
                                      AS INTEGER) END) * s.step AS recon
                  FROM ex e JOIN stats s USING (dim)),
            v AS (SELECT vec_id, list(recon ORDER BY dim) AS rvec
                  FROM r GROUP BY vec_id),
            p AS (SELECT vec_id AS probe_id, rvec AS pvec
                  FROM v WHERE vec_id < 10)
            SELECT probe_id, vec_id, qscore, rk
            FROM (SELECT p.probe_id, e.vec_id,
                         round(list_cosine_similarity(p.pvec, e.rvec), 6)
                           AS qscore,
                         CAST(row_number() OVER (PARTITION BY p.probe_id
                           ORDER BY round(list_cosine_similarity(
                             p.pvec, e.rvec), 6) DESC, e.vec_id)
                           AS INTEGER) AS rk
                  FROM p JOIN v e ON e.vec_id <> p.probe_id)
            WHERE rk <= 5 ORDER BY probe_id, rk"""))

  /** Brute-force cosine top-5 for 10 probe vectors — the ANN correctness
    * baseline. The dot product is the native codegen FloatVecDot expression
    * (graft.plans) — same sequential fold as a HOF but inside
    * WholeStageCodegen (~20× faster measured at sf0.1). Squared norms are
    * computed once per vector BEFORE the pair join, not once per pair.
    * round(6) absorbs last-ulp differences vs DuckDB.
    */
  val qSimCosineTopk = Q(
    "q_sim_cosine_topk",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
        .withColumn("ns", expr("vec_dot(embedding, embedding)"))
      val probes = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
          col("ns").as("pns"))
      // widenStream: the k-probe scoring loop is compute-dense per
      // streamed row (k codegen dots) — the PlanLintSpec dense-BNLJ rule
      val scored = widenStream(emb).join(broadcast(probes),
          col("probe_id") =!= col("vec_id"))
        .withColumn("score", round(
          expr("vec_dot(pvec, embedding)") /
            (sqrt(col("pns")) * sqrt(col("ns"))), 6))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("vec_id"))
      scored
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= 5)
        .select("probe_id", "vec_id", "score", "rk")
        .orderBy("probe_id", "rk")
    },
    Some("""SELECT probe_id, vec_id, score, rk
            FROM (SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
                         round(list_cosine_similarity(
                           CAST(p.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])), 6) AS score,
                         CAST(row_number() OVER (PARTITION BY p.vec_id
                           ORDER BY round(list_cosine_similarity(
                             CAST(p.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])), 6) DESC,
                           e.vec_id) AS INTEGER) AS rk
                  FROM embeddings p JOIN embeddings e
                    ON p.vec_id < 10 AND e.vec_id <> p.vec_id)
            WHERE rk <= 5 ORDER BY probe_id, rk"""))

  /** Round-robin-widen a compute-dense BNLJ streamed side to at least
    * core parallelism — the r19 near-dup rule, now PlanLintSpec-pinned:
    * a BroadcastNestedLoopJoin streams its non-build side at the INPUT's
    * split count (3 parquet splits at sf0.1 — the O(N·M) vec_dot scoring
    * loop ran near-serial on a 32-thread box), so compute-dense stage
    * parallelism must be sized to CORES, not input bytes. Widens to
    * max(cores, current splits): never coalesces a corpus whose split
    * count already exceeds cores (at 100 TB the scan's own parallelism
    * is the right answer), while keeping the exchange STATICALLY in the
    * plan so the lint can certify the invariant without running the job.
    */
  private[graft] def widenStream(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    // r21 (ADVICE r20): repartition(n) to the same n is NOT a no-op —
    // when the scan's split count already covers the cores (the 100 TB
    // regime) the old max() spelling paid a pure full round-robin
    // exchange of the streamed corpus. Widen ONLY when genuinely
    // under-parallel; at sf0.1 (3 splits < 32 cores) plans still widen,
    // so the PlanLintSpec dense-BNLJ invariant stays satisfiable.
    if (parts >= cores) df else df.repartition(cores)
  }

  /** Exact cosine near-dup pairs over any embeddings frame (brute force,
    * codegen dot). Parameterized so scale experiments can probe other
    * thresholds than the t2 query's 0.4.
    */
  def cosineNearDupPairs(embIn: DataFrame, threshold: Double): DataFrame = {
    graft.plans.VectorFunctions.register(embIn.sparkSession)
    val emb = embIn.withColumn("ns", expr("vec_dot(embedding, embedding)"))
    // The pure theta join (a < b) plans as BroadcastNestedLoopJoin: the
    // build side broadcasts, the STREAMED side's parallelism is its
    // input-split count — 3 parquet splits at sf0.1, so the O(N²)
    // scoring loop ran near-serial on a 32-thread box (3.1 s on 3
    // tasks, r19 telemetry). One ~3 MB round-robin exchange of the
    // streamed side spreads the quadratic compute across every core —
    // the same rule a 1000-executor cluster needs (stream-side
    // partitions ≥ cluster cores). Measured: 3.13 → 0.77 s at sf0.1,
    // identical rows (parity green), and the embed pair-table BUILD
    // every downstream consumer pays (clusters/lcc/triangles) rides
    // the same scoring join, so it parallelizes with it. Deliberately
    // NO broadcast hint on b: BNLJ's build side stays the PLANNER's
    // stats-based call (PlanLintSpec bans force-broadcasting a
    // corpus-scale side — the r11 OOM class; on a cluster where
    // embeddings outgrow the broadcast threshold the right plan is
    // blocked/LSH candidate generation, which is exactly what the
    // q_sim_cosine_ann_* rows implement — THIS query is the documented
    // brute-force truth path). The repartition sits on the PROBE side,
    // which the planner streams: b, unrepartitioned and fully
    // cacheable, is the cheaper build.
    val a = widenStream(emb.select(col("vec_id").as("a"),
      col("embedding").as("va"), col("ns").as("nsa")))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"),
      col("ns").as("nsb"))
    a.join(b, col("a") < col("b"))
      .withColumn("score", round(
        expr("vec_dot(va, vb)") /
          (sqrt(col("nsa")) * sqrt(col("nsb"))), 6))
      .where(col("score") >= threshold)
      .select("a", "b", "score")
      .orderBy("a", "b")
  }

  /** Embedding-cosine near-dup pairs (threshold 0.4, exact). */
  val qSimCosineNearDup = Q(
    "q_sim_cosine_near_dup",
    (s, dir) => cosineNearDupPairs(Tables.embeddings(s, dir), 0.4),
    Some("""SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(
                     CAST(x.embedding AS DOUBLE[]),
                     CAST(y.embedding AS DOUBLE[])), 6) AS score
            FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(
                    CAST(x.embedding AS DOUBLE[]),
                    CAST(y.embedding AS DOUBLE[])), 6) >= 0.4
            ORDER BY a, b"""))

  /** Band shape for the t2 ANN query (threshold 0.4). Tuned, not guessed:
    * a pair at cosine s collides with one hyperplane with p = 1 - acos(s)/π,
    * so the t2 pairs (measured scores 0.40–0.51 on the fixed corpus) have
    * p ≈ 0.63–0.67 while random pairs sit at p ≈ 0.5 — a WEAK-signal regime.
    * Recall over b bands of r planes is 1-(1-p^r)^b: at p=0.64, 20×5 gives
    * ≈0.89 (measured 0.86–0.92 across sf), while the naive "16 planes per
    * band" dedup shape would collapse it to 1-(1-0.64^16)^20 ≈ 0.02. Bucket
    * width is the scale knob: 5-bit keys cut expected bucket size 4× and
    * candidate volume ~2× vs the round-2 3-bit shape. At corpus scale, hold
    * expected occupancy N/2^r constant by growing r ~ log2(N) and
    * re-balancing b for the target recall — both are parameters of
    * cosineAnnLshPairs; the t2 constants pin the oracle's plane literals.
    */
  private val LshBands = 20  // hash tables
  private val LshRows = 5    // hyperplanes per table

  /** Hyperplane component (plane p, dim d) ∈ [-0.5, 0.5): deterministic
    * pseudo-random family from chained XXH64 (seed 42). Planes are
    * DATA-INDEPENDENT, so they're computed once driver-side and shipped as
    * array literals — the per-row work is then a codegen vec_dot against a
    * literal array, not an interpreted nested lambda.
    */
  private def lshPlane(p: Int, dims: Int): Seq[Double] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    (0 until dims).map { d =>
      val h = XXH64.hashLong(d.toLong, XXH64.hashLong(p.toLong, 42L))
      val m = ((h % 1000003) + 1000003) % 1000003
      m.toDouble / 1000003.0 - 0.5
    }
  }

  /** Banded hyperplane-LSH near-dup pairs (the ANN scale path),
    * parameterized over threshold and band shape (see the LshBands note for
    * the tuning math). Deterministic pseudo-random hyperplanes from
    * xxhash64(plane, dim); a pair is a candidate if it agrees on all
    * projection signs of ANY band; exact cosine only on candidates.
    *
    * Shape at scale:
    *  - candidate generation runs on NARROW (id, band, key, keys) rows —
    *    embeddings never enter the band shuffle;
    *  - oversized buckets are dropped (expandBucketPairs cap), so a
    *    degenerate band key cannot expand quadratically;
    *  - each surviving pair is emitted from its FIRST colliding band only
    *    (firstCollisionOnly), so candidates are unique by construction and
    *    the corpus-wide distinct() shuffle of the round-2 formulation is
    *    gone — at sf0.1 the candidate multiset was ~8× its distinct size;
    *  - the vector re-attach carries NO broadcast hint: Catalyst/AQE picks
    *    BHJ while the per-id vector table fits the broadcast threshold and
    *    falls back to shuffle joins at corpus scale, where broadcasting the
    *    full embedding table is exactly what cannot happen.
    */
  def cosineAnnLshPairs(embIn: DataFrame, threshold: Double,
                        bands: Int = LshBands,
                        rows: Int = LshRows): DataFrame = {
    graft.plans.VectorFunctions.register(embIn.sparkSession)
    val dims = 64
    val emb = embIn.withColumn("ns", expr("vec_dot(embedding, embedding)"))
    // band keys = bit-folds of the plane-projection signs, all computed by
    // ONE native expression (HyperplaneBandKeys) whose generated code loops
    // over a plane matrix shipped as a codegen reference — NOT an
    // expr()-string of bands×rows CASE WHENs, whose ~6 400-leaf tree cost
    // ~3.5 s of analysis+janino per query at 20×5. Sign parity with the
    // oracle holds because the expression folds each dot left-to-right over
    // the same literals as DuckDB's list_dot_product: the IEEE sums are
    // bit-identical, so the >0 tests agree even within an ulp of zero.
    // Reordered summation (SIMD trees) would break that — doc'd on
    // HyperplaneBandKeys as a contract.
    val keysFn = graft.plans.VectorFunctions.registerLshKeys(
      embIn.sparkSession,
      (0 until bands * rows).map(p => lshPlane(p, dims)), rows)
    val sig = emb
      .withColumn("keys", expr(s"$keysFn(embedding)"))
      .select(col("vec_id"), col("keys"), posexplode(col("keys")))
      .select(col("vec_id"), col("keys"), col("pos").as("band"),
        col("col").as("band_key"))
    // each bucket element carries its full band-key array (b small ints) so
    // the first-collision filter needs no extra join back to the signatures
    val buckets = sig.groupBy("band", "band_key")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("keys"))))
        .as("ids"))
    val cand = firstCollisionOnly(
      expandBucketPairs(buckets, "ids",
        "struct(x.vec_id AS a, y.vec_id AS b, x.keys AS ka, y.keys AS kb)",
        Seq("band"))
        .select(col("band"), col("p.a").as("a"), col("p.b").as("b"),
          col("p.ka").as("ka"), col("p.kb").as("kb")))
      .select("a", "b")
    val vecs = emb.select(col("vec_id"), col("embedding"), col("ns"))
    cand
      .join(vecs.toDF("a", "va", "nsa"), "a")
      .join(vecs.toDF("b", "vb", "nsb"), "b")
      .withColumn("score", round(
        expr("vec_dot(va, vb)") /
          (sqrt(col("nsa")) * sqrt(col("nsb"))), 6))
      .where(col("score") >= threshold)
      .select("a", "b", "score")
      .orderBy("a", "b")
  }

  /** The hyperplanes are data-independent literals, so the oracle embeds
    * the IDENTICAL plane constants as DuckDB list literals: both engines
    * compute the same left-to-right double dot product (FloatVecDot ≡
    * list_dot_product), hence the same sign bits, hence the same candidate
    * set — making this approximate operator fully oracle-checkable. The
    * oracle also mirrors the two structural guards exactly: a pair counts
    * only at its FIRST colliding band (rn = 1 ≡ firstCollisionOnly) and
    * only if that band's bucket is within the cap (bsz ≡ expandBucketPairs).
    */
  val qSimCosineAnnLsh = Q(
    "q_sim_cosine_ann_lsh",
    (s, dir) => cosineAnnLshPairs(Tables.embeddings(s, dir), 0.4),
    Some {
      val keyExprs = (0 until LshBands).map { b =>
        (0 until LshRows).map { r =>
          val pl = lshPlane(b * LshRows + r, 64)
          s"(CASE WHEN list_dot_product(v, [${pl.mkString(",")}]) > 0 " +
            s"THEN ${1 << (LshRows - 1 - r)} ELSE 0 END)"
        }.mkString("(", " + ", ")")
      }.mkString("[", ", ", "]")
      val bandIdx = (0 until LshBands).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
               sig AS (SELECT vec_id, unnest($bandIdx) AS band,
                              unnest($keyExprs) AS band_key
                       FROM e),
               bsz AS (SELECT band, band_key, count(*) AS m
                       FROM sig GROUP BY band, band_key),
               coll AS (SELECT x.vec_id AS a, y.vec_id AS b,
                               x.band AS band, x.band_key AS band_key,
                               row_number() OVER (
                                 PARTITION BY x.vec_id, y.vec_id
                                 ORDER BY x.band) AS rn
                        FROM sig x JOIN sig y
                          ON x.band = y.band AND x.band_key = y.band_key
                         AND x.vec_id < y.vec_id),
               cand AS (SELECT c.a, c.b
                        FROM coll c JOIN bsz s
                          ON s.band = c.band AND s.band_key = c.band_key
                        WHERE c.rn = 1 AND s.m <= $MaxBucket)
          SELECT c.a, c.b,
                 round(list_cosine_similarity(x.v, y.v), 6) AS score
          FROM cand c JOIN e x ON x.vec_id = c.a
                      JOIN e y ON y.vec_id = c.b
          WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.4
          ORDER BY a, b"""
    })

  /** IVF index build — materialized ONCE per (session, input dir) through
    * the Incremental seam (same md5-keyed pattern as pairTable and
    * Layout.zorderedLineitem): at 100 TB the coarse-quantizer fit + cell
    * assignment is a WRITE-PATH job, not a query-time cost, and through r7
    * every q_sim_cosine_ivf invocation refit KMeans from scratch (~1.5-3.5 s
    * of its bench time). Two outputs, built atomically-enough under one
    * staleness check (either stale → both rebuilt from one model fit):
    *  - the assignment table, PARTITIONED BY cell — the physical IVF shape:
    *    a probe of nprobe cells is a partition-pruned read of nprobe/k of
    *    the corpus, not a filter over all of it;
    *  - the k-row centroid table (float arrays for codegen vec_dot).
    * KMeans fit caches only the slim vector column and releases it as soon
    * as the model exists.
    */
  private def ivfIndex(s: SparkSession, dir: String,
                       k: Int = 16): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    graft.plans.VectorFunctions.register(s)
    val cellsOut =
      graft.sources.SourcesSinks.dirKeyedTempPath(s, dir, "ivf_cells")
    val centOut =
      graft.sources.SourcesSinks.dirKeyedTempPath(s, dir, "ivf_centroids")
    val inputs = Seq(s"$dir/embeddings.parquet")
    graft.sources.Incremental.withBuildLock(cellsOut) {
    if (!graft.sources.Incremental.isFresh(s, inputs, cellsOut) ||
        !graft.sources.Incremental.isFresh(s, inputs, centOut)) {
      val emb = Tables.embeddings(s, dir)
        .withColumn("features",
          array_to_vector(col("embedding").cast("array<double>")))
        .withColumn("ns", expr("vec_dot(embedding, embedding)"))
      val fitInput = emb.select("features").cache()
      if (fitInput.isEmpty) {
        // empty corpus: KMeans.fit would throw — materialize empty index
        // stores with the right schemas instead (the empty-day-partition
        // robustness class); probes over them return zero rows cleanly
        fitInput.unpersist(blocking = false)
        // unpartitioned: a partitionBy write of zero rows leaves no
        // parquet footer to read schema from
        emb.select(col("vec_id"), col("embedding"), col("ns"),
            lit(0).as("cell")).limit(0)
          .write.mode("overwrite").parquet(cellsOut)
        s.createDataFrame(Seq.empty[(Int, Array[Float])])
          .toDF("cell_c", "cvec")
          .write.mode("overwrite").parquet(centOut)
      } else {
        val model =
          try new KMeans().setK(k).setSeed(42L).setMaxIter(5).fit(fitInput)
          finally fitInput.unpersist(blocking = false)
        model.transform(emb)
          .select(col("vec_id"), col("embedding"), col("ns"),
            col("prediction").as("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(cellsOut)
        s.createDataFrame(
          model.clusterCenters.zipWithIndex.map { case (c, i) =>
            (i, c.toArray.map(_.toFloat))
          }.toIndexedSeq).toDF("cell_c", "cvec")
          .write.mode("overwrite").parquet(centOut)
      }
    }
    }
    (s.read.parquet(cellsOut), s.read.parquet(centOut))
  }

  /** Graph-based ANN — the HNSW-family search shape (the third index
    * family next to LSH and IVF; a graph walk reads O(beam·k·hops)
    * vectors per probe regardless of corpus size, the low-latency /
    * high-recall lever IVF's nprobe can't reach): a k-NN GRAPH over the
    * node set (k=8 exact cosine neighbors per node — the bounded-subset
    * truth regime; at 100 TB the build path is LSH/NN-descent CANDIDATE
    * generation feeding the same per-node top-k, and the graph is a
    * bucketed (node, nbr) table) + BEAM SEARCH per probe: seed the beam
    * with 8 FIXED entry nodes spread over the id space (multi-seed is
    * the DiskANN-medoid analog — this synthetic corpus is near-random,
    * the known WORST case for graph navigability, and a single entry
    * point strands the walk in a local basin at 10% recall), then 5
    * hops of expand-neighbors → score exact cosine → keep the beam-12
    * best, emit the final top-3 (measured recall@3 vs brute force: 0.90
    * — pinned in R12Spec). Every selection ranks by round(score, 6)
    * with a vec_id tie-break (the q_sim_cosine_topk determinism
    * doctrine), so the whole walk — unlike HNSW's
    * insertion-order-dependent layers — is a pure function of the data
    * and is oracle-checked hop by hop via the unrolled recursive form.
    * Scale posture: graph + vectors for the walked frontier are the only
    * reads; per-hop joins are broadcast at this scale and become
    * bucketed co-located joins on `node` at corpus scale; the beam bound
    * caps every intermediate at O(probes·beam·k) rows.
    */
  val qSimGraphBeam = Q(
    "q_sim_graph_beam",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      val (kNbr, beamW, hops) = (16, 12, 5)
      val emb = Tables.embeddings(s, dir)
        .withColumn("ns", expr("vec_dot(embedding, embedding)"))
      val nodes = emb.where(col("vec_id") < 400)
        .select(col("vec_id"), col("embedding"), col("ns"))
      // the kNN graph is a WRITE-PATH artifact, not a query-time cost —
      // materialized once per (session, dir) through the Incremental
      // seam like the IVF index and the pagerank adjacency store; warm
      // searches pay walk cost only (the HNSW build/search split)
      val (graph, _) = graft.sources.Incremental.materialize(s,
        Seq(s"$dir/embeddings.parquet"),
        graft.sources.SourcesSinks.dirKeyedTempPath(s, dir, "knn_graph")) {
        nodes.toDF("a", "va", "nsa")
          .join(broadcast(nodes.toDF("b", "vb", "nsb")),
            col("a") =!= col("b"))
          .withColumn("score", round(
            expr("vec_dot(va, vb)") /
              (sqrt(col("nsa")) * sqrt(col("nsb"))), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy("a").orderBy(col("score").desc, col("b"))))
          .where(col("rn") <= kNbr)
          .select(col("a").as("node"), col("b").as("nbr"))
      }
      val probes = emb
        .where(col("vec_id") >= 400 && col("vec_id") < 410)
        .select(col("vec_id").as("probe"), col("embedding").as("pv"),
          col("ns").as("pns"))
      val nvecs = nodes.select(col("vec_id").as("node"),
        col("embedding").as("nv"), col("ns").as("nns"))
      def score(cand: DataFrame): DataFrame = cand
        .join(broadcast(nvecs), "node")
        .join(broadcast(probes), "probe")
        .withColumn("score", round(
          expr("vec_dot(pv, nv)") / (sqrt(col("pns")) * sqrt(col("nns"))),
          6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("probe")
            .orderBy(col("score").desc, col("node"))))
      val seeds = nodes.where(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("node"))
      // per-hop localCheckpoint (Graph doctrine): without it hop h's plan
      // NESTS all h-1 prior join/window trees — a 5-deep lineage pyramid
      // that re-executes the whole walk at the final action (measured
      // 6.2 s → the checkpointed form cuts each hop to one small job)
      var beam = probes.select("probe").crossJoin(broadcast(seeds))
        .localCheckpoint(true)
      for (_ <- 1 to hops) {
        val cand = beam.select("probe", "node")
          .union(beam.join(broadcast(graph), "node")
            .select(col("probe"), col("nbr").as("node")))
          .distinct()
        val prev = beam
        beam = score(cand).where(col("rn") <= beamW)
          .select("probe", "node").localCheckpoint(true)
        Graph.release(prev)
      }
      score(beam.select("probe", "node")).where(col("rn") <= 3)
        .select(col("probe"), col("node"), col("score"),
          col("rn").cast(org.apache.spark.sql.types.LongType).as("rank"))
        .orderBy("probe", "rank")
    },
    Some {
      val hopCtes = (1 to 5).map { h =>
        val prev = s"b${h - 1}"
        s"""c$h AS (SELECT probe, node FROM $prev
                 UNION
                 SELECT p.probe, k.nbr AS node
                 FROM $prev p JOIN knn k ON k.node = p.node),
           s$h AS (SELECT c.probe, c.node,
                     round(list_cosine_similarity(p.pv, n.v), 6) AS score,
                     row_number() OVER (PARTITION BY c.probe
                       ORDER BY round(list_cosine_similarity(p.pv, n.v), 6)
                         DESC, c.node) AS rn
                   FROM c$h c JOIN probes p ON p.probe = c.probe
                              JOIN nodes n ON n.vec_id = c.node),
           b$h AS (SELECT probe, node FROM s$h WHERE rn <= 12)"""
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings),
             nodes AS (SELECT * FROM e WHERE vec_id < 400),
             knn AS (SELECT a AS node, b AS nbr FROM (
                 SELECT x.vec_id AS a, y.vec_id AS b,
                        row_number() OVER (PARTITION BY x.vec_id
                          ORDER BY round(list_cosine_similarity(x.v, y.v), 6)
                            DESC, y.vec_id) AS rn
                 FROM nodes x JOIN nodes y ON x.vec_id <> y.vec_id)
               WHERE rn <= 16),
             probes AS (SELECT vec_id AS probe, v AS pv FROM e
                        WHERE vec_id >= 400 AND vec_id < 410),
             b0 AS (SELECT p.probe, n.vec_id AS node
                    FROM probes p JOIN nodes n ON n.vec_id % 50 = 0),
             $hopCtes
            SELECT probe, node, score, CAST(rn AS BIGINT) AS rank
            FROM s5 WHERE rn <= 3 ORDER BY probe, rank"""
    })

  /** IVF probe search proper — top-5 within the nprobe nearest cells per
    * probe, reading the materialized cell-partitioned store (ivfIndex).
    * Split out of the certified query so the recall/determinism specs
    * (DedupRecallSpec, ParitySpec) keep pinning the raw probe results.
    */
  private[graft] def ivfProbeTopk(s: SparkSession, dir: String): DataFrame = {
    graft.plans.VectorFunctions.register(s)
    val nprobe = 4
    val (assigned, centroids) = ivfIndex(s, dir)
    val probes = assigned.where(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
        col("ns").as("pns"))
    // nprobe nearest cells per probe (k is tiny → broadcast cross join)
    val wCell = Window.partitionBy(col("probe_id"))
      .orderBy(col("cdist"), col("cell_c"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        expr("vec_dot(pvec, pvec) - 2 * vec_dot(pvec, cvec) + " +
          "vec_dot(cvec, cvec)"))
      .withColumn("crk", row_number().over(wCell))
      .where(col("crk") <= nprobe)
      .select(col("probe_id"), col("pvec"), col("pns"),
        col("cell_c").as("cell"))
    // exact cosine only inside the probed cells
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id"))
    probeCells.join(assigned, "cell")
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("score", round(
        expr("vec_dot(pvec, embedding)") /
          (sqrt(col("pns")) * sqrt(col("ns"))), 6))
      .withColumn("rk", row_number().over(w).cast(IntegerType))
      .where(col("rk") <= 5)
      .select("probe_id", "vec_id", "score", "rk")
      .orderBy("probe_id", "rk")
  }

  /** IVF-style two-stage ANN (SURVEY.md §7.3): KMeans coarse quantizer →
    * probe only the nprobe nearest cells → exact cosine within cells.
    * At 100 TB the cell assignment is a narrow int column and each query
    * touches nprobe/k of the corpus instead of all of it — and the index
    * is read from the materialized cell-partitioned store (ivfIndex), so
    * the query pays probe-search cost only. Deterministic for a fixed seed
    * and partitioning (ParitySpec proves identical output across 3/7/16-way
    * parallelism). ORACLE-CERTIFIED since r20 (r19 verdict #4) the
    * q_agg_approx_distinct way: the IVF result itself is KMeans-dependent
    * (never DuckDB-rebuildable), but its accuracy CONTRACT rides the hash
    * gate — the query ALSO computes the exact brute-force top-5 leg
    * in-plan (the q_sim_cosine_topk construction, already hash-green on
    * its own), derives recall@5 across the probes, and emits the exact
    * top-1 per probe (DuckDB-computable columns) plus the certificate
    * recall_ge_60pct; the oracle computes the exact leg and the literal
    * 1. Bound 0.6 sits under the measured deterministic floor (0.64 at
    * sf0.001, 0.74 at sf0.01 — DedupRecallSpec) so cell-probe
    * regressions are driver-visible hash mismatches. The exact leg is
    * the certification truth path (the approx_distinct/hll_shards
    * trade); production keeps only the probe search.
    */
  val qSimCosineIvf = Q(
    "q_sim_cosine_ivf",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val ivf = ivfProbeTopk(s, dir)
      val emb = Tables.embeddings(s, dir)
        .withColumn("ns", expr("vec_dot(embedding, embedding)"))
      val probes = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"),
          col("ns").as("pns"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("vec_id"))
      val exact = emb.join(broadcast(probes),
          col("probe_id") =!= col("vec_id"))
        .withColumn("score", round(
          expr("vec_dot(pvec, embedding)") /
            (sqrt(col("pns")) * sqrt(col("ns"))), 6))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= 5)
        .select("probe_id", "vec_id", "score", "rk")
      // recall@5 across probes as a 1-row certificate frame
      val cert = exact.select("probe_id", "vec_id")
        .join(ivf.select("probe_id", "vec_id"),
          Seq("probe_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select((col("n_hit").cast(DoubleType) /
            col("n_exact").cast(DoubleType) >= 0.6)
          .cast("int").as("recall_ge_60pct"))
      exact.where(col("rk") === 1)
        .select(col("probe_id"), col("vec_id").as("top1_vec_id"),
          col("score").as("top1_score"))
        .crossJoin(broadcast(cert))
        .orderBy("probe_id")
    },
    Some("""SELECT probe_id, vec_id AS top1_vec_id, score AS top1_score,
                   CAST(1 AS INTEGER) AS recall_ge_60pct
            FROM (SELECT p.vec_id AS probe_id, e.vec_id,
                         round(list_cosine_similarity(
                           CAST(p.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])), 6) AS score,
                         CAST(row_number() OVER (PARTITION BY p.vec_id
                           ORDER BY round(list_cosine_similarity(
                             CAST(p.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])), 6) DESC,
                           e.vec_id) AS INTEGER) AS rk
                  FROM embeddings p JOIN embeddings e
                    ON p.vec_id < 10 AND e.vec_id <> p.vec_id)
            WHERE rk = 1 ORDER BY probe_id"""))

  // ------------------------------------------------------- text analysis

  private val Stopwords = Seq("the", "a", "of", "and", "to")

  /** Top-20 corpus terms after stopword strip (tie-break by term). */
  val qTextTokensTop = Q(
    "q_text_tokens_top",
    (s, dir) =>
      tokens(Tables.documents(s, dir))
        .select(lower(col("tok")).as("term"))
        .where(!col("term").isin(Stopwords: _*))
        .groupBy("term")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(20),
    Some(s"""SELECT term, count(*) AS n
             FROM (SELECT lower(unnest(string_split(text, ' '))) AS term
                   FROM documents)
             WHERE term <> ''
               AND term NOT IN (${Stopwords.map("'" + _ + "'").mkString(", ")})
             GROUP BY term ORDER BY n DESC, term LIMIT 20"""))

  /** Corpus profiling per language: doc count, avg chars, distinct sources. */
  val qTextLangStats = Q(
    "q_text_lang_stats",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast(DoubleType) /
            count(col("n_chars")).cast(DoubleType)).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE)
                     AS avg_chars,
                   count(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Quality scoring: token/char stats + a deterministic quality formula
    * (length, mean token length, type-token ratio).
    */
  val qTextQuality = Q(
    "q_text_quality",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          length(col("text")).cast(LongType).as("len_chars"),
          size(array_distinct(split(col("text"), " "))).cast(LongType)
            .as("n_types"))
        .withColumn("avg_tok_len",
          (col("len_chars") - col("n_tokens") + 1).cast(DoubleType) /
            col("n_tokens").cast(DoubleType))
        .withColumn("ttr",
          col("n_types").cast(DoubleType) / col("n_tokens").cast(DoubleType))
        .withColumn("quality", round(
          least(col("n_tokens").cast(DoubleType) / 100.0, lit(1.0)) *
            col("ttr"), 6))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, n_tokens, len_chars, n_types,
                   CAST(len_chars - n_tokens + 1 AS DOUBLE)
                     / CAST(n_tokens AS DOUBLE) AS avg_tok_len,
                   CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
                   round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                     * (CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)),
                     6) AS quality
            FROM (SELECT doc_id,
                         CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens,
                         CAST(length(text) AS BIGINT) AS len_chars,
                         CAST(len(list_distinct(string_split(text, ' ')))
                           AS BIGINT) AS n_types
                  FROM documents)
            ORDER BY doc_id"""))

  /** Token counting two ways: whitespace and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other-glyphs — the shape a byte-pair
    * pre-tokenizer produces). Both engines run the identical pattern.
    */
  val qTextTokenCount = Q(
    "q_text_token_count",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_ws"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast(LongType)
            .as("n_bpe"))
        .withColumn("bpe_per_ws",
          col("n_bpe").cast(DoubleType) / col("n_ws").cast(DoubleType))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
                   CAST(len(regexp_extract_all(text,
                     '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
                   CAST(len(regexp_extract_all(text,
                     '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
                     / CAST(len(string_split(text, ' ')) AS DOUBLE)
                     AS bpe_per_ws
            FROM documents ORDER BY doc_id"""))

  /** TF-IDF top term per doc. Cross-engine ln() parity is the §7.5 risk:
    * both engines are within 1 ulp of the true log, so raw scores can
    * differ in the last bit and flip a ranking on a mathematical tie. The
    * score is therefore rounded to 6 decimals BEFORE ranking — ties at that
    * precision resolve through the deterministic `tok` tie-break
    * identically in both engines (verified over the fixed corpus) → full
    * oracle. ScalaTest golden still pins the hand-computed values.
    */
  val qTextTfidfTop = Q(
    "q_text_tfidf_top",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // corpus size folds into the plan as a one-row aggregate cross-joined
      // in (a 1-row broadcast NL join), mirroring the oracle's CROSS JOIN n
      // — NOT an eager driver-side count(), which would cost one extra full
      // corpus pass per build at scale
      val nd = docs.agg(count(lit(1)).cast(DoubleType).as("nd"))
      val tf = tokens(docs).groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      tf.join(df, "tok").crossJoin(nd)
        .withColumn("score", round(
          col("tf").cast(DoubleType) * log((col("nd") + 1.0) /
            (col("df").cast(DoubleType) + 1.0)), 6))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("doc_id"), col("tok").as("top_term"),
          col("score").as("tfidf"))
        .orderBy("doc_id")
    },
    Some("""WITH tf AS (SELECT doc_id, tok, count(*) AS tf
                        FROM (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS tok
                              FROM documents)
                        WHERE tok <> '' GROUP BY doc_id, tok),
                 df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
                 n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
                 s AS (SELECT tf.doc_id, tf.tok,
                         round(CAST(tf.tf AS DOUBLE) *
                           ln((n.n + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)),
                           6) AS score
                       FROM tf JOIN df USING (tok) CROSS JOIN n)
            SELECT doc_id, tok AS top_term, score AS tfidf
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, tok) AS rk FROM s)
            WHERE rk = 1 ORDER BY doc_id"""))

  /** BM25 keyword relevance — the lexical-retrieval half of hybrid search
    * (cosine over embeddings is the other half, q_sim_cosine_topk): top-20
    * docs for a fixed 3-term query under Robertson/Sparck-Jones BM25
    * (k1=1.2, b=0.75, +1 idf so scores stay positive). Determinism: idf's
    * ln() is bit-identical cross-engine (§7.5 — unlike trig); every other
    * input (tf, df, dl, N) is an exact integer cast to DOUBLE, avgdl is ONE
    * IEEE division of exact integers, and the whole per-term score is a
    * single shared formula TEXT evaluated by both engines (identical op
    * sequence); the per-doc sum over query terms goes through the Dec12
    * order-free sum, is rounded to 6 decimals BEFORE ranking, and ties
    * resolve on doc_id. Scale: df (|terms| rows) and the corpus-stats row
    * broadcast; tf/dl are map-side-combinable per-doc aggregations; the
    * final top-20 is a TakeOrdered, never a full sort.
    */
  // k1=1.2, b=0.75 — 2.2 = k1+1 and 0.25 = 1-b appear as literals (the
  // SAME double in both engines since the text is shared verbatim)
  private val bm25Fml = "ln((nd - df + CAST(0.5 AS DOUBLE)) / " +
    "(df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * " +
    "(tf * CAST(2.2 AS DOUBLE) / (tf + CAST(1.2 AS DOUBLE) * " +
    "(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)))"

  /** Per-(doc, query-term) retrieval statistics — the shared front half of
    * q_text_bm25 and q_search_rrf: tf per matched term, df per term, doc
    * length, corpus size and average doc length, all exact integers cast
    * to DOUBLE once. df and the corpus-stats row broadcast; tf/dl are
    * map-side-combinable aggregations.
    */
  private def retrievalStats(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("join", "window", "scan")
    val tl = tokens(Tables.documents(s, dir))
    val dl = tl.groupBy("doc_id").agg(count(lit(1)).as("dl_i"))
    val st = dl.agg(count(lit(1)).cast(DoubleType).as("nd"),
      (sum(col("dl_i")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("avgdl"))
    val tf = tl.where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf_i"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df_i"))
    tf.join(broadcast(df), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("tf_i").cast(DoubleType).as("tf"),
        col("df_i").cast(DoubleType).as("df"),
        col("dl_i").cast(DoubleType).as("dl"),
        col("nd"), col("avgdl"))
  }

  /** Dec12 order-free per-doc score rollup shared by both rankers. */
  private def scoreDocs(x: DataFrame, fml: String, out: String): DataFrame =
    x.withColumn("sc", expr(fml))
      .groupBy("doc_id")
      .agg(round(sum(col("sc").cast(Det.Dec12)).cast(DoubleType), 6).as(out))

  /** Oracle-side mirror of retrievalStats: CTE chain ending in `x`. */
  private val retrievalStatsCte =
    """t AS (SELECT doc_id,
                    unnest(string_split(text, ' ')) AS tok
                  FROM documents),
             tc AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
             dli AS (SELECT doc_id, count(*) AS dl_i
                     FROM tc GROUP BY doc_id),
             st AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
                      CAST(CAST(sum(dl_i) AS BIGINT) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) AS avgdl
                    FROM dli),
             tf AS (SELECT doc_id, tok, count(*) AS tf_i FROM tc
                    WHERE tok IN ('join', 'window', 'scan')
                    GROUP BY doc_id, tok),
             df AS (SELECT tok, count(*) AS df_i FROM tf GROUP BY tok),
             x AS (SELECT tf.doc_id, CAST(tf.tf_i AS DOUBLE) AS tf,
                     CAST(df.df_i AS DOUBLE) AS df,
                     CAST(dli.dl_i AS DOUBLE) AS dl, st.nd, st.avgdl
                   FROM tf JOIN df USING (tok) JOIN dli USING (doc_id)
                   CROSS JOIN st)"""

  /** Oracle-side mirror of scoreDocs over `x` → CTE named `outCte`. */
  private def scoreDocsCte(fml: String, out: String, outCte: String) =
    s"""$outCte AS (SELECT doc_id,
                round(CAST(SUM(CAST(($fml) AS DECIMAL(38,12))) AS DOUBLE),
                      6) AS $out
              FROM x GROUP BY doc_id)"""

  val qTextBm25 = Q(
    "q_text_bm25",
    (s, dir) =>
      scoreDocs(retrievalStats(s, dir), bm25Fml, "bm25")
        .orderBy(col("bm25").desc, col("doc_id")).limit(20),
    Some(s"""WITH $retrievalStatsCte,
             ${scoreDocsCte(bm25Fml, "bm25", "bm")}
         SELECT doc_id, bm25 FROM bm
         ORDER BY bm25 DESC, doc_id LIMIT 20"""))

  // smoothed-idf TF-IDF — the second ranker q_search_rrf fuses with BM25
  private val tfidfSumFml =
    "tf * ln((nd + CAST(1.0 AS DOUBLE)) / (df + CAST(1.0 AS DOUBLE)))"

  // RRF with the standard k=60; a doc missing from one system's top-50
  // contributes 0 for that system. Two-term fixed-order sum — no
  // aggregation, so no ordering hazard.
  private val rrfFml =
    "CASE WHEN ra IS NULL THEN CAST(0.0 AS DOUBLE) ELSE " +
      "CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(ra AS DOUBLE)) " +
      "END + CASE WHEN rb IS NULL THEN CAST(0.0 AS DOUBLE) ELSE " +
      "CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(rb AS DOUBLE)) END"

  // 6-decimal quantization of the raw RRF sum via floor(x*1e6 + 0.5)/1e6 —
  // pure IEEE double ops, bit-identical cross-engine by construction
  // (§7.2: engine round() diverges at decimal-boundary ties because Spark
  // rounds the shortest-decimal repr while DuckDB rounds the exact binary
  // expansion; floor-based nearest is tie-hazard-free for x ≥ 0). Shared
  // formula TEXT so both engines execute the identical op sequence.
  private val rrfRoundedFml =
    s"floor(($rrfFml) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))" +
      " / CAST(1000000.0 AS DOUBLE)"

  /** Reciprocal rank fusion — the hybrid-search MERGE step (fuse lexical
    * and semantic rankings without score calibration; here BM25 and
    * smoothed-idf TF-IDF over the same 3-term query stand in as the two
    * systems). Each system contributes its top-50 (6-decimal-rounded
    * score, doc_id tie-break — fully deterministic ranks), fused by
    * 1/(60+rank) summed where present (full outer join). Determinism:
    * ranks are exact small integers, the RRF sum is a fixed two-term
    * formula text — no float aggregation at all. Scale: each system's
    * top-50 is a TakeOrdered (never a global sort); ranking WITHIN 50
    * rows is a one-task window; the fusion join is 50×50 rows — driver-
    * negligible regardless of corpus size.
    */
  val qSearchRrf = Q(
    "q_search_rrf",
    (s, dir) => {
      val x = retrievalStats(s, dir)
      def top50(scored: DataFrame, sc: String, rk: String): DataFrame = {
        val w = Window.orderBy(col(sc).desc, col("doc_id"))
        scored.orderBy(col(sc).desc, col("doc_id")).limit(50)
          .withColumn(rk, row_number().over(w).cast(LongType))
      }
      val ta = top50(scoreDocs(x, bm25Fml, "bm25"), "bm25", "ra")
        .select("doc_id", "ra")
      val tb = top50(scoreDocs(x, tfidfSumFml, "tfidf"), "tfidf", "rb")
        .select("doc_id", "rb")
      ta.join(tb, Seq("doc_id"), "full_outer")
        .withColumn("rrf", expr(rrfRoundedFml))
        .select(col("doc_id"), col("ra"), col("rb"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    },
    Some(s"""WITH $retrievalStatsCte,
             ${scoreDocsCte(bm25Fml, "bm25", "bm")},
             ${scoreDocsCte(tfidfSumFml, "tfidf", "tfi")},
             ta AS (SELECT doc_id, CAST(row_number() OVER
                      (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS ra
                    FROM (SELECT * FROM bm
                          ORDER BY bm25 DESC, doc_id LIMIT 50)),
             tb AS (SELECT doc_id, CAST(row_number() OVER
                      (ORDER BY tfidf DESC, doc_id) AS BIGINT) AS rb
                    FROM (SELECT * FROM tfi
                          ORDER BY tfidf DESC, doc_id LIMIT 50))
         SELECT doc_id, ra, rb, $rrfRoundedFml AS rrf
         FROM ta FULL OUTER JOIN tb USING (doc_id)
         ORDER BY rrf DESC, doc_id LIMIT 20"""))

  /** Exact-substring duplication coverage (the ExactSubstr-dedup shape:
    * Lee et al.'s "Deduplicating Training Data Makes Language Models
    * Better" measures how much of each doc is verbatim-repeated
    * elsewhere; the suffix-array there is stood in for by shingle
    * grouping here): a 3-gram occurring in ≥ 2 DISTINCT docs marks its
    * token span [pos, pos+2] duplicated; per-doc coverage is the UNION
    * of those overlapping spans — the q_win_interval_merge running-max
    * island, all-integer so bit-exact — and the output is the
    * duplicated-token fraction (one IEEE division). Docs shorter than 3
    * tokens or with no shared shingle report 0 via the left join.
    * Scale: the shingle groupBy is the operator's honest cost (the
    * suffix-array equivalent); at 100 TB you'd group the 60-bit
    * Det.pHash60 of the shingle for fixed-width keys, the span-merge
    * window shuffles once on doc_id, and everything downstream reuses
    * that partitioning.
    */
  val qDedupSubstrSpans = Q(
    "q_dedup_substr_spans",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = shinglesWithPos(docs)
      val dup = sh.groupBy("shingle")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2).select("shingle")
      val wPrev = Window.partitionBy("doc_id").orderBy("sdn")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("doc_id").orderBy("sdn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cov = sh.join(dup, "shingle")
        .select(col("doc_id"), col("pos").as("sdn"),
          (col("pos") + 2).as("edn"))
        .withColumn("pmax", max(col("edn")).over(wPrev))
        .withColumn("brk",
          when(col("pmax").isNull || col("sdn") > col("pmax"), 1)
            .otherwise(0))
        .withColumn("sid", sum(col("brk")).over(wRun))
        .groupBy("doc_id", "sid")
        .agg(min(col("sdn")).as("ist"), max(col("edn")).as("ien"))
        .groupBy("doc_id")
        .agg(sum(col("ien") - col("ist") + 1).as("cov_tok"))
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          coalesce(col("cov_tok"), lit(0L)).as("cov_tok"))
        .withColumn("dup_frac",
          col("cov_tok").cast(DoubleType) / col("n_tok").cast(DoubleType))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 sh AS (SELECT doc_id,
                          CAST(unnest(range(1, len(toks)-1)) AS INTEGER)
                            AS pos, toks
                        FROM d WHERE len(toks) >= 3),
                 shs AS (SELECT doc_id, pos,
                           array_to_string(
                             list_slice(toks, pos, pos+2), ' ') AS shingle
                         FROM sh),
                 dup AS (SELECT shingle FROM shs GROUP BY shingle
                         HAVING count(DISTINCT doc_id) >= 2),
                 iv AS (SELECT s.doc_id, s.pos AS sdn, s.pos + 2 AS edn
                        FROM shs s JOIN dup USING (shingle)),
                 brk AS (SELECT doc_id, sdn, edn,
                           max(edn) OVER (PARTITION BY doc_id ORDER BY sdn
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pmax
                         FROM iv),
                 isl AS (SELECT doc_id, sdn, edn,
                           SUM(CASE WHEN pmax IS NULL OR sdn > pmax
                                    THEN 1 ELSE 0 END)
                             OVER (PARTITION BY doc_id ORDER BY sdn
                               ROWS UNBOUNDED PRECEDING) AS sid
                         FROM brk),
                 runs AS (SELECT doc_id, sid, min(sdn) AS ist,
                                 max(edn) AS ien
                          FROM isl GROUP BY doc_id, sid),
                 cov AS (SELECT doc_id,
                           CAST(sum(ien - ist + 1) AS BIGINT) AS cov_tok
                         FROM runs GROUP BY doc_id)
            SELECT d2.doc_id,
                   CAST(len(string_split(d2.text, ' ')) AS BIGINT) AS n_tok,
                   COALESCE(cov.cov_tok, 0) AS cov_tok,
                   CAST(COALESCE(cov.cov_tok, 0) AS DOUBLE)
                     / CAST(len(string_split(d2.text, ' ')) AS DOUBLE)
                     AS dup_frac
            FROM documents d2 LEFT JOIN cov USING (doc_id)
            ORDER BY d2.doc_id"""))

  /** Overlapping-window document chunking — the embedding-prep / RAG
    * staple (context-window packing's read-side twin, q_corpus_pack):
    * each doc explodes into 32-token chunks at stride 24 (8-token
    * overlap so no sentence straddles a boundary unseen). Chunk count =
    * (n-1) div 24 + 1 — the final partial chunk IS emitted (dropping it
    * loses corpus tail tokens). All-integer positional arithmetic and
    * string slicing → bit-exact cross-engine; Spark's slice() and
    * DuckDB's list_slice() both clamp at the array end. Scale: pure
    * per-row generator (one projection + posexplode — no shuffle at
    * all); the fan-out is bounded by doc length / stride, and chunk
    * rows carry only the chunk text, not the source doc.
    */
  val qTextChunk = Q(
    "q_text_chunk",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), expr(
          "posexplode(transform(sequence(0, (size(toks)-1) div 24), " +
            "i -> concat_ws(' ', slice(toks, i*24+1, 32))))"))
        .select(col("doc_id"), col("pos").cast(LongType).as("chunk_id"),
          size(split(col("col"), " ")).cast(LongType).as("n_tok"),
          col("col").as("chunk"))
        .orderBy("doc_id", "chunk_id"),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
                 c AS (SELECT doc_id,
                         unnest(range((len(toks)-1)//24 + 1)) AS chunk_id,
                         toks
                       FROM d)
            SELECT doc_id, chunk_id,
                   CAST(len(list_slice(toks, chunk_id*24+1,
                                       chunk_id*24+32)) AS BIGINT) AS n_tok,
                   array_to_string(list_slice(toks, chunk_id*24+1,
                                              chunk_id*24+32), ' ') AS chunk
            FROM c ORDER BY doc_id, chunk_id"""))

  /** Document fingerprinting: min-hash sketch of the shingle set (8 smallest
    * shingle hashes per doc), emitted as a comma-joined string. Hashing is
    * the portable md5-60bit (Det.pHash60) so the identical sketch is
    * computable in DuckDB — full oracle.
    */
  /** PII masking: replace email-shaped tokens then long digit runs, in
    * that order (an email eaten by the number rule first would leak its
    * domain). The corpus has no organic PII, so a maskable contact string
    * is synthesized from doc fields IDENTICALLY in both engines — the
    * masking machinery (pattern semantics, replace-ALL behavior: Spark
    * default vs DuckDB 'g' flag) is what the hash match certifies. Pure
    * per-row projection — no shuffle, fully codegen.
    */
  val qTextPiiMask = Q(
    "q_text_pii_mask",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("contact user"), col("doc_id"), lit("@"),
            col("source"), lit(".org or call "),
            col("doc_id") * 7919).as("contact"))
        .withColumn("masked",
          regexp_replace(regexp_replace(col("contact"),
            "[a-z0-9]+@[a-z][a-z0-9.]+", "<EMAIL>"),
            "[0-9]{3,}", "<NUM>"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, contact,
                   regexp_replace(regexp_replace(contact,
                     '[a-z0-9]+@[a-z][a-z0-9.]+', '<EMAIL>', 'g'),
                     '[0-9]{3,}', '<NUM>', 'g') AS masked
            FROM (SELECT doc_id,
                         'contact user' || doc_id || '@' || source ||
                         '.org or call ' || (doc_id * 7919) AS contact
                  FROM documents)
            ORDER BY doc_id"""))

  /** Deterministic train/val/test split — reproducible sampling is a core
    * training-data-engine contract (the split must be a pure function of
    * the doc id: stable across runs, engines, partitioning, and corpus
    * growth — appending docs never reshuffles existing assignments, unlike
    * rand() or TABLESAMPLE). The portable md5-based hash (Det.pHash60 mod
    * 100) makes the IDENTICAL assignment computable in DuckDB → full
    * oracle. 80/10/10 by hash bucket; output = per-(source, split) counts
    * + min/max doc ids as an assignment fingerprint.
    */
  val qCorpusSplit = Q(
    "q_corpus_split",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bucket", pmod(Det.pHash60(col("doc_id")), lit(100)))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("source", "split"),
    Some(s"""SELECT source, split, count(*) AS n,
                    min(doc_id) AS min_doc, max(doc_id) AS max_doc
             FROM (SELECT source, doc_id,
                     CASE WHEN b < 80 THEN 'train'
                          WHEN b < 90 THEN 'val'
                          ELSE 'test' END AS split
                   FROM (SELECT source, doc_id,
                           ((${Det.sqlPHash60("doc_id")}) % 100 + 100) % 100
                             AS b
                         FROM documents))
             GROUP BY source, split ORDER BY source, split"""))

  /** Held-out PERPLEXITY scoring under an add-one-smoothed bigram LM —
    * the model-based quality filter (CCNet/Wikipedia-LM style) next to
    * q_text_ngram_lm's raw conditional probabilities: the corpus hash-
    * splits 80/20 (q_corpus_split's portable-hash determinism — NO
    * rand()), a bigram LM with add-1 smoothing trains on the train
    * split, and each held-out doc reports its cross-entropy
    * H = −mean ln p(w2|w1), p = (c2+1)/(c1+V) — low H ≈ fluent/typical,
    * high H ≈ junk or off-distribution, the ranking signal curation
    * actually thresholds. Unseen history ⇒ c1 = 0 ⇒ the uniform prior
    * 1/V, exactly what add-1 defines (left joins + coalesce, no special
    * case). Determinism: each ln input is a ratio of exact integers, the
    * term sum rides Dec12 quantization and the final mean is one shared
    * division, rounded at 9 like q_text_ngram_lm; exp(H) (true
    * perplexity) is left to consumers — exp's last-ulp behavior across
    * engines is the one step the doctrine can't pin. Scale: bigram/
    * unigram tables are vocab-bounded aggregates; scoring is two hash
    * joins keyed on tokens — broadcast when the vocab fits, shuffle-hash
    * when it doesn't; never a per-doc loop.
    */
  val qTextPerplexity = Q(
    "q_text_perplexity",
    (s, dir) => {
      val bg = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1, " +
            "element_at(toks, i + 1) AS w2))")).as("x"))
        .select(col("doc_id"), col("x.w1").as("w1"), col("x.w2").as("w2"))
        .withColumn("tr",
          pmod(Det.pHash60(col("doc_id")), lit(100)) < 80)
      val c2 = bg.where(col("tr")).groupBy("w1", "w2")
        .agg(count(lit(1)).as("c2"))
      val c1 = bg.where(col("tr")).groupBy("w1")
        .agg(count(lit(1)).as("c1"))
      val v = bg.where(col("tr"))
        .select(col("w1").as("w")).unionAll(
          bg.where(col("tr")).select(col("w2").as("w")))
        .agg(countDistinct(col("w")).as("vsz"))
      bg.where(!col("tr"))
        .join(c2, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          expr("CAST(ln((CAST(coalesce(c2, 0) + 1 AS DOUBLE)) / " +
            "(CAST(coalesce(c1, 0) AS DOUBLE) + CAST(vsz AS DOUBLE))) " +
            "AS DECIMAL(38,12))").as("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round((-sum(col("term")).cast("double")) /
            count(lit(1)).cast("double"), 9).as("cross_entropy"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                    ((${Det.sqlPHash60("doc_id")}) % 100 + 100) % 100 < 80
                      AS tr
                  FROM documents
                  WHERE len(string_split(text, ' ')) >= 2),
              b AS (SELECT doc_id, tr,
                      unnest([{'w1': toks[i], 'w2': toks[i + 1]}
                              FOR i IN range(1, len(toks))]) AS x
                    FROM d),
              bg AS (SELECT doc_id, tr, x.w1 AS w1, x.w2 AS w2 FROM b),
              c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg
                     WHERE tr GROUP BY w1, w2),
              c1 AS (SELECT w1, count(*) AS c1 FROM bg
                     WHERE tr GROUP BY w1),
              v AS (SELECT count(DISTINCT w) AS vsz FROM
                      (SELECT w1 AS w FROM bg WHERE tr
                       UNION ALL SELECT w2 FROM bg WHERE tr)),
              t AS (SELECT bg.doc_id,
                      CAST(ln((CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE))
                        / (CAST(COALESCE(c1.c1, 0) AS DOUBLE)
                           + CAST(v.vsz AS DOUBLE)))
                        AS DECIMAL(38,12)) AS term
                    FROM bg
                    LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
                    LEFT JOIN c1 ON bg.w1 = c1.w1
                    CROSS JOIN v
                    WHERE NOT bg.tr)
             SELECT doc_id, count(*) AS n_bigrams,
                    round(-CAST(sum(term) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE), 9) AS cross_entropy
             FROM t GROUP BY doc_id ORDER BY doc_id"""))

  /** Markup stripping — the first stage of any web-corpus cleaning
    * pipeline. Same synthesis doctrine as q_text_pii_mask (the corpus has
    * no organic HTML, so a deterministic wrapper is built from doc fields
    * identically in both engines); the hash match certifies tag-removal +
    * whitespace-collapse semantics cross-engine. Pure codegen projection.
    */
  val qTextStripMarkup = Q(
    "q_text_strip_markup",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("<div id=\"d"), col("doc_id"), lit("\"><p>"),
            col("text"), lit("</p><br/><span>"), col("source"),
            lit("</span></div>")).as("html"))
        .withColumn("clean",
          trim(regexp_replace(
            regexp_replace(col("html"), "<[^>]+>", " "), " +", " ")))
        .select(col("doc_id"), col("clean"),
          length(col("clean")).cast(LongType).as("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, clean, length(clean) AS n_chars
            FROM (SELECT doc_id,
                    trim(regexp_replace(regexp_replace(html,
                      '<[^>]+>', ' ', 'g'), ' +', ' ', 'g')) AS clean
                  FROM (SELECT doc_id,
                          '<div id="d' || doc_id || '"><p>' || text ||
                          '</p><br/><span>' || source ||
                          '</span></div>' AS html
                        FROM documents))
            ORDER BY doc_id"""))

  /** URL/domain extraction over synthesized bodies (same doctrine):
    * group-1 regexp_extract_all → explode → domain frequency. Certifies
    * the extract-ALL-with-capture-group semantics both engines must share.
    */
  val qTextUrlDomains = Q(
    "q_text_url_domains",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("see https://"), col("source"),
            lit(".example.com/doc/"), col("doc_id"),
            lit(" and http://m"), col("doc_id") % 7,
            lit(".example.org/x")).as("body"))
        .select(explode(expr(
          "regexp_extract_all(body, 'https?://([a-z0-9.-]+)', 1)"))
          .as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n"))
        .orderBy("domain"),
    Some("""SELECT domain, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(body,
                    'https?://([a-z0-9.-]+)', 1)) AS domain
                  FROM (SELECT 'see https://' || source ||
                          '.example.com/doc/' || doc_id ||
                          ' and http://m' || (doc_id % 7) ||
                          '.example.org/x' AS body
                        FROM documents))
            GROUP BY domain ORDER BY domain"""))

  val qTextFingerprint = Q(
    "q_text_fingerprint",
    // r21: the fingerprint is a PURE PER-DOCUMENT value, so it computes
    // entirely map-side via the ShingleMd5Set kernel (per-doc distinct
    // shingle strings → sorted pHash60 multiset, identical values to
    // Det.pHash60 over shingleSets) — the explode, the (doc_id, shingle)
    // distinct exchange and the collect_list aggregation exchange are
    // all gone; the plan is scan → project → sort. ×50 long-doc axis:
    // 13.8 s → map-bound; pinned vs the old formulation by R21OptSpec.
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      // r22 (verdict #3): filter on the CHEAP pushable predicate instead
      // of size(kernel) > 0 — the pushed-down filter was re-evaluating
      // the md5 kernel once per row below the project (2 kernel
      // occurrences in the plan). hs is non-empty ⟺ the doc has ≥ 3
      // split tokens (ShingleKernel emits no shingles below 3 tokens,
      // ≥ 1 distinct shingle at 3), so the predicates are equivalent by
      // construction; the kernel now appears ONCE, in the project.
      Tables.documents(s, dir)
        .where(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          expr("shingle_md5p60_set(split(text, ' '))").as("hs"))
        .select(col("doc_id"),
          array_join(expr("slice(hs, 1, 8)"), ",").as("fingerprint"),
          size(col("hs")).cast(LongType).as("n_shingles"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents
                        WHERE len(string_split(text, ' ')) >= 3),
                  sh AS (SELECT DISTINCT doc_id,
                           unnest([array_to_string(toks[i:i+2], ' ')
                                   FOR i IN range(1, greatest(len(toks)-1, 1))])
                             AS shingle
                         FROM d),
                  r AS (SELECT doc_id,
                          ${Det.sqlPHash60("shingle")} AS h,
                          row_number() OVER (PARTITION BY doc_id
                            ORDER BY ${Det.sqlPHash60("shingle")}) AS rk
                        FROM sh)
             SELECT doc_id,
                    string_agg(CASE WHEN rk <= 8 THEN CAST(h AS VARCHAR) END,
                               ',' ORDER BY h) AS fingerprint,
                    count(*) AS n_shingles
             FROM r GROUP BY doc_id ORDER BY doc_id"""))

  /** Zipf-law fit — the corpus-health scalar behind q_text_tokens_top's
    * raw list (natural language sits near exponent −1 on the rank–
    * frequency log-log line; word salad, templated spam, and truncated
    * vocabularies all bend it — a one-number pretraining-corpus triage):
    * log-log OLS over the top-100 token ranks. Rank rides a row_number
    * on the LIMIT-100 result (bounded by construction — the topn_share
    * allowlist class); each ln() is Dec12-quantized BEFORE the moment
    * products and every sum is an order-free decimal sum (the engines'
    * ln() differs in the last ulp — §7.2), slope/intercept are ONE
    * shared formula. One vocabulary-bounded aggregate + O(100) rows.
    */
  val qTextZipfFit = Q(
    "q_text_zipf_fit",
    (s, dir) => {
      val Dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val q12 = (e: String) => s"CAST(CAST(($e) AS DECIMAL(38,12)) AS DOUBLE)"
      val top = tokens(Tables.documents(s, dir))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok")).limit(100)
      val ranked = top.withColumn("rk", row_number().over(
        Window.orderBy(col("f").desc, col("tok"))))
        .select(
          expr(q12("ln(CAST(rk AS DOUBLE))")).as("lx"),
          expr(q12("ln(CAST(f AS DOUBLE))")).as("ly"))
      ranked
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("CAST(lx AS DECIMAL(38,12))")).cast("double").as("sx"),
          sum(expr("CAST(ly AS DECIMAL(38,12))")).cast("double").as("sy"),
          sum(expr("CAST(lx * ly AS DECIMAL(38,12))")).cast("double")
            .as("sxy"),
          sum(expr("CAST(lx * lx AS DECIMAL(38,12))")).cast("double")
            .as("sxx"))
        .select(col("n_tokens"),
          expr("(CAST(n_tokens AS DOUBLE) * sxy - sx * sy) / " +
            "(CAST(n_tokens AS DOUBLE) * sxx - sx * sx)").as("zipf_slope"),
          expr("(sy - ((CAST(n_tokens AS DOUBLE) * sxy - sx * sy) / " +
            "(CAST(n_tokens AS DOUBLE) * sxx - sx * sx)) * sx) / " +
            "CAST(n_tokens AS DOUBLE)").as("zipf_intercept"))
    },
    Some("""WITH tok AS (SELECT doc_id, w
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                        FROM documents) WHERE w <> ''),
             top AS (SELECT w AS tok, count(*) AS f FROM tok
                     GROUP BY w ORDER BY f DESC, tok LIMIT 100),
             ranked AS (SELECT
                    CAST(CAST(ln(CAST(row_number() OVER (
                        ORDER BY f DESC, tok) AS DOUBLE))
                      AS DECIMAL(38,12)) AS DOUBLE) AS lx,
                    CAST(CAST(ln(CAST(f AS DOUBLE))
                      AS DECIMAL(38,12)) AS DOUBLE) AS ly
                  FROM top),
             m AS (SELECT count(*) AS n_tokens,
                    CAST(sum(CAST(lx AS DECIMAL(38,12))) AS DOUBLE) AS sx,
                    CAST(sum(CAST(ly AS DECIMAL(38,12))) AS DOUBLE) AS sy,
                    CAST(sum(CAST(lx * ly AS DECIMAL(38,12))) AS DOUBLE)
                      AS sxy,
                    CAST(sum(CAST(lx * lx AS DECIMAL(38,12))) AS DOUBLE)
                      AS sxx
                  FROM ranked)
            SELECT n_tokens,
                   (CAST(n_tokens AS DOUBLE) * sxy - sx * sy) /
                   (CAST(n_tokens AS DOUBLE) * sxx - sx * sx) AS zipf_slope,
                   (sy - ((CAST(n_tokens AS DOUBLE) * sxy - sx * sy) /
                   (CAST(n_tokens AS DOUBLE) * sxx - sx * sx)) * sx) /
                   CAST(n_tokens AS DOUBLE) AS zipf_intercept
            FROM m"""))

  /** Boilerplate / template detection — the corpus-frequency dedup signal
    * CCNet/RefinedWeb-style pipelines run BEFORE pair dedup (headers,
    * nav bars, license blocks repeat across thousands of pages; pairwise
    * jaccard never isolates them, and they poison MinHash buckets — see
    * MaxBucket): a shingle appearing in ≥ 4 DISTINCT documents is
    * boilerplate, and each doc is scored by its boilerplate-shingle
    * ratio (the drop/clean decision input). Reuses the 3-token shingle
    * axis of q_text_fingerprint so the two signals are comparable.
    * Scale: shingle→df is one hash aggregate; the doc score is one
    * equi-join on the shingle key (bounded fan-in — df counts, not
    * postings) + one per-doc aggregate; no windows, no pair fan-out.
    */
  val qTextBoilerplate = Q(
    "q_text_boilerplate",
    (s, dir) => {
      // postings ride xxhash64(shingle), not the shingle string, through
      // BOTH exchanges (the q_dedup_jaccard_pairs byte trade, same
      // ~n²/2⁶⁵ collision acceptance): a 3-token shingle is ~25 chars,
      // the hash is 8 bytes — at the ×50 long-doc axis this join was
      // 26.9 MB of string shuffle, the char-level family's largest.
      // r21: the ShingleXxh64Set kernel replaces the interpreted shingle
      // transform AND the string-keyed distinct exchange (per-doc
      // distinct on the hash — the same collision acceptance as above,
      // now applied one step earlier).
      graft.plans.VectorFunctions.register(s)
      val ss = Tables.documents(s, dir)
        .select(col("doc_id"), explode(
          expr("shingle_xxh64_set(split(text, ' '))")).as("shingle"))
      val dfc = ss.groupBy("shingle").agg(count(lit(1)).as("df"))
      ss.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 4, 1L).otherwise(0L)).as("n_boiler"))
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          expr("CAST(n_boiler AS DOUBLE) / CAST(n_shingles AS DOUBLE)")
            .as("boiler_ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
             sh AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, greatest(len(toks)-1, 1))])
                        AS shingle
                    FROM d),
             dfc AS (SELECT shingle, count(*) AS df FROM sh
                     GROUP BY shingle)
            SELECT doc_id, count(*) AS n_shingles,
                   CAST(sum(CASE WHEN df >= 4 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_boiler,
                   CAST(sum(CASE WHEN df >= 4 THEN 1 ELSE 0 END)
                     AS DOUBLE) / CAST(count(*) AS DOUBLE) AS boiler_ratio
            FROM sh JOIN dfc USING (shingle)
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Language-ID heuristic: build per-language top-5 token profiles from
    * the corpus, then classify each doc by profile-token overlap
    * (tie-break: lexicographically smallest language).
    */
  /** The lang-id prediction pipeline (doc_id, pred_lang, hits) — shared
    * by q_text_lang_id and the q_eval_lang_confusion evaluation readout.
    */
  private def langIdPredictions(s: SparkSession, dir: String): DataFrame = {
      val docs = Tables.documents(s, dir)
      val tok = tokens(docs)
      // lang rides the generator projection (the de-join shape) — the
      // r14 text re-joined the token stream to documents on doc_id
      val langTok = tokens(docs, "lang")
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      val wTop = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("tok"))
      val profile = langTok
        .withColumn("rk", row_number().over(wTop))
        .where(col("rk") <= 5)
        .select(col("lang").as("profile_lang"), col("tok"))
      val votes = tok.select("doc_id", "tok").distinct()
        .join(broadcast(profile), "tok")
        .groupBy("doc_id", "profile_lang")
        .agg(count(lit(1)).as("hits"))
      val wBest = Window.partitionBy(col("doc_id"))
        .orderBy(col("hits").desc, col("profile_lang"))
      votes
        .withColumn("rk", row_number().over(wBest))
        .where(col("rk") === 1)
        .select(col("doc_id"), col("profile_lang").as("pred_lang"),
          col("hits"))
  }

  val qTextLangId = Q(
    "q_text_lang_id",
    (s, dir) => langIdPredictions(s, dir).orderBy("doc_id"),
    Some("""WITH tok AS (SELECT DISTINCT doc_id, tok
                         FROM (SELECT doc_id,
                                 unnest(string_split(text, ' ')) AS tok
                               FROM documents)
                         WHERE tok <> ''),
                 lt AS (SELECT lang, tok, count(*) AS n
                        FROM (SELECT lang,
                                unnest(string_split(text, ' ')) AS tok
                              FROM documents)
                        WHERE tok <> '' GROUP BY lang, tok),
                 prof AS (SELECT lang AS profile_lang, tok
                          FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, tok) AS rk FROM lt)
                          WHERE rk <= 5),
                 votes AS (SELECT t.doc_id, p.profile_lang, count(*) AS hits
                           FROM tok t JOIN prof p USING (tok)
                           GROUP BY t.doc_id, p.profile_lang)
            SELECT doc_id, profile_lang AS pred_lang, hits
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY hits DESC, profile_lang) AS rk FROM votes)
            WHERE rk = 1 ORDER BY doc_id"""))

  /** Classifier evaluation: the lang-id CONFUSION MATRIX — the readout
    * that closes any classifier loop (q_text_lang_id emits predictions;
    * until they are scored against truth the operator is a demo, not a
    * component): per (true_lang, pred_lang) cell count, correctness
    * flag, and the cell's share of its true class (the per-class recall
    * decomposition); docs the voter abstains on (no profile token hits)
    * surface as pred 'none' rather than vanishing. Bounded |langs|²
    * grid; marginals are broadcast joins (χ² doctrine).
    */
  val qEvalLangConfusion = Q(
    "q_eval_lang_confusion",
    (s, dir) => {
      val pred = langIdPredictions(s, dir).select("doc_id", "pred_lang")
      val truth = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("true_lang"))
      val cells = truth.join(pred, Seq("doc_id"), "left")
        .select(col("true_lang"),
          coalesce(col("pred_lang"), lit("none")).as("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
      val rowTot = cells.groupBy("true_lang").agg(sum(col("n")).as("rt"))
      cells.join(broadcast(rowTot), "true_lang")
        .select(col("true_lang"), col("pred_lang"), col("n"),
          (col("true_lang") === col("pred_lang")).as("is_correct"),
          expr("CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)")
            .as("share_of_true"))
        .orderBy("true_lang", "pred_lang")
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id, tok
                  FROM (SELECT doc_id,
                          unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  WHERE tok <> ''),
             lt AS (SELECT lang, tok, count(*) AS n
                    FROM (SELECT lang,
                            unnest(string_split(text, ' ')) AS tok
                          FROM documents)
                    WHERE tok <> '' GROUP BY lang, tok),
             prof AS (SELECT lang AS profile_lang, tok
                      FROM (SELECT *, row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, tok) AS rk FROM lt)
                      WHERE rk <= 5),
             votes AS (SELECT t.doc_id, p.profile_lang, count(*) AS hits
                       FROM tok t JOIN prof p USING (tok)
                       GROUP BY t.doc_id, p.profile_lang),
             pred AS (SELECT doc_id, profile_lang AS pred_lang
                      FROM (SELECT *, row_number() OVER (
                              PARTITION BY doc_id
                              ORDER BY hits DESC, profile_lang) AS rk
                            FROM votes)
                      WHERE rk = 1),
             cells AS (SELECT d.lang AS true_lang,
                     coalesce(p.pred_lang, 'none') AS pred_lang,
                     count(*) AS n
                   FROM documents d LEFT JOIN pred p USING (doc_id)
                   GROUP BY 1, 2),
             rt AS (SELECT true_lang, sum(n) AS rt FROM cells
                    GROUP BY true_lang)
            SELECT cells.true_lang, pred_lang, n,
                   cells.true_lang = pred_lang AS is_correct,
                   CAST(n AS DOUBLE) / CAST(rt.rt AS DOUBLE)
                     AS share_of_true
            FROM cells JOIN rt ON cells.true_lang = rt.true_lang
            ORDER BY cells.true_lang, pred_lang"""))

  /** Retrieval evaluation: P@k / recall / MRR / NDCG for the BM25 ranker
    * against a deterministic pseudo-qrel (relevant = doc contains ALL
    * three query terms — the conjunctive-containment label that needs no
    * human judgments and is identically computable in both engines).
    * Same closing-the-loop rationale as the confusion matrix, for the
    * search family: rankers without metrics are demos. Ranks ride the
    * LIMIT-20 BM25 surface (bounded — allowlisted window class); DCG
    * terms rel/log2(rk+1) are Dec12-quantized before the order-free
    * decimal sum (last-ulp log2 doctrine), IDCG folds the same quantized
    * terms over the first min(10, |rel|) ideal positions via an exploded
    * bounded sequence; MRR/precisions are single divisions of exact
    * integers. Output: ONE summary row.
    */
  val qEvalRetrieval = Q(
    "q_eval_retrieval",
    (s, dir) => {
      val q12 = (e: String) => s"CAST(CAST(($e) AS DECIMAL(38,12)) AS DOUBLE)"
      val bm = scoreDocs(retrievalStats(s, dir), bm25Fml, "bm25")
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
      val ranked = bm.withColumn("rk", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      val rel = tokens(Tables.documents(s, dir))
        .where(col("tok").isin("join", "window", "scan"))
        .select(col("doc_id"), col("tok")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("nt"))
        .where(col("nt") === 3)
        .select(col("doc_id"), lit(1L).as("rel"))
      val nRel = rel.agg(count(lit(1)).as("n_rel"))
      val scored = ranked.join(rel, Seq("doc_id"), "left")
        .withColumn("r", coalesce(col("rel"), lit(0L)))
      val dcg = scored.agg(
        sum(when(col("rk") <= 5, col("r")).otherwise(0L)).as("hits5"),
        sum(when(col("rk") <= 10, col("r")).otherwise(0L)).as("hits10"),
        sum(col("r")).as("hits20"),
        min(when(col("r") === 1, col("rk"))).as("first_rel_rk"),
        sum(expr(q12("CASE WHEN rk <= 10 THEN CAST(r AS DOUBLE) " +
          "/ log2(CAST(rk + 1 AS DOUBLE)) ELSE 0.0 END"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double").as("dcg10"))
      val idcg = nRel.select(col("n_rel"),
        explode(expr("sequence(1, greatest(least(n_rel, 10), 1))"))
          .as("i"))
        .groupBy("n_rel")
        .agg(sum(expr(q12("CASE WHEN n_rel > 0 THEN 1.0 " +
          "/ log2(CAST(i + 1 AS DOUBLE)) ELSE 0.0 END"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
          .cast("double").as("idcg10"))
      dcg.crossJoin(broadcast(idcg))
        .select(col("n_rel"),
          expr("CAST(hits5 AS DOUBLE) / 5.0").as("p_at_5"),
          expr("CAST(hits10 AS DOUBLE) / 10.0").as("p_at_10"),
          expr("CASE WHEN n_rel > 0 THEN CAST(hits20 AS DOUBLE) " +
            "/ CAST(n_rel AS DOUBLE) ELSE NULL END").as("recall_at_20"),
          expr("CASE WHEN first_rel_rk IS NULL THEN 0.0 ELSE " +
            "1.0 / CAST(first_rel_rk AS DOUBLE) END").as("mrr"),
          expr("CASE WHEN idcg10 > CAST(0 AS DOUBLE) " +
            "THEN round(dcg10 / idcg10, 10) ELSE NULL END")
            .as("ndcg_at_10"))
    },
    Some(s"""WITH $retrievalStatsCte,
             ${scoreDocsCte(bm25Fml, "bm25", "bm")},
             top AS (SELECT doc_id, bm25 FROM bm
                     ORDER BY bm25 DESC, doc_id LIMIT 20),
             ranked AS (SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                       AS INT) AS rk
                   FROM top),
             rel AS (SELECT doc_id, 1 AS rel
                   FROM (SELECT doc_id, count(DISTINCT tok) AS nt
                         FROM tc
                         WHERE tok IN ('join', 'window', 'scan')
                         GROUP BY doc_id)
                   WHERE nt = 3),
             nr AS (SELECT count(*) AS n_rel FROM rel),
             scored AS (SELECT rk, coalesce(rel, 0) AS r
                   FROM ranked LEFT JOIN rel USING (doc_id)),
             d AS (SELECT
                     CAST(sum(CASE WHEN rk <= 5 THEN r ELSE 0 END)
                       AS BIGINT) AS hits5,
                     CAST(sum(CASE WHEN rk <= 10 THEN r ELSE 0 END)
                       AS BIGINT) AS hits10,
                     CAST(sum(r) AS BIGINT) AS hits20,
                     min(CASE WHEN r = 1 THEN rk END) AS first_rel_rk,
                     CAST(sum(CAST(CAST(
                       CASE WHEN rk <= 10 THEN CAST(r AS DOUBLE)
                         / log2(CAST(rk + 1 AS DOUBLE)) ELSE 0.0 END
                       AS DECIMAL(38,12)) AS DECIMAL(38,12))) AS DOUBLE)
                       AS dcg10
                   FROM scored),
             ig AS (SELECT n_rel,
                     CAST(sum(CAST(CAST(
                       CASE WHEN n_rel > 0 THEN 1.0
                         / log2(CAST(i + 1 AS DOUBLE)) ELSE 0.0 END
                       AS DECIMAL(38,12)) AS DECIMAL(38,12))) AS DOUBLE)
                       AS idcg10
                   FROM (SELECT n_rel,
                           unnest(range(1,
                             greatest(least(n_rel, 10), 1) + 1)) AS i
                         FROM nr)
                   GROUP BY n_rel)
            SELECT CAST(n_rel AS BIGINT) AS n_rel,
                   CAST(hits5 AS DOUBLE) / 5.0 AS p_at_5,
                   CAST(hits10 AS DOUBLE) / 10.0 AS p_at_10,
                   CASE WHEN n_rel > 0 THEN CAST(hits20 AS DOUBLE)
                     / CAST(n_rel AS DOUBLE) ELSE NULL END AS recall_at_20,
                   CASE WHEN first_rel_rk IS NULL THEN 0.0 ELSE
                     1.0 / CAST(first_rel_rk AS DOUBLE) END AS mrr,
                   CASE WHEN idcg10 > CAST(0 AS DOUBLE)
                     THEN round(dcg10 / idcg10, 10) ELSE NULL END
                     AS ndcg_at_10
            FROM d CROSS JOIN ig"""))

  /** Repetition quality signals (the "repetitious text" family of the
    * Gopher/MassiveText filter rules, computed here at word granularity):
    * duplicate-token fraction (1 − distinct/total) and most-frequent-token
    * fraction per document. Highly repetitious documents are the single
    * cheapest badness signal a corpus filter has — boilerplate, keyword
    * stuffing, and generation loops all spike both ratios.
    *
    * Shape: token explode → (doc, tok) count → per-doc merge. Both
    * aggregations are map-side-combinable; per-doc key cardinality is
    * bounded by vocabulary, never corpus size. Ratios are ONE IEEE
    * division of exact longs in both engines (§7.2 doctrine).
    */
  val qTextRepetition = Q(
    "q_text_repetition",
    (s, dir) =>
      tokens(Tables.documents(s, dir).where(col("doc_id") < 300))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"), max(col("c")).as("top_count"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          ((col("n_tokens") - col("n_distinct")).cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("dup_frac"),
          (col("top_count").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("top_frac"))
        .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents WHERE doc_id < 300),
                 tf AS (SELECT doc_id, tok, count(*) AS c FROM t
                        WHERE tok <> '' GROUP BY doc_id, tok),
                 d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                              count(*) AS n_distinct,
                              CAST(max(c) AS BIGINT) AS top_count
                       FROM tf GROUP BY doc_id)
            SELECT doc_id, n_tokens, n_distinct,
                   CAST(n_tokens - n_distinct AS DOUBLE) /
                     CAST(n_tokens AS DOUBLE) AS dup_frac,
                   CAST(top_count AS DOUBLE) /
                     CAST(n_tokens AS DOUBLE) AS top_frac
            FROM d ORDER BY doc_id"""))

  /** Train→eval CONTAMINATION check — the pre-training hygiene step every
    * serious corpus pipeline runs before a model train: for each held-out
    * (test-split) document, what fraction of its distinct 3-gram shingles
    * also occurs anywhere in the train split? Split assignment reuses
    * q_corpus_split's pure-function-of-id hash (so the check is stable as
    * the corpus grows); overlap is a LEFT SEMI join on the shingle — the
    * contaminated subset — against a per-doc total.
    *
    * Scale posture: the train shingle set at 100 TB is far beyond any
    * broadcast — this is deliberately a SHUFFLE semi-join on the shingle
    * key (bounded doc-frequency per shingle keeps fan-in flat), and the
    * distinct-before-join keeps the build side minimal. No per-doc arrays,
    * no collect.
    */
  val qContamination = Q(
    "q_contamination",
    (s, dir) => {
      val split = Tables.documents(s, dir)
        .select(col("doc_id"),
          pmod(Det.pHash60(col("doc_id")), lit(100)).as("b"))
      val sh = shingleSets(Tables.documents(s, dir))
      val trainSh = sh.join(split.where(col("b") < 80), "doc_id")
        .select("shingle").distinct()
      val testSh = sh.join(split.where(col("b") >= 90), "doc_id")
        .select("doc_id", "shingle")
      val total = testSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val hit = testSh.join(trainSh, Seq("shingle"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      total.join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_hit"), lit(0L)).as("n_contaminated"),
          (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) /
            col("n_shingles").cast(DoubleType)).as("contam_frac"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents
                        WHERE len(string_split(text, ' ')) >= 3),
                 u AS (SELECT DISTINCT doc_id, shingle
                       FROM (SELECT doc_id,
                               unnest([array_to_string(toks[i:i+2], ' ')
                                       FOR i IN range(1,
                                         greatest(len(toks) - 1, 1))])
                                 AS shingle
                             FROM d)),
                 sp AS (SELECT doc_id,
                          ((${Det.sqlPHash60("doc_id")}) % 100 + 100) % 100
                            AS b
                        FROM documents),
                 tr AS (SELECT DISTINCT shingle
                        FROM u JOIN sp USING (doc_id) WHERE b < 80),
                 te AS (SELECT u.doc_id, u.shingle
                        FROM u JOIN sp USING (doc_id) WHERE b >= 90)
             SELECT doc_id, count(*) AS n_shingles,
                    CAST(sum(CASE WHEN tr.shingle IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_contaminated,
                    CAST(sum(CASE WHEN tr.shingle IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE) /
                      CAST(count(*) AS DOUBLE) AS contam_frac
             FROM te LEFT JOIN tr ON te.shingle = tr.shingle
             GROUP BY doc_id ORDER BY doc_id"""))

  /** Reproducible STRATIFIED sampling — exactly k docs per stratum, chosen
    * by portable-hash rank (same pure-function-of-id doctrine as
    * q_corpus_split): the sample is identical across runs, engines, and
    * partitioning, and STABLE under corpus growth in expectation (a new doc
    * displaces at most one sampled doc of its own stratum, never reshuffles
    * the rest — rand()/TABLESAMPLE resample everything). This is how a
    * training pipeline pins eval subsets and ablation slices.
    *
    * Scale posture: rank-within-stratum is the WindowGroupLimit shape —
    * Spark pushes a per-partition partial top-k below the shuffle, so the
    * exchange carries O(strata·k) rows, not the corpus.
    */
  val qSampleStratified = Q(
    "q_sample_stratified",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(Det.pHash60(col("doc_id")), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 20)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy("source", "rk")
    },
    Some(s"""SELECT source, rk, doc_id
             FROM (SELECT source, doc_id,
                     CAST(row_number() OVER (PARTITION BY source
                       ORDER BY ${Det.sqlPHash60("doc_id")}, doc_id)
                       AS INTEGER) AS rk
                   FROM documents)
             WHERE rk <= 20 ORDER BY source, rk"""))

  /** Keyphrase mining — frequent multi-word expression extraction (the
    * collocation/glossary step of corpus analysis; q_text_cooccur scores
    * token PAIRS anywhere in a doc, this finds CONTIGUOUS phrases):
    * stopwords are DATA-DRIVEN (the corpus top-5 tokens — no external
    * list, so the operator ports to any language the pipeline meets),
    * candidate phrases are the maximal stopword-free token runs per doc
    * (run id = running stopword count over the position axis — one
    * doc-partitioned window), and the output is the top-20 phrases of
    * length ≥ 2 by exact corpus frequency, (n desc, phrase) tie-broken.
    * Scale: the run segmentation is a per-doc window (position axis,
    * doc-bounded); phrase counting is one hash aggregate on the phrase
    * string; the stopword table is a bounded top-k broadcast.
    */
  val qTextKeyphrases = Q(
    "q_text_keyphrases",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(expr("filter(split(text, ' '), t -> t != '')")))
        .select(col("doc_id"), col("pos"), col("col").as("tok"))
      val stop = tok.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(5)
        .select(col("tok").as("stok"), lit(true).as("is_stop"))
      val runs = tok.join(broadcast(stop),
          col("tok") === col("stok"), "left")
        .withColumn("run_id", sum(
          when(col("is_stop"), 1).otherwise(0)).over(
          Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("is_stop").isNull)
      val phrases = runs.groupBy("doc_id", "run_id")
        .agg(expr("array_join(transform(" +
          "array_sort(collect_list(struct(pos, tok))), s -> s.tok), ' ')")
          .as("phrase"),
          count(lit(1)).as("len"))
        .where(col("len") >= 2)
      phrases.groupBy("phrase", "len")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("phrase"))
        .limit(20)
    },
    Some("""WITH tok AS (SELECT doc_id, CAST(t.i AS INT) - 1 AS pos,
                    toks[CAST(t.i AS INT)] AS tok
                  FROM (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                            x -> x <> '') AS toks
                        FROM documents),
                       unnest(range(1, len(toks) + 1)) AS t(i)),
             stop AS (SELECT tok FROM (
                 SELECT tok, count(*) AS n FROM tok GROUP BY tok
                 ORDER BY n DESC, tok LIMIT 5)),
             marked AS (SELECT doc_id, pos, tok,
                          tok IN (SELECT tok FROM stop) AS is_stop
                        FROM tok),
             runs AS (SELECT doc_id, pos, tok,
                        CAST(sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS run_id,
                        is_stop
                      FROM marked),
             phrases AS (SELECT doc_id, run_id,
                           string_agg(tok, ' ' ORDER BY pos) AS phrase,
                           CAST(count(*) AS BIGINT) AS len
                         FROM runs WHERE NOT is_stop
                         GROUP BY doc_id, run_id
                         HAVING count(*) >= 2)
            SELECT phrase, len, count(*) AS n
            FROM phrases GROUP BY phrase, len
            ORDER BY n DESC, phrase LIMIT 20"""))

  /** SYSTEMATIC sampling — every k-th element of a total order (the
    * audit/eval-slice draw when you want guaranteed coverage of the
    * whole quality range, where uniform hashing clusters and stratified
    * needs strata): rank customers by (acctbal desc, custkey), keep
    * rank ≡ 1 (mod 50). The global rank rides Prefix.globalRank (64
    * monotone range buckets + broadcast offsets — NO partition-less
    * window over the entity table; the only global window touches the
    * 64 bucket counts), while the oracle uses the naive single-window
    * row_number — the hash match proves the decomposition yet again on
    * a third consumer shape (after pareto's sums and ks's counts).
    */
  val qSampleSystematic = Q(
    "q_sample_systematic",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"))
      Prefix.globalRank(
        Prefix.withRangeBucket(c, col("c_acctbal"), 64, "__b"),
        "__b", Seq(col("c_acctbal").desc, col("c_custkey")),
        bucketDesc = true, "rk")
        .where(pmod(col("rk"), lit(50)) === 1)
        .select(col("rk"), col("c_custkey"), col("c_acctbal"))
        .orderBy("rk")
    },
    Some("""SELECT rk, c_custkey, c_acctbal
            FROM (SELECT c_custkey, c_acctbal,
                    CAST(row_number() OVER (
                      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
                  FROM customer)
            WHERE rk % 50 = 1 ORDER BY rk"""))

  /** Deterministic WEIGHTED sampling without replacement — Efraimidis–
    * Spirakis A-ES over a weight column (here n_chars: length-
    * proportional document draws, the token-budget-aware corpus sample;
    * stratified = per-group quotas, systematic = coverage of a total
    * order, THIS = probability ∝ weight). Each row's priority is
    * ln(u)/w with u ∈ (0,1) derived from the portable md5 hash (§7.2 —
    * no rand()), w = the row weight; the sample is the global top-20 by
    * priority, which is EXACTLY a weighted draw without replacement
    * (the A-ES theorem), reproducible bit-for-bit in both engines.
    * Scale: priority is stateless per-row arithmetic; top-20 plans as
    * TakeOrderedAndProject (bounded heap per partition + driver merge of
    * k) — no global sort, no window.
    */
  val qSampleWeighted = Q(
    "q_sample_weighted",
    (s, dir) => {
      val u = "((CAST(pmod(h, 1073741824) AS DOUBLE) + CAST(0.5 AS DOUBLE))" +
        " / CAST(1073741824 AS DOUBLE))"
      Tables.documents(s, dir)
        .where(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          Det.pHash60(concat_ws("#", lit("ws"), col("doc_id"))).as("h"))
        // Dec12 re-quantization: glibc and JVM ln() differ in the last
        // ulp on some inputs; 12-decimal priorities are engine-identical
        // and still carry ~8 significant digits at the |pr| ~ 1e-4 scale
        .select(col("doc_id"), col("n_chars"),
          expr(s"CAST(CAST(ln($u) / CAST(n_chars AS DOUBLE)" +
            " AS DECIMAL(38,12)) AS DOUBLE)").as("pr"))
        .orderBy(col("pr").desc, col("doc_id"))
        .limit(20)
    },
    Some {
      val h = Det.sqlPHash60("concat_ws('#', 'ws', doc_id)")
      val u = s"((CAST(($h) % 1073741824 AS DOUBLE) + CAST(0.5 AS DOUBLE))" +
        " / CAST(1073741824 AS DOUBLE))"
      s"""SELECT doc_id, n_chars,
                 CAST(CAST(ln($u) / CAST(n_chars AS DOUBLE)
                   AS DECIMAL(38,12)) AS DOUBLE) AS pr
          FROM documents WHERE n_chars > 0
          ORDER BY pr DESC, doc_id LIMIT 20"""
    })

  /** Bigram language-model scoring — the statistical-fluency quality
    * signal (a cheap perplexity proxy): per document, the average and
    * minimum corpus-MLE transition probability
    * P(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1} ·).
    * Word-salad and shuffled text score near the unigram floor; fluent
    * text scores high; the min flags the single most improbable
    * transition. Counts are corpus-global, scoring is per-doc.
    *
    * Determinism: each P is ONE IEEE division of exact longs; the per-doc
    * average goes through the Dec12 sum (order-independent) + one final
    * division + round (§7.2, same doctrine as q_embed_centroids' mu).
    * Scale posture: both count tables are vocabulary-bounded groupBys;
    * scoring is a shuffle equi-join on the token key (bounded fan-in, no
    * broadcast assumption on the vocabulary).
    */
  val qTextNgramLm = Q(
    "q_text_ngram_lm",
    (s, dir) => {
      val bg = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1, " +
            "element_at(toks, i + 1) AS w2))")).as("x"))
        .select(col("doc_id"), col("x.w1").as("w1"), col("x.w2").as("w2"))
      val cnt2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cnt2"))
      val cnt1 = bg.groupBy("w1").agg(count(lit(1)).as("cnt1"))
      bg.where(col("doc_id") < 300)
        .join(cnt2, Seq("w1", "w2")).join(cnt1, Seq("w1"))
        .select(col("doc_id"),
          (col("cnt2").cast(DoubleType) / col("cnt1").cast(DoubleType))
            .as("p"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(Det.davg12(col("p")), 9).as("avg_p"),
          min(col("p")).as("min_p"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents
                        WHERE len(string_split(text, ' ')) >= 2),
                 b AS (SELECT doc_id,
                         unnest([{'w1': toks[i], 'w2': toks[i + 1]}
                                 FOR i IN range(1, len(toks))]) AS x
                       FROM d),
                 bg AS (SELECT doc_id, x.w1 AS w1, x.w2 AS w2 FROM b),
                 c2 AS (SELECT w1, w2, count(*) AS cnt2 FROM bg
                        GROUP BY w1, w2),
                 c1 AS (SELECT w1, count(*) AS cnt1 FROM bg GROUP BY w1),
                 p AS (SELECT doc_id,
                         CAST(cnt2 AS DOUBLE) / CAST(cnt1 AS DOUBLE) AS p
                       FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                       WHERE doc_id < 300)
             SELECT doc_id, count(*) AS n_bigrams,
                    round(${Det.sqlAvg12("p")}, 9) AS avg_p,
                    min(p) AS min_p
             FROM p GROUP BY doc_id ORDER BY doc_id"""))

  /** Sequence PACKING for pretraining — the concat-then-chunk layout every
    * GPT-style data loader consumes: documents are laid end-to-end in a
    * deterministic order (portable-hash shuffle — reproducible, unlike
    * rand()) and cut every B=512 tokens; each doc reports its global token
    * offset and the training-chunk span it lands in.
    *
    * The global running offset is THE textbook distributed prefix sum, and
    * this implements the scale-correct two-phase form: a single global
    * window would serialize the corpus through ONE task at 100 TB. Instead
    * (1) docs hash into 64 ordered buckets; (2) the per-doc cumsum runs
    * per-bucket (parallel windows); (3) bucket totals — 64 rows — get their
    * own running offset and broadcast back. offset = bucket_offset +
    * local_cumsum. The ORACLE is the naive single-window global cumsum over
    * the same (bucket, hash, id) total order, so the hash match proves the
    * decomposition exact.
    */
  val qCorpusPack = Q(
    "q_corpus_pack",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"),
          pmod(Det.pHash60(col("doc_id")), lit(64)).as("bucket"),
          Det.pHash60(col("doc_id")).as("h"))
      val wIn = Window.partitionBy(col("bucket"))
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = d.withColumn("local_off",
        coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
      val wB = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = d.groupBy("bucket").agg(sum(col("n_tok")).as("bt"))
        .withColumn("bucket_off", coalesce(sum(col("bt")).over(wB), lit(0L)))
        .select(col("bucket"), col("bucket_off"))
      local.join(broadcast(offsets), Seq("bucket"))
        .withColumn("start_off", col("local_off") + col("bucket_off"))
        .select(col("doc_id"), col("n_tok"), col("start_off"),
          expr("start_off div 512").as("first_chunk"),
          expr("(start_off + n_tok - 1) div 512").as("last_chunk"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                    ((${Det.sqlPHash60("doc_id")}) % 64 + 64) % 64 AS bucket,
                    (${Det.sqlPHash60("doc_id")}) AS h
                  FROM documents),
                 c AS (SELECT doc_id, n_tok,
                    CAST(coalesce(sum(n_tok) OVER (
                      ORDER BY bucket, h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_off
                  FROM d)
             SELECT doc_id, n_tok, start_off,
                    start_off // 512 AS first_chunk,
                    (start_off + n_tok - 1) // 512 AS last_chunk
             FROM c ORDER BY doc_id"""))

  /** Domain-mixture REWEIGHTING — the sampling step that turns a raw crawl
    * into a training mixture (downsample the over-represented language,
    * replicate the under-represented one; the DoReMi/data-mixing shape).
    * Per-doc copy count is a PURE FUNCTION of (doc_id, lang weight):
    * copies = ⌊w⌋ + [hash‰ < frac(w)·1000] — all integer comparisons (the
    * 3-decimal weights make the thresholds exact), so the mixture is
    * reproducible across runs/engines/partitioning and stable under corpus
    * growth, unlike rand()-based sampling. Spark EMITS the replicated rows
    * (explode over sequence — what a training exporter actually writes,
    * guarded against Spark's descending sequence(1,0)); the oracle
    * computes copy counts arithmetically and aggregates — the hash match
    * proves emit ≡ arithmetic.
    */
  val qCorpusMixture = Q(
    "q_corpus_mixture",
    (s, dir) => {
      val base = when(col("lang") === "zh", 2)
        .otherwise(0)
      val thr = when(col("lang") === "en", 400)
        .when(col("lang") === "de", 800)
        .when(col("lang") === "es", 900)
        .when(col("lang") === "fr", 700)
        .otherwise(500) // zh: 2 copies + 50% third
      val h = pmod(Det.pHash60(concat(col("doc_id").cast(
        org.apache.spark.sql.types.StringType), lit("mix"))), lit(1000))
      Tables.documents(s, dir)
        .withColumn("copies", base + when(h < thr, 1).otherwise(0))
        .where(col("copies") >= 1)
        .select(col("doc_id"), col("lang"), col("copies"),
          explode(sequence(lit(1), col("copies"))).as("copy_ix"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("copies")).cast(
            org.apache.spark.sql.types.IntegerType).as("max_copies"))
        .orderBy("lang")
    },
    Some(s"""WITH w AS (SELECT doc_id, lang,
                   (CASE WHEN lang = 'zh' THEN 2 ELSE 0 END) +
                   (CASE WHEN
                      ((${Det.sqlPHash60("CAST(doc_id AS VARCHAR) || 'mix'")})
                        % 1000 + 1000) % 1000 <
                      (CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 800
                                 WHEN 'es' THEN 900 WHEN 'fr' THEN 700
                                 ELSE 500 END)
                    THEN 1 ELSE 0 END) AS copies
                  FROM documents)
             SELECT lang, CAST(sum(copies) AS BIGINT) AS n_rows,
                    count(*) AS n_docs,
                    CAST(max(copies) AS INTEGER) AS max_copies
             FROM w WHERE copies >= 1
             GROUP BY lang ORDER BY lang"""))

  /** Sign of JL projection-matrix entry (dim d ∈ 1..64, component j ∈
    * 0..15): ±1 from the md5 of a fixed tag — the SAME bytes every engine's
    * md5 produces, so the matrix needs no storage and no cross-engine
    * shipping (recompute anywhere, get the same matrix).
    */
  private def jlSign(d: Int, j: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl${d}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** One JL component as expression TEXT — the identical ±-chain is emitted
    * for Spark (`element_at`) and DuckDB (`[...]` indexing), so both
    * engines evaluate the same left-associated double sum: bit-identical
    * results with NO rounding step. Scale factor 1/√16 = 0.25 is an exact
    * binary fraction.
    */
  private def jlComponent(j: Int, elem: Int => String): String =
    "0.25 * (" + (1 to 64).map { d =>
      (if (jlSign(d, j) > 0) "+ " else "- ") +
        s"CAST(${elem(d)} AS DOUBLE)"
    }.mkString(" ") + ")"

  /** Johnson–Lindenstrauss RANDOM PROJECTION, 64 → 16 dims — the embedding
    * compression that preserves pairwise distances within (1±ε) with no
    * training step (the cheap alternative to PCA/IVF re-training when a
    * 100 TB vector store must shrink 4×). The projection matrix is
    * sign-only (±1/√k, Achlioptas 2001 — public result): entries derive
    * from md5 of the (dim, component) tag, so the operator is stateless
    * and reproducible everywhere. Pure per-row codegen projection: no
    * shuffle, no state, trivially parallel at any scale.
    *
    * Full oracle: both engines evaluate the SAME generated ±-chain over
    * exact float→double casts — bit-identical, hash-matched (the matrix
    * equality is certified by construction, the arithmetic by the driver).
    * JlSpec asserts the JL property itself (distance preservation).
    */
  val qEmbedProjectJl = Q(
    "q_embed_project_jl",
    (s, dir) => {
      val cols = col("vec_id") +: (0 until 16).map(j =>
        expr(jlComponent(j, d => s"element_at(embedding, $d)"))
          .as(f"p$j%02d"))
      Tables.embeddings(s, dir)
        .where(col("vec_id") < 200)
        .select(cols: _*)
        .orderBy("vec_id")
    },
    Some({
      val comps = (0 until 16).map(j =>
        s"${jlComponent(j, d => s"embedding[$d]")} AS p${"%02d".format(j)}")
      s"""SELECT vec_id, ${comps.mkString(",\n       ")}
          FROM embeddings WHERE vec_id < 200 ORDER BY vec_id"""
    }))

  /** Grid-density DBSCAN (core-cell variant) over the JL-projected
    * embedding plane — DENSITY clustering next to the centroid family
    * (k-means assigns EVERY point and needs k; DBSCAN discovers cluster
    * COUNT and leaves sparse noise unassigned — the outlier-tolerant
    * shape detector): points land in unit grid cells of the
    * deterministic 2-D JL projection (the classic grid approximation of
    * DBSCAN's ε-ball: a cell with ≥ minPts points is a core CELL, core
    * cells connect through 8-neighborhood into clusters; non-core cells
    * ADJACENT to a core cell are BORDER cells whose points join the
    * nearest core cluster — nearest by center distance, then densest
    * core neighbor, then smallest cell id, a total order — and only
    * non-core cells with NO core neighbor remain noise: the full
    * core/border/noise trichotomy of the original algorithm, r12
    * verdict #6). Spark side runs Graph.connectedComponents
    * (large-star/small-star) over the bounded core-cell adjacency, then
    * assigns border cells with ONE equi-join of the 8-exploded non-core
    * frontier against the bounded labeled-core table; the oracle chains
    * the same cells into the recursive-CTE reachability q_dedup_clusters
    * proved and replays the same assignment rank. Scale: the projection
    * is stateless codegen; the cell census is one hash agg; CC iterates
    * over CELLS (bounded by the grid, not the corpus); border assignment
    * is grid-bounded ×8 expansion + equi-join.
    */
  val qEmbedDbscanGrid = Q(
    "q_embed_dbscan_grid",
    (s, dir) => {
      val minPts = 8
      val pts = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr(jlComponent(0, d => s"element_at(embedding, $d)")).as("x"),
          expr(jlComponent(1, d => s"element_at(embedding, $d)")).as("y"))
        .select(col("vec_id"),
          expr("CAST(floor(x * 8.0) AS BIGINT)").as("cx"),
          expr("CAST(floor(y * 8.0) AS BIGINT)").as("cy"))
      // Single localCheckpoint pin (r17 verdict #5): the cell census is
      // grid-bounded (≤4096² cells at ANY corpus scale; ~hundreds at
      // sf0.1), but EVERY downstream branch — core edges, each CC round,
      // the border explode, the noise anti-join — re-derives it, and
      // unpinned each re-derivation re-ran the embeddings scan plus two
      // 64-term JL chains over the full corpus (the suite's slowest
      // query at 7.65 s with only 0.2 MB shuffle: pure recomputation).
      // Pinned, the corpus is scanned exactly once.
      val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
        .withColumn("cell", expr("(cx + 512) * 4096 + (cy + 512)"))
        .localCheckpoint(true)
      val core = cells.where(col("n") >= minPts)
      val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
        (1, -1), (1, 0), (1, 1))
      val nbr = core.select(col("cell").as("a"),
        explode(array(offs.map { case (dx, dy) =>
          expr(s"(cx + $dx + 512) * 4096 + (cy + $dy + 512)")
        }: _*)).as("b"))
        .join(core.select(col("cell").as("b")), Seq("b"))
      val cc = Graph.connectedComponents(nbr.select(col("a"), col("b")))
      // isolated core cells (no core neighbor) are their own clusters
      val lone = core.select(col("cell"))
        .join(cc.select(col("node")), col("cell") === col("node"),
          "left_anti")
        .select(col("cell").as("node"), col("cell").as("component"))
      val labels = cc.select(col("node"), col("component")).union(lone)
      // Labeled-core table pinned once (the second r17 verdict #5 pin):
      // it feeds three consumers — the border argmax join, the cluster
      // rollup, and (through them) the final union — and is itself
      // grid-bounded, so one more eager checkpoint replaces three
      // re-executions of the core↔labels join (whose lineage reaches
      // back through every CC round).
      val coreLab = core.join(labels, col("cell") === col("node"))
        .select(col("cell").as("ncell"), col("n").as("cn"),
          col("component"))
        .localCheckpoint(true)
      // border assignment: each non-core cell explodes its 8 neighbor
      // ids (grid-bounded), equi-joins the labeled core table, and keeps
      // ONE deterministic winner — nearest (d² 1 before 2), then densest
      // core neighbor, then smallest cell id — via a struct argmax
      val nonCore = cells.where(col("n") < minPts)
      val bnbr = nonCore.select(col("cell").as("bcell"),
        col("n").as("bn"),
        explode(array(offs.map { case (dx, dy) =>
          struct(expr(s"(cx + $dx + 512) * 4096 + (cy + $dy + 512)")
            .as("ncell"), lit(dx * dx + dy * dy).as("d2"))
        }: _*)).as("o"))
        .select(col("bcell"), col("bn"), col("o.ncell"), col("o.d2"))
      val assign = bnbr.join(coreLab, Seq("ncell"))
        .groupBy(col("bcell"), col("bn"))
        .agg(max(struct((-col("d2")).as("nd2"), col("cn"),
          (-col("ncell")).as("nc"), col("component"))).as("m"))
        .select(col("bcell"), col("bn"),
          col("m.component").as("component"))
      val clustered = coreLab
        .groupBy(col("component").as("cluster_id"))
        .agg(count(lit(1)).as("n_cells"), sum(col("cn")).as("n_points"))
      val borderAgg = assign.groupBy(col("component").as("cluster_id"))
        .agg(count(lit(1)).as("n_border_cells"),
          sum(col("bn")).as("n_border_points"))
      val merged = clustered.join(borderAgg, Seq("cluster_id"), "left")
        .select(col("cluster_id"), col("n_cells"),
          coalesce(col("n_border_cells"), lit(0L)).as("n_border_cells"),
          (col("n_points") + coalesce(col("n_border_points"), lit(0L)))
            .as("n_points"))
      // every core cell carries a label (CC nodes ∪ isolated cores), so
      // "cells not in labels" is exactly the non-core set: noise = the
      // non-core cells no border winner touched
      val noise = nonCore
        .join(assign.select(col("bcell")), col("cell") === col("bcell"),
          "left_anti")
        .agg(lit(-1L).as("cluster_id"), count(lit(1)).as("n_cells"),
          lit(0L).as("n_border_cells"),
          coalesce(sum(col("n")), lit(0L)).as("n_points"))
      merged.unionByName(noise)
        .orderBy(col("n_points").desc, col("cluster_id"))
    },
    Some {
      val p0 = jlComponent(0, d => s"embedding[$d]")
      val p1 = jlComponent(1, d => s"embedding[$d]")
      s"""WITH RECURSIVE
             pts AS (SELECT vec_id,
                     CAST(floor(($p0) * 8.0) AS BIGINT) AS cx,
                     CAST(floor(($p1) * 8.0) AS BIGINT) AS cy
                   FROM embeddings),
             cells AS (SELECT cx, cy, count(*) AS n,
                     (cx + 512) * 4096 + (cy + 512) AS cell
                   FROM pts GROUP BY cx, cy),
             core AS (SELECT * FROM cells WHERE n >= 8),
             nbr AS (SELECT a.cell AS src, b.cell AS dst
                   FROM core a JOIN core b
                     ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
                     AND a.cell <> b.cell),
             reach(cell, lbl) AS (
                 SELECT cell, cell FROM core
                 UNION
                 SELECT e.dst, r.lbl
                 FROM reach r JOIN nbr e ON e.src = r.cell),
             labels AS (SELECT cell, min(lbl) AS component
                   FROM reach GROUP BY cell),
             cand AS (SELECT b.cell AS bcell, b.n AS bn,
                     (b.cx - c.cx) * (b.cx - c.cx)
                       + (b.cy - c.cy) * (b.cy - c.cy) AS d2,
                     c.n AS cn, c.cell AS ncell, l.component
                   FROM cells b
                   JOIN core c ON abs(b.cx - c.cx) <= 1
                     AND abs(b.cy - c.cy) <= 1
                   JOIN labels l ON l.cell = c.cell
                   WHERE b.n < 8),
             assign AS (SELECT bcell, bn, component FROM (
                     SELECT *, row_number() OVER (PARTITION BY bcell
                       ORDER BY d2, cn DESC, ncell) AS rn FROM cand)
                   WHERE rn = 1),
             clustered AS (SELECT component AS cluster_id,
                     count(*) AS n_cells, CAST(sum(n) AS BIGINT)
                       AS n_points
                   FROM core JOIN labels USING (cell)
                   GROUP BY component),
             bagg AS (SELECT component AS cluster_id,
                     count(*) AS n_border_cells,
                     CAST(sum(bn) AS BIGINT) AS n_border_points
                   FROM assign GROUP BY component),
             merged AS (SELECT c.cluster_id, c.n_cells,
                     CAST(COALESCE(b.n_border_cells, 0) AS BIGINT)
                       AS n_border_cells,
                     CAST(c.n_points + COALESCE(b.n_border_points, 0)
                       AS BIGINT) AS n_points
                   FROM clustered c LEFT JOIN bagg b USING (cluster_id)),
             noise AS (SELECT -1 AS cluster_id, count(*) AS n_cells,
                     CAST(0 AS BIGINT) AS n_border_cells,
                     CAST(coalesce(sum(n), 0) AS BIGINT) AS n_points
                   FROM cells WHERE cell NOT IN (SELECT cell FROM labels)
                     AND cell NOT IN (SELECT bcell FROM assign))
            SELECT cluster_id, n_cells, n_border_cells, n_points
            FROM (SELECT * FROM merged UNION ALL SELECT * FROM noise)
            ORDER BY n_points DESC, cluster_id"""
    })

  /** BPE pair counting — the inner loop of byte-pair-encoding tokenizer
    * TRAINING (the single most-run corpus statistic in LLM data work:
    * every merge round of BPE/WordPiece recounts adjacent-pair
    * frequencies): count adjacent token pairs corpus-wide, emit the
    * top-30 merge candidates. Pairs are generated per row (transform over
    * an index sequence — zero shuffle until the count), guarded for
    * single-token docs (Spark's sequence(1,0) runs DESCENDING — an
    * unguarded generator would fabricate pairs and hit index 0); counts
    * are exact integers and the top-30 is a bounded heap
    * (TakeOrderedAndProject), tie-broken by (a, b) for a deterministic
    * cut. Scale: one two-phase count on (a, b) — pair cardinality is
    * vocabulary², far below corpus size; the generator adds no exchange.
    */
  val qBpePairCounts = Q(
    "q_bpe_pair_counts",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(split(col("text"), " ").as("toks"))
        .select(explode(expr(
          "CASE WHEN size(toks) >= 2 THEN " +
            "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS a, " +
            "element_at(toks, i + 1) AS b)) " +
            "ELSE array() END")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .where(col("a") =!= "" && col("b") =!= "")
        .groupBy("a", "b")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(30),
    Some("""WITH d AS (SELECT string_split(text, ' ') AS toks
                       FROM documents),
             p AS (SELECT toks[CAST(t.i AS INT)] AS a,
                          toks[CAST(t.i AS INT) + 1] AS b
                   FROM d, unnest(range(1, len(toks))) AS t(i))
            SELECT a, b, count(*) AS n
            FROM p WHERE a <> '' AND b <> ''
            GROUP BY a, b
            ORDER BY n DESC, a, b LIMIT 30"""))

  /** BPE merge APPLICATION — the tokenizer-encode step every training
    * pipeline actually runs per document (q_bpe_pair_counts is the
    * training counter; this is the other half): the top-20 merge rules
    * by corpus pair frequency are applied to each sampled document's
    * token sequence IN RANK ORDER, one greedy left-to-right pass per
    * rule. Sequences ride as bracket-delimited strings (`[a][b][c]`) so
    * a rule application is a plain non-overlapping string `replace` of
    * `[a][b]` with `[ab]` — adjacent occurrences share no delimiter, so
    * left-to-right replace ≡ BPE's leftmost-first greedy merge for each
    * rule, and the whole fold is `aggregate(merges, s, replace)` — a
    * codegen'd per-row projection. One-pass-per-rank is the standard
    * fast-encode semantics (rules reference base tokens; a merged token
    * only re-matches when a LATER rule names its concatenated surface
    * form — deterministic, mirrored exactly in the oracle's
    * list_reduce). Emits (doc_id, n_before, n_after, encoded) — all
    * scalar (OutputShapeSpec doctrine). Scale: the merge table is a
    * bounded top-k (one TakeOrdered), collected into ONE array row and
    * broadcast-crossed to the sample — encoding itself is zero-shuffle
    * row-local string work, embarrassingly parallel at 100 TB; real
    * tokenizers cap rule count (32k–100k), which rides the same
    * broadcast (a few MB).
    */
  /** The encode fold: apply a rank-ordered `'a|b'` merge-rule array
    * column to a bracket-delimited token string column, one
    * non-overlapping left-to-right `replace` pass per rule. Exposed for
    * the R12 spec's semantics pins (adjacent-run greediness, rank-order
    * chaining).
    */
  private[graft] def bpeFold(s0Col: String, mergesCol: String) = expr(
    s"aggregate($mergesCol, $s0Col, (acc, mm) -> replace(acc, " +
      "concat('[', replace(mm, '|', ']['), ']'), " +
      "concat('[', replace(mm, '|', ''), ']')))")

  val qBpeEncode = Q(
    "q_bpe_encode",
    (s, dir) => {
      val toksDf = Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t != '')").as("toks"))
      val pairs = toksDf
        .select(explode(expr(
          "CASE WHEN size(toks) >= 2 THEN " +
            "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS a, " +
            "element_at(toks, i + 1) AS b)) " +
            "ELSE array() END")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(20)
      // rank-ordered rule list as ONE broadcastable array row: sort by
      // (-n, a, b) via struct array_sort, keep 'a|b' (corpus is
      // delimiter-free; see the oracle's identical encoding)
      val merges = pairs
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(-n AS negn, a, b, concat(a, '|', b) AS m))), " +
          "x -> x.m)").as("merges"))
      toksDf.where(col("doc_id") < 100 && size(col("toks")) > 0)
        .crossJoin(broadcast(merges))
        .withColumn("s0",
          concat(lit("["), array_join(col("toks"), "]["), lit("]")))
        .withColumn("e", bpeFold("s0", "merges"))
        .select(col("doc_id"),
          size(col("toks")).cast(org.apache.spark.sql.types.LongType)
            .as("n_before"),
          (length(col("e")) - length(expr("replace(e, ']', '')")))
            .cast(org.apache.spark.sql.types.LongType).as("n_after"),
          expr("trim(BOTH '[]' FROM replace(e, '][', ' '))").as("encoded"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
                    list_filter(string_split(text, ' '), t -> t <> '')
                      AS toks
                  FROM documents),
             p AS (SELECT toks[CAST(t.i AS INT)] AS a,
                          toks[CAST(t.i AS INT) + 1] AS b
                   FROM d, unnest(range(1, len(toks))) AS t(i)),
             pc AS (SELECT a, b, count(*) AS n FROM p
                    GROUP BY a, b ORDER BY n DESC, a, b LIMIT 20),
             m AS (SELECT list(a || '|' || b ORDER BY n DESC, a, b)
                     AS merges FROM pc),
             enc AS (SELECT doc_id, len(toks) AS n_before,
                       list_reduce(
                         list_prepend(
                           '[' || array_to_string(toks, '][') || ']',
                           merges),
                         (acc, mm) -> replace(acc,
                            '[' || replace(mm, '|', '][') || ']',
                            '[' || replace(mm, '|', '') || ']')) AS e
                     FROM d, m WHERE doc_id < 100 AND len(toks) > 0)
            SELECT doc_id, CAST(n_before AS BIGINT) AS n_before,
                   CAST(length(e) - length(replace(e, ']', ''))
                        AS BIGINT) AS n_after,
                   trim(replace(e, '][', ' '), '[]') AS encoded
            FROM enc ORDER BY doc_id"""))

  /** Iterative BPE TRAINING — the true multi-round trainer (the loop
    * q_bpe_pair_counts is one iteration of, and whose output
    * q_bpe_encode consumes): each round recounts adjacent pairs over the
    * CURRENT tokenization corpus-wide, picks THE most frequent pair
    * (n desc, a, b — deterministic), merges it everywhere, repeats.
    * 3 rounds; emits the learned merge table (round, a, b, n). The merge
    * rewrite is the same bracket-string replace fold as q_bpe_encode
    * (one rule per round), so round r's counts see round r-1's merged
    * tokens — the property a single-pass counter cannot have. Driver
    * loop: each round collects exactly ONE row (the argmax pair) to
    * parameterize the next round's plan — the same
    * iterative-parameterization posture as KMeans' centroids or Graph's
    * frontier probes, NOT a data collect; per-round lineage is cut with
    * localCheckpoint (Graph doctrine). Scale — DELTA COUNTING (the real-
    * tokenizer shape, r12 verdict #5): the pair-count table is
    * MATERIALIZED once up front and then maintained incrementally — each
    * round's argmax reads the bounded counts table (not the corpus), and
    * after a merge only the documents actually CONTAINING the merged
    * pair are re-paired; their old-vs-new pair-count diff is applied to
    * the counts table (subtract consumed (x,a)/(a,b)/(b,y), add the new
    * (x,ab)/(ab,y) — computed as a whole-document diff so overlapping
    * occurrences like 'a b a b' get exactly the left-to-right greedy
    * semantics of the rewrite itself, for free). Per-round shuffle cost
    * is thus proportional to the affected-document subset (which shrinks
    * as training consumes ever-rarer pairs), not the corpus; the one
    * remaining corpus-wide touch is a shuffle-free map-side contains()
    * screen. Oracle: the 3 rounds unrolled as CTEs, each full
    * recount/argmax/rewrite in SQL — delta maintenance must be
    * indistinguishable from recount, which is exactly what parity pins.
    */
  val qBpeTrain = Q(
    "q_bpe_train",
    (s, dir) => {
      val rounds = 3
      val pairGen =
        "CASE WHEN size(toks) >= 2 THEN " +
          "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS a, " +
          "element_at(toks, i + 1) AS b)) " +
          "ELSE array() END"
      def pairCounts(df: DataFrame): DataFrame =
        df.select(explode(expr(pairGen)).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n"))
      var toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t != '')").as("toks"))
        .localCheckpoint(true)
      // the ONE corpus-wide pair count; every later round maintains it
      // by affected-document diff instead of recounting
      var counts = pairCounts(toks).localCheckpoint(true)
      val learned = Seq.newBuilder[(Int, String, String, Long)]
      var exhausted = false
      for (r <- 1 to rounds if !exhausted) {
        val tops = counts
          .orderBy(col("n").desc, col("a"), col("b")).limit(1)
          .collect()
        // an empty/singleton-doc corpus has no adjacent pairs: training
        // simply stops early (the empty-day-partition robustness class)
        if (tops.isEmpty) exhausted = true
        else {
        val top = tops(0)
        val (a, b, n) = (top.getString(0), top.getString(1), top.getLong(2))
        learned += ((r, a, b, n))
        if (r < rounds) {
          val prevToks = toks
          val prevCounts = counts
          val bracket =
            concat(lit("["), array_join(col("toks"), "]["), lit("]"))
          // map-side screen: only documents CONTAINING the merged pair
          // change their pair multiset — everything else is untouched
          val hit = instr(bracket, s"[$a][$b]") > 0
          val affected = toks.where(hit)
          val merged = affected.select(col("doc_id"),
            split(btrim(replace(
              replace(bracket,
                lit(s"[$a][$b]"), lit(s"[$a$b]")),
              lit("]["), lit(" ")), lit("[]")), " ").as("toks"))
          val delta = pairCounts(affected)
            .select(col("a"), col("b"), col("n").as("n_old"))
            .join(pairCounts(merged)
              .select(col("a"), col("b"), col("n").as("n_new")),
              Seq("a", "b"), "full")
            .select(col("a"), col("b"),
              (coalesce(col("n_new"), lit(0L))
                - coalesce(col("n_old"), lit(0L))).as("d"))
            .where(col("d") =!= 0L)
          counts = counts.join(delta, Seq("a", "b"), "full")
            .select(col("a"), col("b"),
              (coalesce(col("n"), lit(0L)) + coalesce(col("d"), lit(0L)))
                .as("n"))
            .where(col("n") > 0L)
            .localCheckpoint(true)
          toks = toks.where(!hit).unionByName(merged)
            .localCheckpoint(true)
          Graph.release(prevToks)
          Graph.release(prevCounts)
        }
        }
      }
      val out = learned.result()
      s.createDataFrame(out).toDF("round", "a", "b", "n")
        .orderBy("round")
    },
    Some {
      val roundCtes = (1 to 3).map { r =>
        val prev = s"l${r - 1}"
        val base =
          s"""p$r AS (SELECT toks[CAST(t.i AS INT)] AS a,
                       toks[CAST(t.i AS INT) + 1] AS b
                     FROM $prev, unnest(range(1, len(toks))) AS t(i)),
             m$r AS (SELECT a, b, count(*) AS n FROM p$r
                     GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)"""
        if (r == 3) base
        else base + s""",
             l$r AS (SELECT doc_id,
                       string_split(trim(replace(
                         replace('[' || array_to_string(toks, '][') || ']',
                           (SELECT '[' || a || '][' || b || ']' FROM m$r),
                           (SELECT '[' || a || b || ']' FROM m$r)),
                         '][', ' '), '[]'), ' ') AS toks
                     FROM $prev)"""
      }.mkString(",\n")
      s"""WITH l0 AS (SELECT doc_id,
                    list_filter(string_split(text, ' '), t -> t <> '')
                      AS toks
                  FROM documents),
             $roundCtes
            SELECT 1 AS round, a, b, n FROM m1
            UNION ALL SELECT 2, a, b, n FROM m2
            UNION ALL SELECT 3, a, b, n FROM m3
            ORDER BY round"""
    })

  /** URL canonicalization + dedup — the crawl-frontier/dedup step every
    * web-corpus pipeline runs before fetching or keeping a page twice
    * under cosmetically different URLs: lowercase scheme+host, strip the
    * default :80 port, strip the trailing path slash, drop utm_*
    * tracking params, SORT the remaining query params. Messy variants
    * are synthesized deterministically from doc ids (case, port, slash,
    * param order and tracking noise all vary) and parsed back with the
    * same regexp groups in both engines; docs whose URLs collapse to one
    * canonical form are the duplicate group. Pure string ops → bit-exact.
    * Scale: canonicalization is a per-row projection (no shuffle); the
    * group-by is on the canonical key — the same hash-partition dedup
    * shape as q_dedup_exact_hash.
    */
  /** Adds `canonical` to a frame with a `url` column — the crawl-frontier
    * canonicalization q_url_canonical groups on, shared with
    * EdgeCaseSpec's pathological-URL pins (empty query string, duplicate
    * params, uppercase percent-escapes, bare root). Percent-escapes are
    * deliberately preserved VERBATIM: decoding can change path semantics
    * (%2F vs /), so a canonicalizer must never rewrite them.
    */
  def withUrlCanonical(df: DataFrame): DataFrame =
    df
      .withColumn("scheme",
        regexp_extract(col("url"), "^([a-zA-Z]+)://", 1))
      .withColumn("host",
        regexp_extract(col("url"), "^[a-zA-Z]+://([^/?]+)", 1))
      .withColumn("path",
        regexp_extract(col("url"), "^[a-zA-Z]+://[^/?]+([^?]*)", 1))
      .withColumn("query", regexp_extract(col("url"), "\\?(.*)$", 1))
      .withColumn("canonq", expr(
        "array_join(array_sort(filter(split(query, '&'), " +
          "x -> NOT startswith(x, 'utm_') AND x != '')), '&')"))
      .withColumn("canonical", concat(
        lower(col("scheme")), lit("://"),
        regexp_replace(lower(col("host")), ":80$", ""),
        expr("rtrim('/', path)"),
        expr("CASE WHEN canonq = '' THEN '' " +
          "ELSE concat('?', canonq) END")))

  val qUrlCanonical = Q(
    "q_url_canonical",
    (s, dir) => {
      val url =
        "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END, " +
          "'://', CASE WHEN doc_id % 5 = 0 THEN 'www.site' " +
          "ELSE 'WWW.Site' END, CAST(doc_id % 7 AS STRING), '.COM', " +
          "CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END, " +
          "'/p/', CAST(doc_id % 50 AS STRING), " +
          "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END, " +
          "CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=x' " +
          "ELSE '?a=1&b=2' END)"
      withUrlCanonical(Tables.documents(s, dir)
          .select(col("doc_id"), expr(url).as("url")))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_variants"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("canonical")
    },
    Some("""WITH u AS (SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
                  || '://'
                  || (CASE WHEN doc_id % 5 = 0 THEN 'www.site'
                           ELSE 'WWW.Site' END)
                  || CAST(doc_id % 7 AS VARCHAR) || '.COM'
                  || (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END)
                  || '/p/' || CAST(doc_id % 50 AS VARCHAR)
                  || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
                  || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=x'
                           ELSE '?a=1&b=2' END) AS url
                FROM documents),
             p AS (SELECT doc_id, url,
                     regexp_extract(url, '^([a-zA-Z]+)://', 1) AS scheme,
                     regexp_extract(url, '^[a-zA-Z]+://([^/?]+)', 1) AS host,
                     regexp_extract(url, '^[a-zA-Z]+://[^/?]+([^?]*)', 1)
                       AS path,
                     regexp_extract(url, '\?(.*)$', 1) AS query
                   FROM u),
             c AS (SELECT doc_id, url,
                     lower(scheme) || '://'
                     || regexp_replace(lower(host), ':80$', '')
                     || rtrim(path, '/')
                     || (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
                       AS canonical
                   FROM (SELECT *,
                           array_to_string(list_sort(list_filter(
                             string_split(query, '&'),
                             x -> NOT starts_with(x, 'utm_')
                                  AND x <> '')), '&') AS cq
                         FROM p))
            SELECT canonical, count(*) AS n_docs,
                   count(DISTINCT url) AS n_variants,
                   min(doc_id) AS min_doc
            FROM c GROUP BY canonical ORDER BY canonical"""))

  /** Per-vector array statistics — the embedding-health profile a vector
    * pipeline computes before indexing (zero-norm and degenerate vectors
    * break cosine; max-component spikes flag clipped encoders): L2 norm,
    * component mean, max component and its FIRST index, all per row via
    * HOFs — no explode, no shuffle. Determinism: both sums run through
    * vec_dot ≡ list_dot_product (the same sequential left-to-right IEEE
    * fold both engines — the proven FloatVecDot contract; the mean's sum
    * is a dot with a ones vector), max is exact float comparison and
    * first-index is the contract of array_position/list_position in both
    * engines. Scale: pure per-row projection over the vector scan.
    */
  val qArrayStats = Q(
    "q_array_stats",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      Tables.embeddings(s, dir)
        .withColumn("dim", size(col("embedding")))
        .withColumn("norm",
          sqrt(expr("vec_dot(embedding, embedding)")))
        .withColumn("mean",
          expr("vec_dot(embedding, " +
            "transform(embedding, x -> CAST(1.0 AS FLOAT)))") /
            col("dim").cast(DoubleType))
        .withColumn("vmax",
          array_max(col("embedding")).cast(DoubleType))
        .withColumn("amax_idx",
          expr("array_position(embedding, array_max(embedding))")
            .cast(IntegerType))
        .select("vec_id", "dim", "norm", "mean", "vmax", "amax_idx")
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
                   sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                     AS norm,
                   list_dot_product(CAST(embedding AS DOUBLE[]),
                     list_transform(embedding, x -> CAST(1.0 AS DOUBLE)))
                     / CAST(len(embedding) AS DOUBLE) AS mean,
                   CAST(list_aggregate(embedding, 'max') AS DOUBLE)
                     AS vmax,
                   CAST(list_position(embedding,
                     list_aggregate(embedding, 'max')) AS INT) AS amax_idx
            FROM embeddings ORDER BY vec_id"""))

  /** MULTINOMIAL NAIVE BAYES source classification — the classic
    * generative text classifier (McCallum/Nigam's event model) as an
    * in-plan train+score pipeline: the corpus hash-splits 80/20
    * (q_corpus_split determinism), per-class token counts + class priors
    * train on the 80, and each held-out doc is scored
    * ln P(c) + Σ_tok ln((c_tc+1)/(tot_c+V)) with add-1 smoothing,
    * predicted class = argmax. The algebraic key: the score decomposes
    * as ln P(c) − n_tok·ln(tot_c+V) + Σ ln(c_tc+1), and unseen tokens
    * contribute ln(0+1) = 0 — so the Σ runs over JOIN HITS ONLY (an
    * inner join on token, never a dense doc×vocab product). Every ln
    * output is Dec12-quantized (glibc/JVM last-ulp doctrine) and all
    * adds/multiplies stay exact DECIMAL, so the per-(doc, class) score
    * is EXACT and the argmax (score desc, class asc) is deterministic.
    * Scale: count tables are vocab×class-bounded aggregates; scoring is
    * one hash join on token + a broadcast class spine (20 classes);
    * the argmax window partitions BY DOC — millions of partitions, no
    * global window. Output: per-doc prediction vs actual + hit flag.
    */
  val qMlNaiveBayes = Q(
    "q_ml_naive_bayes",
    (s, dir) => {
      val Dec12 = org.apache.spark.sql.types.DecimalType(38, 12)
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"),
          (pmod(Det.pHash60(col("doc_id")), lit(100)) < 80).as("tr"),
          expr("CAST(size(filter(split(text, ' '), t -> t <> '')) " +
            "AS BIGINT)").as("n_tok"))
      val toks = docs.select(col("doc_id"), col("source"), col("tr"),
        explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
      // r21: the train-token explode used to be re-scanned by FOUR
      // independent aggregates (tc, cl, glob's vocab count, and hits'
      // join side). tc is vocab×class-bounded, so pin it once and
      // DERIVE the others: tot = Σc per class (same count of train
      // tokens), v = distinct tok over tc (distinct across classes),
      // ndocs = train docs with n_tok > 0 (a doc appears in the token
      // stream iff it has ≥1 non-empty token) — exact integer
      // identities, parity-checked. The corpus explode now runs once
      // for training counts and once for the test-side hits join.
      val tc = toks.where(col("tr")).groupBy("source", "tok")
        .agg(count(lit(1)).as("c"))
        .select(col("source").as("cls"), col("tok"), col("c"))
        .localCheckpoint(true)
      val cl = tc.groupBy("cls").agg(sum(col("c")).as("tot"))
        .join(docs.where(col("tr") && col("n_tok") > 0)
          .groupBy(col("source").as("cls"))
          .agg(count(lit(1)).as("ndocs")), Seq("cls"))
        .select(col("cls"), col("tot"), col("ndocs"))
      val glob = cl.agg(sum(col("ndocs")).as("n_train"))
        .crossJoin(tc.agg(countDistinct(col("tok")).as("v")))
      val hits = toks.where(!col("tr"))
        .join(tc.hint("shuffle_hash"), Seq("tok"))
        .groupBy("doc_id", "cls")
        .agg(sum(expr("CAST(ln(CAST(c + 1 AS DOUBLE)) AS DECIMAL(38,12))"))
          .cast(org.apache.spark.sql.types.DecimalType(30, 12))
          .as("shits"))
      docs.where(!col("tr"))
        .select(col("doc_id"), col("source").as("actual"), col("n_tok"))
        .crossJoin(broadcast(cl.crossJoin(glob)))
        .join(hits, Seq("doc_id", "cls"), "left")
        // Exact-decimal arithmetic under Spark's 38-digit cap: every
        // operand is sized so no product or sum needs >38 digits —
        // (6,0)×(20,12)=(27,12); (20,12)−(27,12)=(28,12);
        // +(30,12)=(31,12). A (38,12) operand anywhere would trip
        // Spark's precision-loss scale reduction (to s=11 on the add,
        // s=6 on the multiply) and silently diverge from DuckDB at
        // ~1e-11 — observed, not hypothetical.
        .select(col("doc_id"), col("actual"), col("cls"),
          (expr("CAST(ln(CAST(ndocs AS DOUBLE) / CAST(n_train AS DOUBLE))" +
            " AS DECIMAL(20,12))")
            - expr("CAST(n_tok AS DECIMAL(6,0)) * CAST(ln(CAST(tot AS " +
              "DOUBLE) + CAST(v AS DOUBLE)) AS DECIMAL(20,12))")
            + coalesce(col("shits"),
              lit(0).cast(org.apache.spark.sql.types.DecimalType(30, 12))))
            .cast(Dec12).as("score"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("cls"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("cls").as("predicted"), col("actual"),
          when(col("cls") === col("actual"), 1L).otherwise(0L).as("hit"),
          col("score").cast(DoubleType).as("score"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, source, text,
                    ((${Det.sqlPHash60("doc_id")}) % 100 + 100) % 100 < 80
                      AS tr,
                    CAST(len(list_filter(string_split(text, ' '),
                      t -> t <> '')) AS BIGINT) AS n_tok
                  FROM documents),
              tk AS (SELECT doc_id, source, tr, t.tok
                     FROM d, unnest(string_split(text, ' ')) AS t(tok)
                     WHERE t.tok <> ''),
              tc AS (SELECT source AS cls, tok, count(*) AS c
                     FROM tk WHERE tr GROUP BY 1, 2),
              cl AS (SELECT source AS cls, count(*) AS tot,
                       count(DISTINCT doc_id) AS ndocs
                     FROM tk WHERE tr GROUP BY 1),
              g AS (SELECT (SELECT CAST(sum(ndocs) AS BIGINT) FROM cl)
                       AS n_train,
                     (SELECT count(DISTINCT tok) FROM tk WHERE tr) AS v),
              hits AS (SELECT tk.doc_id, tc.cls,
                         CAST(sum(CAST(ln(CAST(tc.c + 1 AS DOUBLE))
                           AS DECIMAL(38,12))) AS DECIMAL(30,12)) AS shits
                       FROM tk JOIN tc ON tk.tok = tc.tok
                       WHERE NOT tk.tr GROUP BY 1, 2),
              sc AS (SELECT d.doc_id, d.source AS actual, cl.cls,
                       CAST(CAST(ln(CAST(cl.ndocs AS DOUBLE)
                           / CAST(g.n_train AS DOUBLE)) AS DECIMAL(20,12))
                         - CAST(d.n_tok AS DECIMAL(6,0))
                           * CAST(ln(CAST(cl.tot AS DOUBLE)
                           + CAST(g.v AS DOUBLE)) AS DECIMAL(20,12))
                         + COALESCE(hits.shits,
                             CAST(0 AS DECIMAL(30,12)))
                         AS DECIMAL(38,12)) AS score
                     FROM d CROSS JOIN cl CROSS JOIN g
                     LEFT JOIN hits ON hits.doc_id = d.doc_id
                       AND hits.cls = cl.cls
                     WHERE NOT d.tr),
              rk AS (SELECT doc_id, actual, cls, score,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, cls) AS rn
                     FROM sc)
            SELECT doc_id, cls AS predicted, actual,
                   CASE WHEN cls = actual THEN CAST(1 AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS hit,
                   CAST(score AS DOUBLE) AS score
            FROM rk WHERE rn = 1 ORDER BY doc_id"""))


  /** Macro/micro precision-recall-F1 from the lang-id confusion — the
    * per-class scorecard q_eval_lang_confusion's raw cells feed (cells
    * without the P/R/F reduction leave the classifier ungraded): per
    * TRUE class, tp / fp (via the prediction-column total) / fn, with
    * precision NULL when the class is never predicted (the honest
    * 0/0), F1 NULL when degenerate; macro-F1 Dec12-averages the
    * defined per-class F1s (§7.2 — a bare double sum over the class
    * table is order-dependent), micro-F1 over a single-label
    * classifier equals accuracy Σtp/N (stated, not hidden).
    * Abstentions surface as pred 'none' — they cost recall but are
    * excluded as a scored class. Scale: the cells grid is
    * |langs|²-bounded after one aggregate.
    */
  val qEvalF1 = Q(
    "q_eval_f1",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val pred = langIdPredictions(s, dir).select("doc_id", "pred_lang")
      val cells = docs.select("doc_id", "lang")
        .join(pred, Seq("doc_id"), "left")
        .select(col("lang").as("true_lang"),
          coalesce(col("pred_lang"), lit("none")).as("pred_lang"))
      val perTrue = cells.groupBy("true_lang")
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("true_lang") === col("pred_lang"), 1L)
            .otherwise(0L)).as("tp"))
      val perPred = cells.groupBy(col("pred_lang").as("true_lang"))
        .agg(count(lit(1)).as("n_pred"))
      val base = perTrue.join(perPred, Seq("true_lang"), "left")
        .select(col("true_lang").as("lang"), col("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("tp"))
        .withColumn("precision", expr(
          "CASE WHEN n_pred = 0 THEN NULL" +
            " ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END"))
        .withColumn("recall", expr(
          "CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)"))
        .withColumn("f1", expr(
          "CASE WHEN precision IS NULL" +
            " OR precision + recall = CAST(0 AS DOUBLE) THEN NULL" +
            " ELSE CAST(2 AS DOUBLE) * precision * recall" +
            " / (precision + recall) END"))
      val summ = base.agg(
        sum(expr("CAST(f1 AS DECIMAL(38,12))")).as("f1s"),
        sum(expr("CASE WHEN f1 IS NULL THEN 0 ELSE 1 END")).as("kc"),
        sum(col("tp")).as("tps"), sum(col("n_true")).as("nts"))
        .select(expr("CASE WHEN kc = 0 THEN NULL" +
          " ELSE CAST(f1s AS DOUBLE) / CAST(kc AS DOUBLE) END")
          .as("macro_f1"),
          expr("CAST(tps AS DOUBLE) / CAST(nts AS DOUBLE)")
            .as("micro_f1"))
      base.crossJoin(broadcast(summ))
        .select(col("lang"), col("n_true"), col("n_pred"), col("tp"),
          col("precision"), col("recall"), col("f1"),
          col("macro_f1"), col("micro_f1"))
        .orderBy("lang")
    },
    Some("""WITH tok AS (SELECT DISTINCT doc_id, tok
                  FROM (SELECT doc_id,
                          unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  WHERE tok <> ''),
             lt AS (SELECT lang, tok, count(*) AS n
                    FROM (SELECT lang,
                            unnest(string_split(text, ' ')) AS tok
                          FROM documents)
                    WHERE tok <> '' GROUP BY lang, tok),
             prof AS (SELECT lang AS profile_lang, tok
                      FROM (SELECT *, row_number() OVER (PARTITION BY lang
                              ORDER BY n DESC, tok) AS rk FROM lt)
                      WHERE rk <= 5),
             votes AS (SELECT t.doc_id, p.profile_lang, count(*) AS hits
                       FROM tok t JOIN prof p USING (tok)
                       GROUP BY t.doc_id, p.profile_lang),
             pred AS (SELECT doc_id, profile_lang AS pred_lang
                      FROM (SELECT *, row_number() OVER (
                              PARTITION BY doc_id
                              ORDER BY hits DESC, profile_lang) AS rk
                            FROM votes)
                      WHERE rk = 1),
             cells AS (SELECT d.lang AS true_lang,
                     coalesce(p.pred_lang, 'none') AS pred_lang
                   FROM documents d LEFT JOIN pred p USING (doc_id)),
             pt AS (SELECT true_lang, CAST(count(*) AS BIGINT) AS n_true,
                      CAST(sum(CASE WHEN true_lang = pred_lang THEN 1
                               ELSE 0 END) AS BIGINT) AS tp
                    FROM cells GROUP BY true_lang),
             pp AS (SELECT pred_lang AS true_lang,
                      CAST(count(*) AS BIGINT) AS n_pred
                    FROM cells GROUP BY pred_lang),
             base AS (SELECT pt.true_lang AS lang, n_true,
                     coalesce(n_pred, 0) AS n_pred, tp,
                     CASE WHEN coalesce(n_pred, 0) = 0 THEN NULL
                       ELSE CAST(tp AS DOUBLE)
                         / CAST(n_pred AS DOUBLE) END AS precision,
                     CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)
                       AS recall
                   FROM pt LEFT JOIN pp ON pt.true_lang = pp.true_lang),
             b2 AS (SELECT *,
                     CASE WHEN precision IS NULL
                       OR precision + recall = CAST(0 AS DOUBLE)
                       THEN NULL
                       ELSE CAST(2 AS DOUBLE) * precision * recall
                         / (precision + recall) END AS f1
                   FROM base),
             summ AS (SELECT
                     CASE WHEN sum(CASE WHEN f1 IS NULL THEN 0 ELSE 1
                                   END) = 0 THEN NULL
                       ELSE CAST(sum(CAST(f1 AS DECIMAL(38,12)))
                              AS DOUBLE)
                         / CAST(sum(CASE WHEN f1 IS NULL THEN 0 ELSE 1
                                    END) AS DOUBLE) END AS macro_f1,
                     CAST(sum(tp) AS DOUBLE)
                       / CAST(sum(n_true) AS DOUBLE) AS micro_f1
                   FROM b2)
            SELECT lang, n_true, n_pred, tp, precision, recall, f1,
                   macro_f1, micro_f1
            FROM b2, summ ORDER BY lang"""))

  /** Jensen–Shannon divergence per corpus source vs the REST of the
    * corpus — the symmetric, bounded drift measure LLM data work uses
    * where q_dq_drift_psi uses the banker's PSI (JSD is defined even
    * on disjoint supports and caps at ln 2): the full sources × vocab
    * grid (p = in-source unigram dist, q = rest-of-corpus dist,
    * m = their midpoint), cell terms ½p·ln(p/m) + ½q·ln(q/m) with
    * zero-mass sides contributing zero, Dec12-quantized before the
    * order-free per-source sum (§7.2 libm doctrine), normalized form
    * jsd/ln 2 round-6. Scale: vocab-keyed joins — the grid is
    * |sources|·|vocab|, vocabulary-bounded, never corpus-bounded.
    */
  val qTextJsd = Q(
    "q_text_jsd",
    (s, dir) => {
      val t = tokens(Tables.documents(s, dir), "source")
      val srcTok = t.groupBy("source", "tok")
        .agg(count(lit(1)).as("c_s"))
      val vocabTot = t.groupBy("tok").agg(count(lit(1)).as("c_t"))
      val srcTot = t.groupBy("source").agg(count(lit(1)).as("n_s"))
      val tot = t.agg(count(lit(1)).as("n"))
      val grid = vocabTot
        .crossJoin(broadcast(srcTot.select(col("source"), col("n_s"))))
        .join(srcTok, Seq("source", "tok"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_s"), col("n"),
          coalesce(col("c_s"), lit(0L)).as("c_s"), col("c_t"))
        .withColumn("p", expr(
          "CAST(c_s AS DOUBLE) / CAST(n_s AS DOUBLE)"))
        .withColumn("q", expr(
          "CAST(c_t - c_s AS DOUBLE) / CAST(n - n_s AS DOUBLE)"))
        .withColumn("m", expr(
          "(p + q) / CAST(2 AS DOUBLE)"))
        .withColumn("term", expr(
          "CAST((CASE WHEN p > CAST(0 AS DOUBLE)" +
            " THEN CAST(0.5 AS DOUBLE) * p * ln(p / m)" +
            " ELSE CAST(0 AS DOUBLE) END)" +
            " + (CASE WHEN q > CAST(0 AS DOUBLE)" +
            " THEN CAST(0.5 AS DOUBLE) * q * ln(q / m)" +
            " ELSE CAST(0 AS DOUBLE) END) AS DECIMAL(38,12))"))
      grid.groupBy("source")
        .agg(first(col("n_s")).as("n_tokens"),
          sum(col("term")).cast(DoubleType).as("jsd_nats"))
        .select(col("source"), col("n_tokens"), col("jsd_nats"),
          expr("round(jsd_nats" +
            " / CAST(0.6931471805599453 AS DOUBLE), 6)").as("jsd_norm"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT source, tok
                  FROM (SELECT source,
                          unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  WHERE tok <> ''),
             st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c_s
                    FROM t GROUP BY source, tok),
             vt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_t
                    FROM t GROUP BY tok),
             ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
                    FROM t GROUP BY source),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
             grid AS (SELECT ns.source, ns.n_s, tot.n,
                     coalesce(st.c_s, 0) AS c_s, vt.c_t
                   FROM vt CROSS JOIN ns
                   LEFT JOIN st ON st.source = ns.source
                     AND st.tok = vt.tok
                   CROSS JOIN tot),
             cells AS (SELECT source, n_s,
                     CAST(c_s AS DOUBLE) / CAST(n_s AS DOUBLE) AS p,
                     CAST(c_t - c_s AS DOUBLE)
                       / CAST(n - n_s AS DOUBLE) AS q
                   FROM grid),
             terms AS (SELECT source, n_s,
                     CAST((CASE WHEN p > CAST(0 AS DOUBLE)
                        THEN CAST(0.5 AS DOUBLE) * p
                          * ln(p / ((p + q) / CAST(2 AS DOUBLE)))
                        ELSE CAST(0 AS DOUBLE) END)
                      + (CASE WHEN q > CAST(0 AS DOUBLE)
                        THEN CAST(0.5 AS DOUBLE) * q
                          * ln(q / ((p + q) / CAST(2 AS DOUBLE)))
                        ELSE CAST(0 AS DOUBLE) END) AS DECIMAL(38,12))
                       AS term
                   FROM cells)
            SELECT source, CAST(first(n_s) AS BIGINT) AS n_tokens,
                   CAST(sum(term) AS DOUBLE) AS jsd_nats,
                   round(CAST(sum(term) AS DOUBLE)
                     / CAST(0.6931471805599453 AS DOUBLE), 6) AS jsd_norm
            FROM terms GROUP BY source ORDER BY source"""))

  /** Heaps' law fit — the vocabulary-growth curve V(n) ≈ K·n^β that
    * sizes tokenizer vocabularies and dedup hash tables before a
    * crawl is ingested. The unit is the 3-gram SHINGLE, not the raw
    * token: the synthetic corpus draws words from a CLOSED ~31-word
    * vocabulary (token-level V saturates in the first checkpoint and
    * the fit collapses to β = 0 — measured, not assumed), while the
    * shingle space genuinely grows with the corpus, which is also the
    * unit the dedup family's hash tables are sized in. 32 checkpoints
    * along the doc_id axis, V_i = shingles whose FIRST occurrence
    * (min doc_id — a vocab-keyed aggregate) lands at or before the
    * checkpoint, n_i = cumulative shingle count; the log-log OLS over
    * the ≤32 points rides Dec12-quantized ln moments (§7.2),
    * K = exp(intercept) and β round-6 (libm finals). Scale:
    * first-occurrence is one vocab-keyed aggregate, checkpoint
    * censuses are a broadcast-32 conditional fan-out of BOUNDED
    * per-doc/per-shingle stats — no corpus-axis window anywhere (the
    * prefix-sum trap).
    */
  val qTextHeapsLaw = Q(
    "q_text_heaps_law",
    (s, dir) => {
      val t = shinglesWithPos(Tables.documents(s, dir))
        .select(col("doc_id"), col("shingle"))
      val fd = t.groupBy("shingle").agg(min(col("doc_id")).as("fd"))
      val dl = t.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val mx = Tables.documents(s, dir).agg(max(col("doc_id")).as("mx"))
      val chk = s.range(32).select(col("id").cast("int").as("i"))
        .crossJoin(broadcast(mx))
        .select(col("i"),
          expr("CAST(i + 1 AS BIGINT) * mx DIV 32").as("chk"))
      val v = fd.crossJoin(broadcast(chk))
        .where(col("fd") <= col("chk"))
        .groupBy("i", "chk").agg(count(lit(1)).as("v_cum"))
      val n = dl.crossJoin(broadcast(chk))
        .where(col("doc_id") <= col("chk"))
        .groupBy("i").agg(sum(col("len")).as("n_cum"))
      val pts = v.join(n, "i")
        .where(col("n_cum") > 0 && col("v_cum") > 0)
        .withColumn("x", expr("ln(CAST(n_cum AS DOUBLE))"))
        .withColumn("y", expr("ln(CAST(v_cum AS DOUBLE))"))
      val fit = pts.agg(count(lit(1)).as("k"),
          sum(expr("CAST(x AS DECIMAL(38,12))")).as("sx"),
          sum(expr("CAST(y AS DECIMAL(38,12))")).as("sy"),
          sum(expr("CAST(x * y AS DECIMAL(38,12))")).as("sxy"),
          sum(expr("CAST(x * x AS DECIMAL(38,12))")).as("sxx"))
        .select(col("k"),
          expr("(CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
            " / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))").as("beta_raw"))
          .crossJoin(broadcast(pts.agg(
            sum(expr("CAST(y AS DECIMAL(38,12))")).as("sy2"),
            sum(expr("CAST(x AS DECIMAL(38,12))")).as("sx2"),
            count(lit(1)).as("k2"))))
        .select(
          expr("round(beta_raw, 6)").as("beta"),
          expr("round(exp((CAST(sy2 AS DOUBLE) - beta_raw" +
            " * CAST(sx2 AS DOUBLE)) / CAST(k2 AS DOUBLE)), 6)")
            .as("k_coef"))
      pts.select(col("i"), col("chk"), col("n_cum"), col("v_cum"))
        .crossJoin(broadcast(fit))
        .orderBy("i")
    },
    Some("""WITH t AS (SELECT doc_id,
                    unnest([array_to_string(toks[i:i+2], ' ')
                            FOR i IN range(1, greatest(len(toks)-1, 1))])
                      AS shingle
                  FROM (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents
                        WHERE len(string_split(text, ' ')) >= 3)),
             fd AS (SELECT shingle, min(doc_id) AS fd
                    FROM t GROUP BY shingle),
             dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
                    FROM t GROUP BY doc_id),
             mx AS (SELECT max(doc_id) AS mx FROM documents),
             chk AS (SELECT CAST(i AS INTEGER) AS i,
                       (CAST(i + 1 AS BIGINT) * mx) // 32 AS chk
                     FROM range(32) r(i), mx),
             v AS (SELECT i, chk, CAST(count(*) AS BIGINT) AS v_cum
                   FROM fd, chk WHERE fd <= chk GROUP BY i, chk),
             n AS (SELECT i, CAST(sum(len) AS BIGINT) AS n_cum
                   FROM dl, chk WHERE doc_id <= chk GROUP BY i),
             pts AS (SELECT v.i, chk, n_cum, v_cum,
                       ln(CAST(n_cum AS DOUBLE)) AS x,
                       ln(CAST(v_cum AS DOUBLE)) AS y
                     FROM v JOIN n ON v.i = n.i
                     WHERE n_cum > 0 AND v_cum > 0),
             fit AS (SELECT
                     (CAST(count(*) AS DOUBLE)
                        * CAST(sum(CAST(x * y AS DECIMAL(38,12)))
                          AS DOUBLE)
                      - CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                        * CAST(sum(CAST(y AS DECIMAL(38,12)))
                          AS DOUBLE))
                     / (CAST(count(*) AS DOUBLE)
                        * CAST(sum(CAST(x * x AS DECIMAL(38,12)))
                          AS DOUBLE)
                      - CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                        * CAST(sum(CAST(x AS DECIMAL(38,12)))
                          AS DOUBLE)) AS beta_raw,
                     CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE)
                       AS syd,
                     CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
                       AS sxd,
                     CAST(count(*) AS DOUBLE) AS kd
                   FROM pts)
            SELECT i, chk, n_cum, v_cum,
                   round(beta_raw, 6) AS beta,
                   round(exp((syd - beta_raw * sxd) / kd), 6) AS k_coef
            FROM pts, fit ORDER BY i"""))

  /** ColBERT-style MaxSim late interaction — multi-vector retrieval
    * scoring (a query is a SET of vectors; a doc is a SET of vectors;
    * score = Σ over query vectors of the best-matching doc vector):
    * probe set = vec_ids 0–7, "documents" = 16-vector groups of the
    * embeddings table, cosine through the codegen FloatVecDot with the
    * round-6 last-ulp fence, per-(doc, probe) max then a Dec12-exact
    * sum of the 8 round-6 maxima (order-free), top-10 docs. The
    * per-probe max is what distinguishes late interaction from
    * single-vector cosine: a doc scores on its best LOCAL match per
    * query facet, not a pooled average. Scale: probes broadcast
    * (8 rows); the scan is ONE pass over vectors with map-combining
    * (g, probe) maxima — no doc-side materialized vector sets.
    */
  val qSimMaxsim = Q(
    "q_sim_maxsim",
    (s, dir) => {
      graft.plans.VectorFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
        .withColumn("ns", expr("vec_dot(embedding, embedding)"))
      val probes = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("probe_id"),
          col("embedding").as("pvec"), col("ns").as("pns"))
      val docs = emb.where(col("vec_id") >= 16)
        .select(expr("vec_id DIV 16").as("g"), col("vec_id"),
          col("embedding"), col("ns"))
      val best = docs.crossJoin(broadcast(probes))
        .withColumn("score", round(
          expr("vec_dot(pvec, embedding)") /
            (sqrt(col("pns")) * sqrt(col("ns"))), 6))
        .groupBy("g", "probe_id")
        .agg(max(col("score")).as("best"))
      val sizes = docs.groupBy("g").agg(count(lit(1)).as("n_vecs"))
      best.groupBy("g")
        .agg(sum(expr("CAST(best AS DECIMAL(38,12))"))
          .cast(org.apache.spark.sql.types.DoubleType).as("maxsim"))
        // no broadcast hint: sizes is one row per 16-vector group —
        // corpus/16 rows, which GROWS with the corpus (caught by the
        // r15 forced-broadcast lint); the equi-join on g lets AQE pick
        .join(sizes, "g")
        .orderBy(col("maxsim").desc, col("g"))
        .limit(10)
        .select(col("g").as("doc_group"), col("n_vecs"), col("maxsim"))
    },
    Some("""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pvec
                  FROM embeddings WHERE vec_id < 8),
             docs AS (SELECT vec_id // 16 AS g, vec_id, embedding
                      FROM embeddings WHERE vec_id >= 16),
             best AS (SELECT g, probe_id,
                     max(round(list_cosine_similarity(
                       CAST(pvec AS DOUBLE[]),
                       CAST(embedding AS DOUBLE[])), 6)) AS best
                   FROM docs CROSS JOIN probes
                   GROUP BY g, probe_id),
             sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n_vecs
                    FROM docs GROUP BY g),
             sc AS (SELECT g,
                     CAST(sum(CAST(best AS DECIMAL(38,12))) AS DOUBLE)
                       AS maxsim
                   FROM best GROUP BY g)
            SELECT sc.g AS doc_group, n_vecs, maxsim
            FROM sc JOIN sz ON sc.g = sz.g
            ORDER BY maxsim DESC, sc.g LIMIT 10"""))

  /** Content-defined chunking (CDC) dedup census — the PARTIAL-dup
    * detector byte-level pipelines (rsync/LBFS/backup dedup, and
    * training-data near-dup at sub-document granularity) build on:
    * chunk boundaries where a rolling 8-char window's portable hash
    * ≡ 0 (mod 64) — boundaries move WITH content, so an insertion
    * early in a doc re-chunks only its neighborhood, unlike
    * fixed-width blocks where one shift invalidates every block
    * after it (the property that makes CDC the right unit for
    * incremental dedup). Chunks assemble DOC-LOCALLY: the boundary
    * positions are a per-row array (`filter` over the position
    * sequence), each start is zipped with its successor (last chunk
    * ends at len+1), and the chunk hash is cut map-side inside the
    * array transform — NO exchange ever carries the `text` column
    * (the r15 window formulation shipped ~len/64 full-text rows per
    * doc through a hash exchange = O(len²/64) shuffle bytes; this
    * plan's first exchange is the chunk-hash aggregate over
    * (doc_id, ch, clen) rows). Identity = md5(chunk), census = how
    * much chunk mass is SHARED across ≥2 docs. Expected chunk length
    * ≈ 64 chars (the modulus — a visible policy knob). Scale: the
    * array fan-out is O(total chars) — the same order as reading the
    * corpus — all of it inside one map stage; the census shuffles on
    * the chunk hash, vocabulary-style.
    */
  val qDedupCdcChunks = Q(
    "q_dedup_cdc_chunks",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // Rows leaving the map stage are (doc_id, ch, clen): the text
      // column never enters an exchange, and per-doc work is O(len·8);
      // chunk identity stays md5 (collision-free width), one md5 per
      // CHUNK ≈ len/64, not per position.
      // r21: the per-doc boundary+md5 pipeline (formerly a lambda-let
      // expr() chain over split/ascii/filter/zip_with) is the native
      // kernel graft.plans.CdcChunks (same boundary rule, same per-chunk
      // md5 bytes, same clen — value-identical by construction, pinned
      // against the old expr() formulation by R21OptSpec). The
      // interpreted HOF chain built ~6 intermediate arrays per doc and
      // was 5-10 s of the ×50 long-doc axis; the kernel walks the
      // UTF-8 bytes once per doc.
      graft.plans.VectorFunctions.register(s)
      val chunks = docs
        .select(col("doc_id"), explode(expr("cdc_chunks(text)")).as("c"))
        .select(col("doc_id"), col("c.ch").as("ch"),
          col("c.clen").as("clen"))
      val perChunk = chunks.groupBy("ch")
        .agg(countDistinct(col("doc_id")).as("nd"),
          count(lit(1)).as("occ"), first(col("clen")).as("clen"))
      perChunk.agg(
          sum(col("occ")).as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"),
          sum(when(col("nd") >= 2, col("occ")).otherwise(0L))
            .as("shared_occ"),
          sum(col("clen") * col("occ")).as("total_chars"),
          sum(when(col("nd") >= 2, col("clen") * col("occ"))
            .otherwise(0L)).as("shared_chars"))
        .select(col("n_chunks"), col("n_distinct"), col("n_shared"),
          col("shared_occ"),
          expr("round(CAST(shared_chars AS DOUBLE)" +
            " / CAST(total_chars AS DOUBLE), 6)").as("shared_char_ratio"))
    },
    Some {
      val h = graft.Det.sqlRollAt("text", "i", 8)
      s"""WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, greatest(len(text) - 6, 2))) AS i
                  FROM documents),
             st AS (SELECT doc_id, text, CAST(i AS INTEGER) AS st
                    FROM pos
                    WHERE i = 1 OR ($h) % 64 = 0),
             ck AS (SELECT doc_id,
                     md5(substr(text, st,
                       CAST(coalesce(lead(st, 1) OVER (
                         PARTITION BY doc_id ORDER BY st),
                         len(text) + 1) - st AS INTEGER))) AS ch,
                     CAST(coalesce(lead(st, 1) OVER (
                       PARTITION BY doc_id ORDER BY st),
                       len(text) + 1) - st AS BIGINT) AS clen
                   FROM st),
             pc AS (SELECT ch,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS nd,
                     CAST(count(*) AS BIGINT) AS occ,
                     CAST(first(clen) AS BIGINT) AS clen
                   FROM ck GROUP BY ch)
            SELECT CAST(sum(occ) AS BIGINT) AS n_chunks,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_shared,
                   CAST(sum(CASE WHEN nd >= 2 THEN occ ELSE 0 END)
                     AS BIGINT) AS shared_occ,
                   round(CAST(sum(CASE WHEN nd >= 2 THEN clen * occ
                              ELSE 0 END) AS DOUBLE)
                     / CAST(sum(clen * occ) AS DOUBLE), 6)
                     AS shared_char_ratio
            FROM pc"""
    })

  /** Winnowing fingerprints (the MOSS local-minimum scheme) — the
    * GUARANTEED-coverage dedup signature between full-shingle Jaccard
    * (exact, heavy) and MinHash (probabilistic): within every window
    * of w = 4 consecutive 8-gram hashes, keep the minimum (ties to the
    * leftmost position — a documented deterministic choice); the
    * winnowing theorem guarantees any shared substring of length
    * ≥ w + k − 1 = 11 chars yields at least one shared fingerprint.
    * The fingerprint set is a PURE PER-DOCUMENT function, so it is
    * computed doc-locally: the 8-gram hash array is built once with
    * `transform(sequence(...))` as (h, i) structs, each window minimum
    * is `array_min(slice(hs, j, 4))` (struct ordering = (h, i), the
    * leftmost-tie rule), `array_distinct` collapses repeats — ZERO
    * exchanges before the df-capped postings aggregate (the r15
    * formulation shuffled ~24 B × every corpus character through an
    * Exchange+Sort for the same minima and was the suite's slowest
    * query). Fingerprint postings are df-capped at 50 like the LSH
    * buckets (a fingerprint every doc shares is boilerplate, not
    * evidence — the identical cap is in the oracle so parity is exact
    * by construction). Output: top-20 doc pairs by shared-fingerprint
    * count. Scale: O(chars) array work inside one map stage, the
    * postings join is capped-bucket-bounded.
    */
  val qTextWinnowing = Q(
    "q_text_winnowing",
    (s, dir) => {
      // r21: the per-doc fingerprint set (8-gram rolling hashes →
      // w = 4 window minima by (h, leftmost i) → distinct) is the native
      // single-pass kernel graft.plans.WinnowFingerprints — the same
      // Det.sparkRollAt base-131 mod 2³¹−1 arithmetic and the same
      // struct-least tiebreak, value-identical as a SET (pinned against
      // the old expr() formulation by R21OptSpec; element order is
      // immaterial — the column explodes into set-keyed aggregation).
      // The replaced lambda-let chain (split/ascii → (h,i) structs →
      // least over 4 try_element_ats → array_distinct) was interpreted
      // per position and built ~6 arrays per doc: 52-67 s of the ×50
      // long-doc axis, the suite's slowest single stage.
      graft.plans.VectorFunctions.register(s)
      val fps = Tables.documents(s, dir)
        .select(col("doc_id"), explode(expr("winnow_fps(text)")).as("fp"))
        // ONE fp-keyed exchange of the small (doc_id, fp) rows, reused
        // by all four consumers below (df-cap build + both self-join
        // sides). Without it the map-side fingerprint pipeline — the
        // expensive part — is recomputed per consumer: a pure-map plan
        // has no exchange boundary for Spark's ReusedExchange to dedup
        // on (measured 2× the window plan at sf0.1). Shuffled bytes
        // stay ~0.4 fingerprints/char × 16 B — far below the window
        // plan's every-position rows, and linear in corpus size.
        .repartition(col("fp"))
      val dfc = fps.groupBy("fp").agg(count(lit(1)).as("df"))
        .where(col("df") <= 50)
      val posted = fps.join(dfc.select("fp"), "fp")
      posted.toDF("fp", "a")
        .join(posted.toDF("fp2", "b"),
          col("fp") === col("fp2") && col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("a"), col("b"))
        .limit(20)
    },
    Some {
      val h = graft.Det.sqlRollAt("text", "i", 8)
      s"""WITH pos AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
                    ($h) AS h
                  FROM (SELECT doc_id, text,
                          unnest(range(1, greatest(len(text) - 6, 2)))
                            AS i
                        FROM documents)),
             fw AS (SELECT doc_id,
                     min({'h': h, 'i': i}) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn
                   FROM pos),
             fps AS (SELECT DISTINCT doc_id, (mn).h AS fp FROM fw),
             dfc AS (SELECT fp FROM fps GROUP BY fp
                     HAVING count(*) <= 50),
             posted AS (SELECT fps.doc_id, fps.fp
                        FROM fps JOIN dfc ON fps.fp = dfc.fp)
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM posted x JOIN posted y
              ON x.fp = y.fp AND x.doc_id < y.doc_id
            GROUP BY 1, 2
            ORDER BY n_shared DESC, a, b LIMIT 20"""
    })

  /** Importance-resampling plan for domain rebalancing — the mixture
    * correction every pre-training run makes (the crawl's source mix
    * is never the target mix): per-source weight = target share
    * (uniform here — an explicit policy input) over observed TOKEN
    * share, expected post-resample token mass, and the effective
    * sample size ESS = (Σw)²/Σw² over DOCS — the diagnostic that says
    * how much of the corpus the reweighting actually keeps (ESS ≈ N
    * harmless, ESS ≪ N the weights are fighting the data). Exact
    * integer censuses; weights and ESS are shared-text finals with
    * Dec12 sums over the doc frame. Scale: two map-combining
    * aggregates + a bounded source-grid broadcast.
    */
  val qCorpusImportanceResample = Q(
    "q_corpus_importance_resample",
    (s, dir) => {
      val t = tokens(Tables.documents(s, dir), "source")
      val bySrc = t.groupBy("source").agg(count(lit(1)).as("n_tok"))
      val tot = bySrc.agg(sum(col("n_tok")).as("n"),
        count(lit(1)).as("k"))
      val wts = bySrc.crossJoin(broadcast(tot))
        .withColumn("share", expr(
          "CAST(n_tok AS DOUBLE) / CAST(n AS DOUBLE)"))
        .withColumn("w", expr(
          "(CAST(1 AS DOUBLE) / CAST(k AS DOUBLE)) / share"))
      val docW = Tables.documents(s, dir).select("doc_id", "source")
        .join(broadcast(wts.select("source", "w")), "source")
      val ess = docW.agg(
          sum(expr("CAST(w AS DECIMAL(38,12))")).as("sw"),
          sum(expr("CAST(w * w AS DECIMAL(38,12))")).as("sww"),
          count(lit(1)).as("n_docs"))
        .select(col("n_docs"),
          expr("round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)" +
            " / CAST(sww AS DOUBLE), 6)").as("ess"))
      wts.crossJoin(broadcast(ess))
        .select(col("source"), col("n_tok"),
          expr("round(share, 6)").as("share"),
          expr("round(w, 6)").as("weight"),
          expr("CAST(round(CAST(n_tok AS DOUBLE) * w, 0) AS BIGINT)")
            .as("expected_tokens"),
          col("n_docs"), col("ess"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT source, tok
                  FROM (SELECT source,
                          unnest(string_split(text, ' ')) AS tok
                        FROM documents)
                  WHERE tok <> ''),
             bs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tok
                    FROM t GROUP BY source),
             tt AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n,
                      CAST(count(*) AS BIGINT) AS k FROM bs),
             wts AS (SELECT source, n_tok,
                     CAST(n_tok AS DOUBLE) / CAST(n AS DOUBLE) AS share,
                     (CAST(1 AS DOUBLE) / CAST(k AS DOUBLE))
                       / (CAST(n_tok AS DOUBLE) / CAST(n AS DOUBLE))
                       AS w
                   FROM bs, tt),
             dw AS (SELECT d.doc_id, wts.w
                    FROM documents d JOIN wts ON d.source = wts.source),
             ess AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     round(CAST(sum(CAST(w AS DECIMAL(38,12)))
                         AS DOUBLE)
                       * CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE)
                       / CAST(sum(CAST(w * w AS DECIMAL(38,12)))
                         AS DOUBLE), 6) AS ess
                   FROM dw)
            SELECT source, n_tok, round(share, 6) AS share,
                   round(w, 6) AS weight,
                   CAST(round(CAST(n_tok AS DOUBLE) * w, 0) AS BIGINT)
                     AS expected_tokens,
                   n_docs, ess
            FROM wts, ess ORDER BY source"""))

  /** Cross-source n-gram overlap matrix — the corpus CONTAMINATION MAP
    * (q_contamination checks one train/test split; this scores every
    * source pair, the audit a mixture designer runs before weighting
    * sources that might be mirrors of each other): distinct (source,
    * 3-shingle) sets — the source column carried THROUGH the generator
    * (de-join doctrine, r14 verdict), never re-joined — then a
    * shingle-keyed self-join produces pair co-occurrence counts and
    * J = c/(n_a+n_b−c) per unordered pair. Scale: the self-join fanout
    * per shingle is bounded by sources² (≤400 here), NOT by corpus
    * size — a shared shingle contributes one row per source pair, so
    * the pair table is |distinct shingles|·O(k²) worst-case and the
    * output is the k(k−1)/2 matrix. */
  val qTextSourceOverlap = Q(
    "q_text_source_overlap",
    (s, dir) => {
      // r21: shingles ride xxhash64 through the distinct and the
      // self-join (the q_dedup_jaccard_pairs / q_text_boilerplate byte
      // trade, same ~n²/2⁶⁴ collision acceptance — the oracle stays on
      // raw strings): the ShingleXxh64Set kernel replaces the
      // interpreted per-position transform, and the cross-doc distinct
      // + the shingle-keyed self-join now move 8-byte longs instead of
      // ~25-byte strings. The distinct here is SOURCE-level (shingles
      // shared across a source's docs), so the exchange remains — only
      // its payload shrinks.
      graft.plans.VectorFunctions.register(s)
      val sh = Tables.documents(s, dir)
        .select(col("source"), explode(
          expr("shingle_xxh64_set(split(text, ' '))")).as("shingle"))
        .distinct()
      val n = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
      val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("common"))
      // no broadcast hint: the margin table is one row per distinct
      // source — small here but NOT bounded by construction (a crawl
      // corpus can have millions of domains), so the r11 lint applies;
      // the pair matrix is k² rows, the join is cheap either way
      pairs
        .join(n.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n_sh", "n_a"), Seq("src_a"))
        .join(n.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n_sh", "n_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("common"),
          expr("round(CAST(common AS DOUBLE)" +
            " / CAST(n_a + n_b - common AS DOUBLE), 6)").as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH d AS (SELECT source, string_split(text, ' ') AS toks
                  FROM documents
                  WHERE len(string_split(text, ' ')) >= 3),
             sh AS (SELECT DISTINCT source, shingle
                    FROM (SELECT source,
                            unnest([array_to_string(toks[i:i+2], ' ')
                                    FOR i IN range(1,
                                      greatest(len(toks) - 1, 1))])
                              AS shingle
                          FROM d)),
             n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh
                   FROM sh GROUP BY source),
             pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                         CAST(count(*) AS BIGINT) AS common
                       FROM sh a JOIN sh b
                         ON a.shingle = b.shingle
                         AND a.source < b.source
                       GROUP BY 1, 2)
            SELECT src_a, src_b,
                   na.n_sh AS n_a, nb.n_sh AS n_b, common,
                   round(CAST(common AS DOUBLE)
                     / CAST(na.n_sh + nb.n_sh - common AS DOUBLE), 6)
                     AS jaccard
            FROM pairs
            JOIN n na ON na.source = src_a
            JOIN n nb ON nb.source = src_b
            ORDER BY src_a, src_b"""))

  /** Prefix-duplicate census — the TEMPLATE-PAGE crawl pattern
    * (boilerplate-headed documents share a long common prefix but
    * diverge later, so full-document exact hashing misses them and
    * any-position span dedup over-counts them): documents cluster on
    * the portable hash of their first 16 tokens and the census reports
    * the cluster-size histogram plus each size's document mass —
    * the shape a dedup planner reads to decide whether prefix-keyed
    * near-dup is worth a pass. Scale: one stateless projection + one
    * hash aggregate + a ≤corpus-bounded but in practice tiny histogram
    * rollup; no joins, no windows. */
  val qTextPrefixDup = Q(
    "q_text_prefix_dup",
    (s, dir) => {
      val p = Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.Det.pHash60(
            concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
            .as("ph"))
      val cl = p.groupBy("ph").agg(count(lit(1)).as("csize"))
      cl.groupBy("csize")
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("csize")).as("n_docs"))
        .withColumn("dup_docs",
          expr("CASE WHEN csize > 1 THEN n_docs ELSE 0 END"))
        .select("csize", "n_clusters", "n_docs", "dup_docs")
        .orderBy("csize")
    },
    Some {
      val h = graft.Det.sqlPHash60(
        "array_to_string(string_split(text, ' ')[1:16], ' ')")
      s"""WITH p AS (SELECT doc_id, ($h) AS ph FROM documents),
              cl AS (SELECT ph, CAST(count(*) AS BIGINT) AS csize
                     FROM p GROUP BY ph),
              hist AS (SELECT csize,
                         CAST(count(*) AS BIGINT) AS n_clusters,
                         CAST(count(*) * csize AS BIGINT) AS n_docs
                       FROM cl GROUP BY csize)
            SELECT csize, n_clusters, n_docs,
                   CASE WHEN csize > 1 THEN n_docs ELSE 0 END AS dup_docs
            FROM hist ORDER BY csize"""
    })

  val all: Seq[Q] = Seq(
    qTextSourceOverlap, qTextPrefixDup,
    qMlNaiveBayes,
    qBpePairCounts, qBpeEncode, qBpeTrain, qUrlCanonical, qArrayStats,
    qSampleStratified, qSampleSystematic, qSampleWeighted,
    qTextNgramLm, qCorpusPack,
    qCorpusMixture,
    qEmbedProjectJl,
    qDedupExactHash, qDedupJaccardPairs, qDedupPpjoin, qDedupContainment,
    qDedupClusters,
    qDedupClustersBigstar, qDedupSurvivors, qCorpusCurate, qGraphTriangles,
    qGraphClusteringCoeff,
    qDedupMinhashLsh, qDedupSimhash, qDedupSubstrSpans,
    qEmbedCentroids, qEmbedSemdedup, qEmbedQuantize, qEmbedCenter,
    qEmbedLabelOutliers,
    qSimCosineTopk, qSimCosineNearDup, qSimCosineAnnLsh, qSimCosineIvf,
    qSimGraphBeam,
    qSimCosineQuantized, qDedupEmbedClusters,
    qTextStem,
    qTextTokensTop, qTextLangStats, qTextQuality, qTextTokenCount,
    qTextTfidfTop, qTextBm25, qSearchRrf, qTextChunk, qTextCooccur,
    qCorpusDrift, qTextHapax, qTextFingerprint,
    qTextLangId,
    qTextPiiMask,
    qTextStripMarkup, qTextUrlDomains, qCorpusSplit, qTextPerplexity,
    qTextRepetition, qContamination, qTextEntropy, qTextReadability,
    qTextKeyphrases, qTextBoilerplate, qTextZipfFit,
    qEvalLangConfusion, qEvalRetrieval, qEmbedDbscanGrid,
    qEvalF1, qTextJsd, qTextHeapsLaw, qSimMaxsim, qDedupCdcChunks,
    qTextWinnowing, qCorpusImportanceResample)
}
