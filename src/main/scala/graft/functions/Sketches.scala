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

  /** PORTABLE Count-Min sketch, built and queried ENTIRELY IN-PLAN —
    * the oracle-reproducible counterpart to q_sketch_heavy_hitters
    * (whose JVM CountMinSketch DuckDB cannot run): depth 4 × width 256
    * counters; the 4 row hashes are four DISJOINT 8-hex-char windows of
    * ONE md5(token) (r18 — one digest + four codegen'd conv slices per
    * token replaced four interpreted per-(token, depth) digests, which
    * were this query's whole wall: the md5's 128 bits are uniform, and
    * disjoint windows give the independent-rows property the CMS wants;
    * the est ≥ exact LAW holds for ANY row hash regardless). Estimate =
    * min over the 4 rows. Because both engines slice the same md5 hex,
    * DuckDB rebuilds the IDENTICAL sketch and the parity gate certifies
    * construction + query, not just a bound. The CMS contract est ≥
    * exact is pinned in R14Spec. Scale: the build is one groupBy over
    * (d, cell) — 1 024 counters, map-side partial aggregation collapses
    * each partition to ≤1 024 rows before the shuffle, the textbook
    * mergeable-summary shape; the exact top-25 is the certification
    * truth path (production keeps only the sketch).
    */
  val qSketchCmsPortable = Q(
    "q_sketch_cms_portable",
    (s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.{LongType, StringType}
      def cell(d: Int, c: Column): Column = pmod(
        conv(substring(md5(c.cast(StringType)), 1 + 8 * d, 8), 16, 10)
          .cast(LongType), lit(256L))
      val toks = graft.operators.Llm.tokens(
        graft.sources.Tables.documents(s, dir))
      val cells = toks
        .select(posexplode(array(
          (0 until 4).map(d => cell(d, col("tok"))): _*)))
        .select(col("pos").as("d"), col("col").as("cell"))
        .groupBy("d", "cell").agg(count(lit(1)).as("cnt"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(25)
      top
        .select(col("tok"), col("n_exact"), posexplode(array(
          (0 until 4).map(d => cell(d, col("tok"))): _*)))
        .select(col("tok"), col("n_exact"), col("pos").as("d"),
          col("col").as("cell"))
        .join(broadcast(cells), Seq("d", "cell"))
        .groupBy("tok", "n_exact")
        .agg(min(col("cnt")).as("n_cms"))
        .select(col("tok"), col("n_exact"), col("n_cms"),
          (col("n_cms") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("tok"))
    },
    Some {
      def h(d: Int, e: String): String =
        s"((('0x' || substr(md5($e), ${1 + 8 * d}, 8))::BIGINT) % 256)"
      def hList(e: String): String =
        (0 until 4).map(d => h(d, e)).mkString("[", ", ", "]")
      s"""WITH toks AS (SELECT tok FROM
                   (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents) WHERE tok <> ''),
              cells AS (SELECT d, cell, count(*) AS cnt FROM
                     (SELECT unnest([0, 1, 2, 3]) AS d,
                             unnest(${hList("tok")}) AS cell
                      FROM toks)
                   GROUP BY d, cell),
              top AS (SELECT tok, count(*) AS n_exact FROM toks
                      GROUP BY tok
                      ORDER BY n_exact DESC, tok LIMIT 25),
              q AS (SELECT tok, n_exact,
                      unnest([0, 1, 2, 3]) AS d,
                      unnest(${hList("tok")}) AS cell
                    FROM top)
            SELECT q.tok, q.n_exact,
                   CAST(min(cells.cnt) AS BIGINT) AS n_cms,
                   CAST(min(cells.cnt) - q.n_exact AS BIGINT) AS overcount
            FROM q JOIN cells ON q.d = cells.d AND q.cell = cells.cell
            GROUP BY q.tok, q.n_exact
            ORDER BY q.n_exact DESC, q.tok"""
    })

  /** PORTABLE Bloom filter, built and queried ENTIRELY IN-PLAN — the
    * membership member of the portable-sketch family next to the CMS
    * (frequency): m = 65 536 bits × k = 4 salted md5-prefix hashes
    * (Det.pHash60, the cross-engine workhorse), member set = customer
    * names of the BUILDING segment, probe set = EVERY distinct
    * customer name. Build = distinct (bit) over members×salts — a
    * bounded ≤m-row set, the textbook mergeable membership summary
    * (bit-OR union is a distinct-union here); query = 4-way probe
    * expansion left-joined to the bit set, hit ⇔ all 4 present.
    * Output is the confusion census (is_member × bloom_hit): the
    * no-false-negatives LAW materializes as the structural absence of
    * the (true, false) row — certified by DuckDB rebuilding the
    * IDENTICAL filter, and pinned engine-side in SketchesSpec. Scale:
    * probes shuffle on the bit id against a ≤m-row build side; in
    * production the bit set broadcasts (64 KB) and the probe is a
    * map-side semi-join — exactly how q_join_bloom_prefilter uses its
    * JVM bitset, here with full oracle parity instead.
    */
  val qSketchBloomPortable = Q(
    "q_sketch_bloom_portable",
    (s, dir) => {
      val cust = graft.sources.Tables.customer(s, dir)
      val salts = s.range(4).select(col("id").cast("int").as("d"))
      def cell(nameCol: String) = pmod(graft.Det.pHash60(
        concat(col("d").cast("string"), lit(":"), col(nameCol))),
        lit(65536)).as("cell")
      val bits = cust.where(col("c_mktsegment") === "BUILDING")
        .select(col("c_name")).distinct()
        .crossJoin(broadcast(salts))
        .select(cell("c_name")).distinct()
      val probes = cust.select(col("c_name"),
          (col("c_mktsegment") === "BUILDING").as("m"))
        .groupBy("c_name").agg(max(col("m")).as("is_member"))
      val probed = probes.crossJoin(broadcast(salts))
        .select(col("c_name"), col("is_member"), cell("c_name"))
        .join(broadcast(bits.withColumn("present", lit(1L))),
          Seq("cell"), "left")
        .groupBy("c_name", "is_member")
        .agg((sum(coalesce(col("present"), lit(0L))) === 4L)
          .as("bloom_hit"))
      probed.groupBy("is_member", "bloom_hit")
        .agg(count(lit(1)).as("n_names"))
        .orderBy("is_member", "bloom_hit")
    },
    Some {
      val h = (e: String) => graft.Det.sqlPHash60(e)
      s"""WITH salts AS (SELECT unnest(range(0, 4)) AS d),
              bits AS (SELECT DISTINCT
                     ((${h("CAST(d AS VARCHAR) || ':' || c_name")})
                       % 65536 + 65536) % 65536 AS cell
                   FROM (SELECT DISTINCT c_name FROM customer
                         WHERE c_mktsegment = 'BUILDING')
                   CROSS JOIN salts),
              probes AS (SELECT c_name,
                       max(c_mktsegment = 'BUILDING') AS is_member
                     FROM customer GROUP BY c_name),
              probed AS (SELECT p.c_name, p.is_member,
                       CAST(sum(CASE WHEN bits.cell IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) = 4
                         AS bloom_hit
                     FROM probes p CROSS JOIN salts
                     LEFT JOIN bits ON bits.cell =
                       ((${h("CAST(d AS VARCHAR) || ':' || p.c_name")})
                         % 65536 + 65536) % 65536
                     GROUP BY p.c_name, p.is_member)
            SELECT is_member, bloom_hit, count(*) AS n_names
            FROM probed GROUP BY 1, 2 ORDER BY is_member, bloom_hit"""
    })

  /** PORTABLE HyperLogLog, built and queried ENTIRELY IN-PLAN — the
    * r14 portable-sketch doctrine (CMS = frequency, Bloom =
    * membership, histogram = quantiles) applied to DISTINCT COUNTING,
    * which makes the approx-distinct family oracle-visible for the
    * first time (q_agg_approx_distinct's engine-internal HLL++ can
    * never get a DuckDB oracle; this one DuckDB rebuilds bit-for-bit).
    * m = 256 registers: register = pHash60 mod 256, rank ρ = 1 +
    * trailing-zero count of the remaining 52 bits (w & −w isolates the
    * lowest set bit — an EXACT power of two ≤ 2⁵³, so log2 of it is
    * exact in both libms; round() guards the last ulp anyway; ρ = 53
    * for w = 0). The harmonic mean rides an ALL-INTEGER carrier:
    * 2^(−ρ) is represented as the BIGINT numerator 2^(53−ρ) (empty
    * registers contribute 2⁵³ = 2⁰·2⁵³), summed exactly — ≤ 256·2⁵³ =
    * 2⁶¹ < 2⁶³ — so the only cross-engine float steps are ONE
    * int→double cast and the shared-text α·m²·2⁵³/S division
    * (α = 0.7213/(1 + 1.079/m), the standard bias constant; 65536·2⁵³
    * is a power-of-two product, exact). Linear-counting small-range
    * correction m·ln(m/V) when E ≤ 2.5m and V > 0 empty registers —
    * shared text, round-6 (the libm-ln last-ulp guard). Output = the
    * full register table PLUS estimate vs exact-distinct truth and
    * rel_error, so the driver's parity gate certifies construction AND
    * query end-to-end; SketchesSpec bridges to q_agg_approx_distinct
    * (both estimators must land within their error bounds of the same
    * truth) and pins mergeability (register max is a semilattice: the
    * union sketch of two halves equals the whole-corpus sketch).
    * Scale: ONE map-combining groupBy to ≤256 rows — partials collapse
    * each partition to ≤256 registers before the shuffle, the textbook
    * mergeable summary; the exact countDistinct is the certification
    * truth path (production keeps only the 256 registers).
    */
  /** The portable-HLL register table of a value column (m = 256;
    * see qSketchHllPortable for the full doctrine). Exposed so set
    * ALGEBRA on sketches (union via register max-merge, intersection
    * via inclusion-exclusion) composes from the same construction.
    */
  def hllRegs(df: DataFrame, value: org.apache.spark.sql.Column)
  : DataFrame =
    df.select(graft.Det.pHash60(value).as("h"))
      .select(pmod(col("h"), lit(256)).as("reg"),
        expr("h div 256").as("w"))
      .select(col("reg"), expr(
        "CASE WHEN w = 0 THEN 53 ELSE CAST(round(log2(" +
          "CAST((w & (-w)) AS DOUBLE))) AS INTEGER) + 1 END").as("rho"))
      .groupBy("reg").agg(max(col("rho")).as("rho_max"))

  /** One-row (est) readout of a portable-HLL register table — the
    * shared-text harmonic-mean estimate with the linear-counting
    * small-range branch.
    */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - rho_max)"))
          .as("sn_p"))
      .select(col("n_present"),
        expr("sn_p + (256 - n_present) * 9007199254740992").as("sn"))
      .select(col("n_present"), expr(
        "CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)" +
          " + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))" +
          " * CAST(65536 AS DOUBLE) * CAST(9007199254740992 AS DOUBLE)" +
          " / CAST(sn AS DOUBLE)").as("est_raw"))
      .select(expr(
        "CASE WHEN est_raw <= CAST(640 AS DOUBLE) AND n_present < 256" +
          " THEN round(CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE)" +
          " / CAST(256 - n_present AS DOUBLE)), 6)" +
          " ELSE round(est_raw, 6) END").as("est"))

  /** Oracle-side spellings of the same helpers: CTE text producing
    * g_<tag> (register table) and e_<tag> (one-row est_<tag>) from a
    * source SELECT emitting a single column h.
    */
  def sqlHllRegs(tag: String, hSelect: String): String =
    s"""r_$tag AS (SELECT ((h % 256) + 256) % 256 AS reg,
                     CASE WHEN h // 256 = 0 THEN 53 ELSE
                       CAST(round(log2(CAST(((h // 256) & (-(h // 256)))
                         AS DOUBLE))) AS INTEGER) + 1 END AS rho
                   FROM ($hSelect)),
            g_$tag AS (SELECT reg, max(rho) AS rho_max
                       FROM r_$tag GROUP BY reg)"""
  def sqlHllEst(tag: String): String =
    s"""s_$tag AS (SELECT CAST(count(*) AS BIGINT) AS n_present,
                     CAST(sum(CAST(1 AS BIGINT) << (53 - rho_max))
                       AS BIGINT) AS sn_p
                   FROM g_$tag),
            n_$tag AS (SELECT n_present,
                         sn_p + (256 - n_present) * 9007199254740992 AS sn
                       FROM s_$tag),
            x_$tag AS (SELECT n_present,
                         CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                           + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
                           * CAST(65536 AS DOUBLE)
                           * CAST(9007199254740992 AS DOUBLE)
                           / CAST(sn AS DOUBLE) AS est_raw
                       FROM n_$tag),
            e_$tag AS (SELECT
                         CASE WHEN est_raw <= CAST(640 AS DOUBLE)
                                AND n_present < 256
                           THEN round(CAST(256 AS DOUBLE)
                             * ln(CAST(256 AS DOUBLE)
                                  / CAST(256 - n_present AS DOUBLE)), 6)
                           ELSE round(est_raw, 6) END AS est_$tag
                       FROM x_$tag)"""

  val qSketchHllPortable = Q(
    "q_sketch_hll_portable",
    (s, dir) => {
      val regs = hllRegs(graft.sources.Tables.lineitem(s, dir),
        col("l_orderkey"))
      val actual = graft.sources.Tables.lineitem(s, dir)
        .agg(countDistinct(col("l_orderkey")).as("actual"))
      val np = regs.agg(count(lit(1)).as("n_present"))
      val summ = hllEstimate(regs)
        .crossJoin(broadcast(np)).crossJoin(broadcast(actual))
      regs.crossJoin(broadcast(summ))
        .select(col("reg"), col("rho_max"), col("n_present"),
          col("est"), col("actual"),
          expr("round((est - CAST(actual AS DOUBLE))" +
            " / CAST(actual AS DOUBLE), 6)").as("rel_error"))
        .orderBy("reg")
    },
    Some {
      val h = graft.Det.sqlPHash60("l_orderkey")
      s"""WITH hv AS (SELECT ($h) AS h FROM lineitem),
              rr AS (SELECT ((h % 256) + 256) % 256 AS reg,
                       CASE WHEN h // 256 = 0 THEN 53 ELSE
                         CAST(round(log2(CAST(((h // 256) & (-(h // 256)))
                           AS DOUBLE))) AS INTEGER) + 1 END AS rho
                     FROM hv),
              regs AS (SELECT reg, max(rho) AS rho_max
                       FROM rr GROUP BY reg),
              act AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
                        AS actual FROM lineitem),
              summ AS (SELECT CAST(count(*) AS BIGINT) AS n_present,
                         CAST(sum(CAST(1 AS BIGINT) << (53 - rho_max))
                           AS BIGINT) AS sn_p
                       FROM regs),
              sn AS (SELECT n_present, actual,
                       sn_p + (256 - n_present) * 9007199254740992 AS sn
                     FROM summ, act),
              er AS (SELECT n_present, actual,
                       CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
                         + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
                         * CAST(65536 AS DOUBLE)
                         * CAST(9007199254740992 AS DOUBLE)
                         / CAST(sn AS DOUBLE) AS est_raw
                     FROM sn),
              e AS (SELECT n_present, actual,
                      CASE WHEN est_raw <= CAST(640 AS DOUBLE)
                             AND n_present < 256
                        THEN round(CAST(256 AS DOUBLE)
                          * ln(CAST(256 AS DOUBLE)
                               / CAST(256 - n_present AS DOUBLE)), 6)
                        ELSE round(est_raw, 6) END AS est
                    FROM er)
            SELECT reg, rho_max, n_present, est, actual,
                   round((est - CAST(actual AS DOUBLE))
                     / CAST(actual AS DOUBLE), 6) AS rel_error
            FROM regs, e ORDER BY reg"""
    })


  /** HLL SET ALGEBRA, in-plan and oracle-certified — the operation that
    * makes a distinct-count sketch a planning tool rather than a
    * number: |A| and |B| from their own register tables, |A∪B| from
    * the registers' MAX-MERGE (the semilattice law SketchesSpec pins,
    * here exercised IN the plan: union + groupBy max), and |A∩B| by
    * inclusion–exclusion — the audience-overlap / join-cardinality
    * estimate a 100 TB planner asks before committing to a join. Sets:
    * order keys of priority {1,2,3} vs {2,3,4} (60% each, 40% true
    * overlap — inclusion–exclusion is unstable for TINY intersections,
    * so the fixture exercises the healthy regime; the estimator's
    * variance caveat is in the docstring, not hidden). Exact truths
    * ride along; DuckDB rebuilds all three sketches identically.
    * Scale: three ≤256-row register aggregates off ONE scan shape.
    */
  val qSketchHllIntersect = Q(
    "q_sketch_hll_intersect",
    (s, dir) => {
      val o = graft.sources.Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("p"))
      val ra = hllRegs(o.where(col("p") <= 3), col("k"))
      val rb = hllRegs(o.where(col("p") >= 2 && col("p") <= 4), col("k"))
      val ru = ra.union(rb).groupBy("reg")
        .agg(max(col("rho_max")).as("rho_max"))
      val estA = hllEstimate(ra).select(col("est").as("est_a"))
      val estB = hllEstimate(rb).select(col("est").as("est_b"))
      val estU = hllEstimate(ru).select(col("est").as("est_union"))
      val act = o.agg(
        countDistinct(when(col("p") <= 3, col("k"))).as("actual_a"),
        countDistinct(when(col("p") >= 2 && col("p") <= 4, col("k")))
          .as("actual_b"),
        countDistinct(when(col("p") === 2 || col("p") === 3, col("k")))
          .as("actual_i"))
      estA.crossJoin(estB).crossJoin(estU).crossJoin(broadcast(act))
        .select(col("est_a"), col("est_b"), col("est_union"),
          expr("round(est_a + est_b - est_union, 6)").as("est_intersect"),
          col("actual_a"), col("actual_b"), col("actual_i"),
          expr("round((round(est_a + est_b - est_union, 6)" +
            " - CAST(actual_i AS DOUBLE))" +
            " / CAST(actual_i AS DOUBLE), 6)").as("rel_error_intersect"))
    },
    Some {
      val h = graft.Det.sqlPHash60("k")
      val src = "SELECT o_orderkey AS k, CAST(substr(o_orderpriority," +
        " 1, 1) AS INTEGER) AS p FROM orders"
      s"""WITH o AS ($src),
            ${sqlHllRegs("a", s"SELECT ($h) AS h FROM o WHERE p <= 3")},
            ${sqlHllRegs("b",
              s"SELECT ($h) AS h FROM o WHERE p >= 2 AND p <= 4")},
            g_u AS (SELECT reg, max(rho_max) AS rho_max
                    FROM (SELECT * FROM g_a UNION ALL SELECT * FROM g_b)
                    GROUP BY reg),
            ${sqlHllEst("a")},
            ${sqlHllEst("b")},
            ${sqlHllEst("u")},
            act AS (SELECT
                CAST(count(DISTINCT CASE WHEN p <= 3 THEN k END)
                  AS BIGINT) AS actual_a,
                CAST(count(DISTINCT CASE WHEN p >= 2 AND p <= 4 THEN k
                           END) AS BIGINT) AS actual_b,
                CAST(count(DISTINCT CASE WHEN p = 2 OR p = 3 THEN k END)
                  AS BIGINT) AS actual_i
              FROM o)
            SELECT est_a, est_b, est_u AS est_union,
                   round(est_a + est_b - est_u, 6) AS est_intersect,
                   actual_a, actual_b, actual_i,
                   round((round(est_a + est_b - est_u, 6)
                     - CAST(actual_i AS DOUBLE))
                     / CAST(actual_i AS DOUBLE), 6) AS rel_error_intersect
            FROM e_a, e_b, e_u, act"""
    })

  /** KMV (k-minimum-values) distinct sketch, in-plan and
    * oracle-certified — the third portable distinct estimator next to
    * the HLL register table (q_sketch_hll_portable) and the exact
    * count: keep the k = 256 smallest DISTINCT 60-bit portable hashes;
    * the kth minimum's position estimates the hash density, so
    * D̂ = (k−1)·2⁶⁰/h₍ₖ₎. Unlike HLL the sketch is also a uniform
    * SAMPLE of the key space (each kept hash is a random key —
    * the property that powers distinct-JOIN estimates), which is why
    * engines keep both. Under k distinct keys the sketch is exact (the
    * guard keeps the estimate = n_k, stated). Scale: the k-smallest is
    * a TakeOrdered (per-partition top-k + driver merge of 256-row
    * heads — no global sort), the dedup one hash aggregate.
    */
  val qSketchKmv = Q(
    "q_sketch_kmv",
    (s, dir) => {
      val hv = graft.sources.Tables.orders(s, dir)
        .select(graft.Det.pHash60(col("o_custkey")).as("h")).distinct()
      val low = hv.orderBy(col("h").asc).limit(256)
      val kth = low.agg(count(lit(1)).as("n_k"), max(col("h")).as("kth"))
      val act = graft.sources.Tables.orders(s, dir)
        .agg(countDistinct(col("o_custkey")).as("actual"))
      kth.crossJoin(broadcast(act))
        .select(col("n_k"), col("kth"), col("actual"),
          expr("CASE WHEN n_k = 256 THEN round(CAST(255 AS DOUBLE)" +
            " * CAST(1152921504606846976 AS DOUBLE)" +
            " / CAST(kth AS DOUBLE), 6)" +
            " ELSE CAST(n_k AS DOUBLE) END").as("est"))
        .withColumn("rel_error",
          expr("round((est - CAST(actual AS DOUBLE))" +
            " / CAST(actual AS DOUBLE), 6)"))
    },
    Some {
      val h = graft.Det.sqlPHash60("o_custkey")
      s"""WITH hv AS (SELECT DISTINCT ($h) AS h FROM orders),
              low AS (SELECT h FROM hv ORDER BY h ASC LIMIT 256),
              kth AS (SELECT CAST(count(*) AS BIGINT) AS n_k,
                        max(h) AS kth
                      FROM low),
              act AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
                        AS actual FROM orders),
              e AS (SELECT n_k, kth, actual,
                      CASE WHEN n_k = 256 THEN round(CAST(255 AS DOUBLE)
                          * CAST(1152921504606846976 AS DOUBLE)
                          / CAST(kth AS DOUBLE), 6)
                        ELSE CAST(n_k AS DOUBLE) END AS est
                    FROM kth, act)
            SELECT n_k, kth, actual, est,
                   round((est - CAST(actual AS DOUBLE))
                     / CAST(actual AS DOUBLE), 6) AS rel_error
            FROM e"""
    })

  /** AMS F₂ sketch, in-plan and oracle-certified — the second
    * frequency moment Σf² (≡ self-equi-join size, the cardinality a
    * join planner wants BEFORE committing to a shuffle) estimated from
    * 64 sign-hash counters: sign_j(x) = ±1 from bit 0 of the portable
    * hash of (j:x), counter_j = Σ_x sign_j(x)·f_x (an exact BIGINT —
    * each is a plain SUM, so the sketch is mergeable map-side), and
    * F̂₂ = mean_j(counter_j²) (rel. std ≈ √(2/64) ≈ 18%) — E[counter²] = F₂ because cross terms
    * cancel in expectation. The exact Σf² rides along for the error
    * readout. Per-row squares are IEEE-exact while |counter| < 2⁵³ᐟ²
    * ≈ 9·10⁷ (counter is bounded by row count; beyond that carry the
    * square on DECIMAL(38,0)); the 64-term mean rides the decimal
    * order-free sum. Scale: one per-key count aggregate + a 64× fanout
    * of the COUNT table (not the corpus), all map-combining.
    */
  val qSketchAmsF2 = Q(
    "q_sketch_ams_f2",
    (s, dir) => {
      val f = graft.sources.Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("f"))
      val rows = f.withColumn("j", explode(sequence(lit(0), lit(63))))
        .withColumn("sgn",
          when(graft.Det.pHash60(
            concat(col("j").cast("string"), lit(":"),
              col("key").cast("string"))) % 2 === 0, lit(1L))
            .otherwise(lit(-1L)))
      val sk = rows.groupBy("j")
        .agg(sum(col("sgn") * col("f")).as("sk"))
      val est = sk.agg(
        count(lit(1)).as("s_rows"),
        graft.Det.dsum(expr("CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)"))
          .as("sumsq"))
        .select(col("s_rows"),
          expr("sumsq / CAST(s_rows AS DOUBLE)").as("f2_est"))
      val ex = f.agg(sum(col("f") * col("f")).as("f2_exact"))
      est.crossJoin(broadcast(ex))
        .select(col("s_rows"), col("f2_est"), col("f2_exact"),
          expr("round((f2_est - CAST(f2_exact AS DOUBLE))" +
            " / CAST(f2_exact AS DOUBLE), 6)").as("rel_error"))
    },
    Some {
      val h = graft.Det.sqlPHash60(
        "CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)")
      s"""WITH f AS (SELECT l_partkey AS key,
                    CAST(count(*) AS BIGINT) AS f
                  FROM lineitem GROUP BY 1),
              rws AS (SELECT f.key, f.f, r.j,
                        CASE WHEN ($h) % 2 = 0 THEN 1 ELSE -1 END AS sgn
                      FROM f CROSS JOIN
                        (SELECT CAST(range AS BIGINT) AS j
                         FROM range(64)) r),
              sk AS (SELECT j, CAST(sum(sgn * f) AS BIGINT) AS sk
                     FROM rws GROUP BY j),
              e AS (SELECT CAST(count(*) AS BIGINT) AS s_rows,
                      ${graft.Det.sqlSum(
                        "CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)")}
                        AS sumsq
                    FROM sk),
              est AS (SELECT s_rows,
                        sumsq / CAST(s_rows AS DOUBLE) AS f2_est
                      FROM e),
              ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact
                     FROM f)
            SELECT s_rows, f2_est, f2_exact,
                   round((f2_est - CAST(f2_exact AS DOUBLE))
                     / CAST(f2_exact AS DOUBLE), 6) AS rel_error
            FROM est, ex"""
    })

  /** KMV set ALGEBRA — union size and Jaccard from k-minimum-values
    * sketches, the property q_sketch_kmv keeps KMV for (each retained
    * hash is a uniform key-space sample, so the union sketch's members
    * are an unbiased sample of A∪B and the fraction also in BOTH sets
    * estimates J(A,B) directly — the estimator behind distinct-join
    * sizing and audience overlap without HLL's inclusion–exclusion
    * instability on small intersections). Sets: customers ordering in
    * H1 (months 1–6) vs H2. Build = one per-hash membership aggregate
    * (bool-or flags), union sketch = TakeOrdered 256 of the hash axis
    * (per-partition top-k + 256-row driver merge, no global sort);
    * Ĵ = |sketch ∩ both| / n_k, D̂(A∪B) = (k−1)·2⁶⁰/h₍ₖ₎ (exact when
    * the sketch is not full), intersection = Ĵ·D̂ by identity. Exact
    * truths ride along; DuckDB rebuilds the identical sketch. */
  val qSketchKmvJaccard = Q(
    "q_sketch_kmv_jaccard",
    (s, dir) => {
      val m = graft.sources.Tables.orders(s, dir)
        .groupBy(graft.Det.pHash60(col("o_custkey")).as("h"))
        .agg(
          max(when(month(col("o_orderdate")) <= 6, 1L).otherwise(0L))
            .as("a"),
          max(when(month(col("o_orderdate")) >= 7, 1L).otherwise(0L))
            .as("b"))
      val low = m.orderBy(col("h").asc).limit(256)
      val sk = low.agg(count(lit(1)).as("n_k"), max(col("h")).as("kth"),
        sum(col("a") * col("b")).as("both_k"))
      val act = m.agg(count(lit(1)).as("u_true"),
        sum(col("a") * col("b")).as("i_true"))
      sk.crossJoin(broadcast(act))
        .select(col("n_k"), col("both_k"), col("u_true"), col("i_true"),
          expr("CASE WHEN n_k = 256 THEN round(CAST(255 AS DOUBLE)" +
            " * CAST(1152921504606846976 AS DOUBLE)" +
            " / CAST(kth AS DOUBLE), 6)" +
            " ELSE CAST(n_k AS DOUBLE) END").as("u_est"),
          expr("CASE WHEN n_k = 0 THEN NULL ELSE" +
            " CAST(both_k AS DOUBLE) / CAST(n_k AS DOUBLE) END")
            .as("jac_est"),
          expr("CASE WHEN u_true = 0 THEN NULL ELSE" +
            " CAST(i_true AS DOUBLE) / CAST(u_true AS DOUBLE) END")
            .as("jac_true"))
        .withColumn("i_est",
          expr("round(jac_est * u_est, 6)"))
    },
    Some {
      val h = graft.Det.sqlPHash60("o_custkey")
      s"""WITH m AS (SELECT ($h) AS h,
                    CAST(max(CASE WHEN month(o_orderdate) <= 6
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
                    CAST(max(CASE WHEN month(o_orderdate) >= 7
                      THEN 1 ELSE 0 END) AS BIGINT) AS b
                  FROM orders GROUP BY 1),
              low AS (SELECT * FROM m ORDER BY h ASC LIMIT 256),
              sk AS (SELECT CAST(count(*) AS BIGINT) AS n_k,
                       max(h) AS kth,
                       CAST(sum(a * b) AS BIGINT) AS both_k
                     FROM low),
              act AS (SELECT CAST(count(*) AS BIGINT) AS u_true,
                        CAST(sum(a * b) AS BIGINT) AS i_true
                      FROM m),
              e AS (SELECT n_k, both_k, u_true, i_true,
                      CASE WHEN n_k = 256 THEN round(CAST(255 AS DOUBLE)
                          * CAST(1152921504606846976 AS DOUBLE)
                          / CAST(kth AS DOUBLE), 6)
                        ELSE CAST(n_k AS DOUBLE) END AS u_est,
                      CASE WHEN n_k = 0 THEN NULL ELSE
                        CAST(both_k AS DOUBLE) / CAST(n_k AS DOUBLE) END
                        AS jac_est,
                      CASE WHEN u_true = 0 THEN NULL ELSE
                        CAST(i_true AS DOUBLE) / CAST(u_true AS DOUBLE)
                        END AS jac_true
                    FROM sk, act)
            SELECT n_k, both_k, u_true, i_true, u_est, jac_est, jac_true,
                   round(jac_est * u_est, 6) AS i_est
            FROM e"""
    })

  val all: Seq[Q] = Seq(qSketchHeavyHitters, qSketchCmsPortable,
    qSketchBloomPortable, qSketchHllPortable, qSketchHllIntersect,
    qSketchKmv, qSketchAmsF2, qSketchKmvJaccard)
}
