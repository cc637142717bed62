package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Det, Q}
import graft.sources.Tables

/** Skew mitigation — SURVEY.md §7.3's salting recipe as code.
  *
  * At 100 TB a hot key (the "Los Angeles County" GEOID of the reference
  * data, a viral doc hash, a null-ish default) can put one join partition
  * orders of magnitude above the rest. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin.enabled, on by default) handles most cases
  * at runtime; explicit salting below is the deterministic fallback when the
  * skewed side must stay a shuffle join (e.g. both sides too big to
  * broadcast) or when AQE is unavailable (non-shuffle operators feeding the
  * join).
  *
  * Mechanics: the skewed (probe) side gets a random-but-deterministic salt
  * in [0, salts); the build side is replicated `salts` times; the join key
  * becomes (key, salt), spreading each hot key over `salts` partitions. The
  * result is row-identical to the unsalted join.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on big(bigKey) == small(smallKey) with
    * the big side salted over `salts` buckets. Deterministic salt (hash of
    * the whole row via xxhash64 on all columns) so re-runs produce identical
    * partitioning — no rand() (§7.2 rule 6).
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
                      bigKey: String, smallKey: String,
                      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
      // r21: pin the shuffle the salt EXISTS for. Catalyst's static
      // estimate of the replicated dim stays under the broadcast
      // threshold, so it silently planned a BroadcastHashJoin — a
      // ×salts-inflated broadcast build (orders ×8 ≈ 3.6 M rows at
      // sf0.1, ~2 s of build+ship for a skew remedy that never
      // engages: a broadcast join has no skew problem and at scale
      // the ×salts dim is exactly the r11 broadcast-OOM class). With
      // SHUFFLE_HASH the (key, salt) exchange actually spreads the
      // hot key. Row-identical either way (SkewSpec).
      .hint("shuffle_hash")
    saltedBig
      .join(replicatedSmall,
        col(bigKey) === col(smallKey) &&
          saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }

  /** LEFT-outer variant of saltedInnerJoin: the preserved (probe) side is
    * the salted big side, and the build side is replicated over every
    * salt — so for any fact row with salt s, the replica set contains a
    * salt-s copy of every matching dim row, making match EXISTENCE
    * per-salt identical to the unsalted join: unmatched fact rows keep
    * their nulls, matched ones their full match multiplicity.
    * Row-identical to `big.join(small, ..., "left")` (pinned in R12Spec).
    */
  def saltedLeftJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
      // r21: same SHUFFLE_HASH pin as saltedInnerJoin (left-outer keeps
      // the dim as build side, which ShuffledHashJoin supports)
      .hint("shuffle_hash")
    saltedBig
      .join(replicatedSmall,
        col(bigKey) === col(smallKey) &&
          saltedBig("_salt") === replicatedSmall("_salt"), "left")
      .drop("_salt")
  }

  /** The skew doctrine's OUTER-join face: a hot fact key must not
    * serialize the left join either, and naive salting breaks outer
    * semantics if the salt rides the dim side alone — this is the
    * replicate-dim form that provably preserves them. Dim pruned to one
    * priority so the null (unmatched) class is populated and counted.
    * Oracle = the plain unsalted LEFT JOIN (salting is a pure
    * partitioning change).
    */
  val qJoinLeftSalted = Q(
    "q_join_left_salted",
    (s, dir) => {
      val dim = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      saltedLeftJoin(Tables.lineitem(s, dir), dim,
        "l_orderkey", "o_orderkey", salts = 8)
        .groupBy(coalesce(col("o_orderpriority"), lit("none")).as("pri"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_px"))
        .orderBy("pri")
    },
    Some(s"""SELECT coalesce(o_orderpriority, 'none') AS pri,
                    count(*) AS n,
                    ${Det.sqlSum("l_extendedprice")} AS sum_px
             FROM lineitem LEFT JOIN
               (SELECT o_orderkey, o_orderpriority FROM orders
                WHERE o_orderpriority = '1-URGENT') o
               ON l_orderkey = o_orderkey
             GROUP BY 1 ORDER BY 1"""))

  /** Skewed-key aggregation: two-phase (salted partial → final) so one hot
    * group key cannot serialize into a single reducer. Equivalent to
    * groupBy(key).agg(sum) but the first shuffle spreads each key over
    * `salts` partitions.
    */
  def saltedSumAgg(df: DataFrame, key: String, valueCol: String,
                   salts: Int, resultName: String): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(resultName))

  /** q_join_inner through the salted path: same semantics, same oracle —
    * salting is a pure partitioning change, so the DuckDB SQL is the plain
    * join. The 8-way salt spreads every l_orderkey over 8 shuffle
    * partitions; SkewSpec additionally asserts row-identity against the
    * unsalted join at the row level.
    */
  val qJoinInnerSalted = Q(
    "q_join_inner_salted",
    (s, dir) =>
      saltedInnerJoin(
        Tables.lineitem(s, dir),
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        "l_orderkey", "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("l_extendedprice")).as("sum_px"))
        .orderBy("o_orderpriority"),
    Some(s"""SELECT o_orderpriority, count(*) AS n,
                    ${Det.sqlSum("l_extendedprice")} AS sum_px
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** saltedSumAgg through the t2 gate: same promotion recipe as
    * q_join_inner_salted — salting is a pure partitioning change, so the
    * DuckDB oracle is the plain unsalted sum. The value is pre-cast to the
    * Det decimal BEFORE the two-phase sum (exact decimal addition is
    * associative+commutative, so partial-then-final over salt buckets is
    * bit-identical to any order; a raw double sum would be
    * reduction-order-dependent and could never hash-match). SkewSpec
    * additionally asserts row-identity against the plain groupBy.
    */
  val qAggSumSalted = Q(
    "q_agg_sum_salted",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_extendedprice").cast(Det.Dec).as("pd"))
      saltedSumAgg(li, "l_returnflag", "pd", salts = 8, "sum_px_d")
        .select(col("l_returnflag"),
          col("sum_px_d").cast(org.apache.spark.sql.types.DoubleType)
            .as("sum_px"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, ${Det.sqlSum("l_extendedprice")} AS sum_px
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val all: Seq[Q] = Seq(qJoinInnerSalted, qAggSumSalted, qJoinLeftSalted)
}
