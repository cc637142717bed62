package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Distributed ordered-prefix primitives — the scale-correct replacement
  * for a partition-less `Window.orderBy(...)` rank / running sum.
  *
  * A global ordered window serializes its whole input through ONE task
  * (the classic 100 TB WindowExec killer). The fix used here is the
  * two-phase decomposition `q_corpus_pack` already proves exact for hash
  * buckets, generalized to ORDER-PRESERVING buckets so it also works when
  * the output must follow a caller-chosen total order (rank curves,
  * quantile scores, Pareto cumsums):
  *
  *   1. bucket each row by a deterministic MONOTONE function of the sort
  *      metric (linear interpolation between the broadcast global min and
  *      max). Monotone ⇒ every bucket is a contiguous band of the total
  *      order, so the decomposition below is exact — not approximate —
  *      for any associative accumulator (counts, decimal sums);
  *   2. run the per-row window PER BUCKET (parallel, bounded tasks);
  *   3. prefix the nBuckets per-bucket totals through one tiny ordered
  *      window (O(nBuckets) rows — bounded by construction, the only
  *      partition-less window allowed) and broadcast the offsets back.
  *
  * Determinism: min/max are order-insensitive exact aggregates and the
  * bucket index is a pure row-local function of (metric, min, max), so a
  * recomputation of the lineage lands every row in the same bucket — no
  * sampling (unlike `repartitionByRange`, whose boundaries come from
  * reservoir sketches and would not be reproducible in a DuckDB oracle).
  * Skew: linear buckets degrade on pathological metric distributions
  * (all-equal metrics collapse to one bucket) but the decomposition stays
  * CORRECT; at 100 TB you'd raise nBuckets or pre-apply a variance-
  * stabilizing monotone transform (log) — both preserve exactness.
  */
object Prefix {

  /** Adds `out`: a deterministic bucket id in [0, nBuckets) monotone
    * NON-DECREASING in `metric` (cast to double — IEEE rounding of a
    * decimal/long is monotone, and equal doubles share a bucket, which
    * keeps bands contiguous). Degenerate all-equal input collapses to
    * bucket 0 — still correct, just serial.
    */
  def withRangeBucket(
      df: DataFrame, metric: Column, nBuckets: Int, out: String): DataFrame = {
    val st = df.agg(
      min(metric.cast(DoubleType)).as("__gr_mn"),
      max(metric.cast(DoubleType)).as("__gr_mx"))
    df.crossJoin(broadcast(st))
      .withColumn(out,
        when(col("__gr_mx") === col("__gr_mn"), lit(0))
          .otherwise(least(
            floor((metric.cast(DoubleType) - col("__gr_mn")) /
              (col("__gr_mx") - col("__gr_mn")) * nBuckets),
            lit(nBuckets - 1).cast(LongType)))
          .cast(IntegerType))
      .drop("__gr_mn", "__gr_mx")
  }

  /** Exact 1-based global rank over the total order (bucket band,
    * `order` within band) without a global sort: row_number per bucket +
    * broadcast per-bucket count offsets. `bucketDesc` flips the band
    * order for DESC metrics (the bucket column is monotone in the metric,
    * so descending metric order == descending bucket order). The caller's
    * `order` must be a TOTAL order within a bucket (tiebreak on a key).
    */
  def globalRank(
      df: DataFrame, bucketCol: String, order: Seq[Column],
      bucketDesc: Boolean, out: String): DataFrame = {
    val local = df.withColumn("__gr_rn",
      row_number().over(
        Window.partitionBy(col(bucketCol)).orderBy(order: _*)))
    val bOrd = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val offs = df.groupBy(bucketCol).agg(count(lit(1)).as("__gr_bn"))
      .withColumn("__gr_off", coalesce(
        sum(col("__gr_bn")).over(
          Window.orderBy(bOrd).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(bucketCol), col("__gr_off"))
    local.join(broadcast(offs), Seq(bucketCol))
      .withColumn(out, (col("__gr_off") + col("__gr_rn")).cast(LongType))
      .drop("__gr_rn", "__gr_off")
  }

  /** Exact inclusive running sum of `value` over the same decomposed total
    * order. `value` must be an ASSOCIATIVE-exact type (long, decimal) —
    * the whole point of the repo's Dec12 doctrine — so regrouping the
    * additions per bucket cannot change the result.
    *
    * Decimal-precision contract: a decimal `value` of precision p sums to
    * p+10 per bucket (Spark's sum widening). The cross-bucket offset
    * window would widen AGAIN to (38, s) and the final offset+local add
    * would then need precision 39 — past the cap, so allowPrecisionLoss
    * would silently round the last scale digit. To keep the whole path
    * rounding-free the offset is cast BACK to the local-sum type (p+10)
    * before the addition: value-exact as long as the GRAND total fits
    * precision p+10 — the same headroom the caller already granted the
    * per-bucket sums, and 10 decimal orders of magnitude of row count.
    */
  def runningSum(
      df: DataFrame, bucketCol: String, order: Seq[Column],
      bucketDesc: Boolean, value: Column, out: String): DataFrame =
    runningSums(df, bucketCol, order, bucketDesc, Seq(value -> out))

  /** N exact inclusive running sums over ONE decomposed total order in a
    * single pass (r22, guide §2.4): chaining runningSum k times plans —
    * and at 100 TB re-executes — the input subtree 2^k times (each call
    * references its input twice: local window + bucket totals). All k
    * sums share the same window spec and the same offsets join here, so
    * the input is referenced exactly twice regardless of k. Per-column
    * arithmetic (window frame, per-bucket totals, offset narrowing cast,
    * final add) is identical to the single-column form — runningSum
    * itself now delegates, so the two can never drift.
    */
  def runningSums(
      df: DataFrame, bucketCol: String, order: Seq[Column],
      bucketDesc: Boolean, values: Seq[(Column, String)]): DataFrame = {
    val w = Window.partitionBy(col(bucketCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.zipWithIndex.foldLeft(df) {
      case (d, ((value, _), i)) =>
        d.withColumn(s"__gr_loc_$i", sum(value).over(w))
    }
    val bOrd = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val totals = df.groupBy(bucketCol).agg(
      sum(values.head._1).as("__gr_bt_0"),
      values.tail.zipWithIndex.map { case ((value, _), i) =>
        sum(value).as(s"__gr_bt_${i + 1}") }: _*)
    val wOff = Window.orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = values.indices.foldLeft(totals) { case (d, i) =>
        val btType = totals.schema(s"__gr_bt_$i").dataType
        d.withColumn(s"__gr_off_$i", coalesce(
          sum(col(s"__gr_bt_$i")).over(wOff), lit(0L)).cast(btType))
      }
      .select(col(bucketCol) +:
        values.indices.map(i => col(s"__gr_off_$i")): _*)
    values.zipWithIndex.foldLeft(
        local.join(broadcast(offs), Seq(bucketCol))) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__gr_off_$i") + col(s"__gr_loc_$i"))
    }.drop(values.indices.flatMap(i =>
      Seq(s"__gr_loc_$i", s"__gr_off_$i")): _*)
  }

  /** Per-GROUP variant of withRangeBucket: bucket bounds come from each
    * group's own min/max (a per-group aggregate joined back — AQE
    * broadcasts it when the group count is small). Same monotonicity and
    * determinism contract as the global form, per group.
    */
  def withGroupRangeBucket(
      df: DataFrame, group: Seq[String], metric: Column,
      nBuckets: Int, out: String): DataFrame = {
    val st = df.groupBy(group.map(col): _*).agg(
      min(metric.cast(DoubleType)).as("__gr_mn"),
      max(metric.cast(DoubleType)).as("__gr_mx"))
    df.join(st, group)
      .withColumn(out,
        when(col("__gr_mx") === col("__gr_mn"), lit(0))
          .otherwise(least(
            floor((metric.cast(DoubleType) - col("__gr_mn")) /
              (col("__gr_mx") - col("__gr_mn")) * nBuckets),
            lit(nBuckets - 1).cast(LongType)))
          .cast(IntegerType))
      .drop("__gr_mn", "__gr_mx")
  }

  /** Per-group exact 1-based rank over (bucket band, `order` within
    * band) — the grouped form of globalRank: per-(group, bucket)
    * row_number + per-group bucket-count offsets (nBuckets rows per
    * group through a group-partitioned tiny window).
    */
  def groupedRank(
      df: DataFrame, group: Seq[String], bucketCol: String,
      order: Seq[Column], bucketDesc: Boolean, out: String): DataFrame = {
    val gCols = group.map(col)
    val local = df.withColumn("__gr_rn",
      row_number().over(
        Window.partitionBy(gCols :+ col(bucketCol): _*).orderBy(order: _*)))
    val bOrd = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val offs = df.groupBy(gCols :+ col(bucketCol): _*)
      .agg(count(lit(1)).as("__gr_bn"))
      .withColumn("__gr_off", coalesce(
        sum(col("__gr_bn")).over(
          Window.partitionBy(gCols: _*).orderBy(bOrd)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(gCols ++ Seq(col(bucketCol), col("__gr_off")): _*)
    local.join(offs, group :+ bucketCol)
      .withColumn(out, (col("__gr_off") + col("__gr_rn")).cast(LongType))
      .drop("__gr_rn", "__gr_off")
  }

  /** Per-group exact INCLUSIVE running sum over the decomposed total
    * order — grouped runningSum (value must be associative-exact:
    * long/decimal; same rounding-free offset-narrowing contract as
    * runningSum — per-group grand total must fit precision p+10).
    */
  def groupedRunningSum(
      df: DataFrame, group: Seq[String], bucketCol: String,
      order: Seq[Column], bucketDesc: Boolean, value: Column,
      out: String): DataFrame = {
    val gCols = group.map(col)
    val local = df.withColumn("__gr_loc",
      sum(value).over(
        Window.partitionBy(gCols :+ col(bucketCol): _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bOrd = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val totals = df.groupBy(gCols :+ col(bucketCol): _*)
      .agg(sum(value).as("__gr_bt"))
    val btType = totals.schema("__gr_bt").dataType
    val offs = totals
      .withColumn("__gr_off", coalesce(
        sum(col("__gr_bt")).over(
          Window.partitionBy(gCols: _*).orderBy(bOrd)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast(btType))
      .select(gCols ++ Seq(col(bucketCol), col("__gr_off")): _*)
    local.join(offs, group :+ bucketCol)
      .withColumn(out, col("__gr_off") + col("__gr_loc"))
      .drop("__gr_loc", "__gr_off")
  }

  /** EXCLUSIVE running max of `value` over a per-group total order
    * (group band, bucket band, `order` within bucket) — the skyline /
    * record-so-far primitive — without ever sorting a whole group in one
    * task: per-(group, bucket) window + per-group bucket-offset maxima
    * (nBuckets rows per group through a group-partitioned tiny window —
    * bounded by construction). Max is associative and commutative, so
    * the regrouping is exact. Rows with no predecessor get NULL, like
    * a rowsBetween(unboundedPreceding, -1) frame.
    */
  def groupedRunningMaxExcl(
      df: DataFrame, group: Seq[String], bucketCol: String,
      order: Seq[Column], bucketDesc: Boolean, value: Column,
      out: String): DataFrame = {
    val gCols = group.map(col)
    val local = df.withColumn("__gr_loc",
      max(value).over(
        Window.partitionBy(gCols :+ col(bucketCol): _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
    val bOrd = if (bucketDesc) col(bucketCol).desc else col(bucketCol).asc
    val offs = df.groupBy(gCols :+ col(bucketCol): _*)
      .agg(max(value).as("__gr_bm"))
      .withColumn("__gr_off",
        max(col("__gr_bm")).over(
          Window.partitionBy(gCols: _*).orderBy(bOrd)
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(gCols ++ Seq(col(bucketCol), col("__gr_off")): _*)
    // no broadcast hint: offs is O(groups · nBuckets) — AQE broadcasts it
    // while groups are few and falls back to a shuffle join when the
    // group space itself scales (greatest() skips NULLs, so the combined
    // prefix is NULL only for a true first row)
    local.join(offs, group :+ bucketCol)
      .withColumn(out, greatest(col("__gr_off"), col("__gr_loc")))
      .drop("__gr_loc", "__gr_off")
  }

  /** SQL-standard NTILE(k) replayed from a global rank: pure integer
    * arithmetic on (rank, n) replicating the fill rule exactly (first
    * n mod k tiles take ceil(n/k) rows, the rest floor(n/k)), so the
    * result hash-matches an engine-native `ntile(k) OVER (ORDER BY ...)`
    * while never materializing a single-task global window. `rk` and `n`
    * are column NAMES already on the frame.
    */
  def ntileFromRank(rk: String, n: String, k: Int): Column = {
    // q = n div k, r = n mod k, t = r*(q+1); rank<=t -> ceil(rk/(q+1)),
    // else r + ceil((rk-t)/q). Lazy If keeps the q=0 division unreachable
    // (n<k puts every rank in the first branch: t = r = n).
    val q = s"($n div $k)"
    val r = s"($n % $k)"
    val t = s"($r * ($q + 1))"
    when(col(rk) <= expr(t), expr(s"($rk + $q) div ($q + 1)"))
      .otherwise(expr(s"$r + (($rk - $t) + $q - 1) div $q"))
      .cast(IntegerType)
  }
}
