package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.{Det, Q}
import graft.operators.Llm
import graft.sources.Tables

/** UDF / UDAF / UDTF extension surface — SURVEY.md §2.K.
  *
  * These exist to prove the engine's user-extension points, each
  * cross-checked against a plain-SQL oracle computing the same thing.
  * Production guidance stays "functions, not UDFs" (a Scala UDF is a codegen
  * boundary); the ScalaTest suite asserts the UDF results equal the native
  * formulations.
  */
object Udx {

  /** GEOID parent extraction as a registered scalar UDF. */
  val geoidParent: (String, String) => String = (geoid, level) =>
    if (geoid == null) null
    else level match {
      case "state"  => geoid.substring(0, math.min(2, geoid.length))
      case "county" => geoid.substring(0, math.min(5, geoid.length))
      case _        => geoid
    }

  val qUdfScalar = Q(
    "q_udf_scalar",
    (s, dir) => {
      val f = udf(geoidParent)
      s.udf.register("geoid_parent", f)
      Tables.customer(s, dir)
        .select(lpad(col("c_custkey").cast("string"), 11, "0").as("geoid"))
        .select(col("geoid"),
          f(col("geoid"), lit("state")).as("state"),
          f(col("geoid"), lit("county")).as("county"))
        .orderBy("geoid")
    },
    Some("""SELECT geoid, substring(geoid, 1, 2) AS state,
                   substring(geoid, 1, 5) AS county
            FROM (SELECT lpad(CAST(c_custkey AS VARCHAR), 11, '0') AS geoid
                  FROM customer)
            ORDER BY geoid"""))

  /** Typed Aggregator for the weighted rate (same semantics as
    * q_agg_weighted_rate — cross-checks the typed path against the native
    * one). Accumulates exact BigDecimals mirroring CAST(x AS DECIMAL(38,6))
    * so the result is reduction-order independent.
    */
  type JBig = java.math.BigDecimal
  class WeightedRateAgg extends Aggregator[(Double, Double), (JBig, JBig), Double] {
    // mirrors Spark's CAST(double AS DECIMAL(38,6)): shortest-repr BigDecimal
    // rounded HALF_UP to scale 6 — keeps the typed path bit-identical to the
    // native decimal-sum formulation
    private def dec(x: Double): JBig =
      new JBig(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    def zero: (JBig, JBig) =
      (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)
    def reduce(b: (JBig, JBig), a: (Double, Double)): (JBig, JBig) =
      (b._1.add(dec(a._1)), b._2.add(dec(a._2)))
    def merge(x: (JBig, JBig), y: (JBig, JBig)): (JBig, JBig) =
      (x._1.add(y._1), x._2.add(y._2))
    def finish(r: (JBig, JBig)): Double = {
      val den = r._2.doubleValue()
      if (den == 0.0) Double.NaN else 100.0 * (r._1.doubleValue() / den)
    }
    def bufferEncoder: Encoder[(JBig, JBig)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val qUdafWeighted = Q(
    "q_udaf_weighted",
    (s, dir) => {
      val rateUdaf = udaf(new WeightedRateAgg)
      s.udf.register("weighted_rate", rateUdaf)
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
        .agg(rateUdaf(col("l_extendedprice") * col("l_discount"),
          col("l_extendedprice")).as("rate"))
        .orderBy("l_returnflag", "yr")
    },
    Some(s"""SELECT l_returnflag, yr, 100.0 * (num / den) AS rate
             FROM (SELECT l_returnflag,
                          CAST(year(l_shipdate) AS INTEGER) AS yr,
                          ${Det.sqlSum("l_extendedprice * l_discount")} AS num,
                          ${Det.sqlSum("l_extendedprice")} AS den
                   FROM lineitem GROUP BY l_returnflag, yr)
             ORDER BY l_returnflag, yr"""))

  /** Generator surface: explode docs into positional 3-gram shingles.
    * Composes existing generator machinery (posexplode over a transform) —
    * a custom Catalyst Generator is documented as unnecessary (§2.K).
    */
  val qUdtfShingles = Q(
    "q_udtf_shingles",
    (s, dir) =>
      Llm.shinglesWithPos(Tables.documents(s, dir))
        .where(col("doc_id") < 100)
        .orderBy("doc_id", "pos"),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents
                       WHERE doc_id < 100
                         AND len(string_split(text, ' ')) >= 3),
                 u AS (SELECT doc_id,
                         unnest([{'i': i,
                                  's': array_to_string(toks[i:i+2], ' ')}
                                 FOR i IN range(1, greatest(len(toks)-1, 1))])
                           AS x
                       FROM d)
            SELECT doc_id, CAST(x.i AS INTEGER) AS pos, x.s AS shingle
            FROM u ORDER BY doc_id, pos"""))

  val all: Seq[Q] = Seq(qUdfScalar, qUdafWeighted, qUdtfShingles)
}
