package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (test scope only — not part of the library). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    graft.plans.VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("ns", expr("vec_dot(embedding, embedding)"))

    val bands = 20
    val rows = 5
    val planes = (0 until bands * rows).map { p =>
      (0 until 64).map { d =>
        import org.apache.spark.sql.catalyst.expressions.XXH64
        val h = XXH64.hashLong(d.toLong, XXH64.hashLong(p.toLong, 42L))
        val m = ((h % 1000003) + 1000003) % 1000003
        m.toDouble / 1000003.0 - 0.5
      }
    }
    val fn = graft.plans.VectorFunctions.registerLshKeys(spark, planes, rows)
    val sig = emb
      .withColumn("keys", expr(s"$fn(embedding)"))
      .select(col("vec_id"), col("keys"), posexplode(col("keys")))
      .select(col("vec_id"), col("keys"), col("pos").as("band"),
        col("col").as("band_key"))
    time("sig.count #1") { sig.count() }
    time("sig.count #2") { sig.count() }
    val buckets = sig.groupBy("band", "band_key")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("keys")))).as("ids"))
    time("buckets.count") { buckets.count() }
    val expanded = buckets
      .where(size(col("ids")).between(2, 4096))
      .select(col("band"), col("ids"), posexplode(col("ids")))
      .toDF("band", "ids", "i", "x")
      .select(col("band") +: Seq(explode(expr(
        "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x.vec_id AS a, y.vec_id AS b, x.keys AS ka, y.keys AS kb))")).as("p")): _*)
      .select(col("band"), col("p.a").as("a"), col("p.b").as("b"),
        col("p.ka").as("ka"), col("p.kb").as("kb"))
    time("expanded multiset") { expanded.count() }
    val fc = expanded.where(!expr(
      "exists(zip_with(slice(ka, 1, band), slice(kb, 1, band), " +
        "(p, q) -> p = q), v -> v)"))
    time("first-collision filter") { fc.count() }
    val cand = fc.select("a", "b")
    val vecs = emb.select(col("vec_id"), col("embedding"), col("ns"))
    val scored = cand
      .join(vecs.toDF("a", "va", "nsa"), "a")
      .join(vecs.toDF("b", "vb", "nsb"), "b")
      .withColumn("score", round(
        expr("vec_dot(va, vb)") /
          (sqrt(col("nsa")) * sqrt(col("nsb"))), 6))
      .where(col("score") >= 0.4)
      .select("a", "b", "score")
    time("scored") { scored.count() }
    time("scored+orderBy") { scored.orderBy("a", "b").count() }
    time("full query again") { graft.operators.Llm.cosineAnnLshPairs(emb.drop("ns"), 0.4).count() }
    spark.stop()
  }
}
