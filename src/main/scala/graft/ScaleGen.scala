package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal corpus generator (committed this time — the r11
  * rehearsal's generator was ad hoc and its output evaporated with /tmp).
  * Replicates the sf0.1 facts into a clone-degenerate 10× corpus:
  *  - lineitem ×10 with l_orderkey/l_partkey/l_suppkey offset per replica
  *    (the part–supplier graph genuinely grows 10×);
  *  - documents ×10 with doc_id offsets (every doc gains 9 exact clones —
  *    the dup-heavy-crawl worst case for pair generation);
  *  - embeddings ×5 with vec_id offsets (25× pairs);
  *  - other tables copied 1× (queries reading only those scale ~1× by
  *    construction — mark them when reporting).
  * Each replicated table lands as a multi-file parquet DIRECTORY so scans
  * get real file parallelism. Usage: runMain graft.ScaleGen <src> <out>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, copies: Int, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val offs = keys.map { k =>
        k -> (df.agg(max(col(k))).collect()(0).getLong(0) + 1L)
      }
      val parts = (0 until copies).map { i =>
        offs.foldLeft(df) { case (d, (k, off)) =>
          d.withColumn(k, col(k) + lit(i * off))
        }
      }
      parts.reduce(_.unionAll(_))
        .repartition(copies)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scalegen] $table x$copies done")
    }
    def copy(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scalegen] $table x1 copied")
    }

    replicate("lineitem", 10, Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("documents", 10, Seq("doc_id"))
    replicate("embeddings", 5, Seq("vec_id"))
    Seq("orders", "customer", "supplier", "part", "nation", "region",
      "events").foreach(copy)
    spark.stop()
  }
}

/** ALL-DISTINCT high-overlap rehearsal corpus — the OTHER PPJoin
  * degeneracy (r14 rehearsed clone-degenerate, where exact-dup collapse
  * wins; here collapse buys NOTHING): no two docs share a text, yet
  * every doc carries a GLOBAL 12-token template block (its shingles hit
  * df = N — a naive postings join explodes quadratically on those
  * buckets) plus an 18-token cluster block shared by its 20-doc cluster
  * (intra-cluster J ≈ 0.82 ≥ τ — the true positives) plus 3 unique
  * tokens (no exact dups, distinct prefixes). Cross-cluster J ≈ 0.19 <
  * τ = 0.5, so the CORRECT output is exactly the 190 intra-cluster
  * pairs per cluster — linear in N — and df-ascending prefixes must
  * carry the whole filter: template shingles sort LAST and never enter
  * a prefix, cluster shingles (df = 20) dominate it, bounding candidate
  * buckets at cluster size by construction. Usage:
  * runMain graft.ScaleGenOverlap <outDir> <nDocs>
  */
object ScaleGenOverlap {
  def main(args: Array[String]): Unit = {
    val (out, nDocs) = (args(0), args(1).toInt)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(nDocs.toLong).map { id =>
      val c = id / 20
      val unique = (0 until 3).map(k => s"u${id}x$k")
      val cluster = (0 until 18).map(k => s"c${c}t$k")
      val template = (0 until 12).map(k => s"gtmpl$k")
      val text = (unique ++ cluster ++ template).mkString(" ")
      (id, text, "en", "overlap", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[scalegen-overlap] $nDocs all-distinct high-overlap docs")
    spark.stop()
  }
}

/** LONG-DOCUMENT degeneracy corpus — the rehearsal axis every other
  * generator misses: all of them multiply doc COUNT; this one multiplies
  * doc LENGTH (×`mult`, default 50) at FIXED corpus count. Any operator
  * whose cost is super-linear in document length (per-char window
  * shuffles, boundary quadratics, full-text-through-exchange plans) is
  * linear on the count axis and invisible there — the r15
  * cdc_chunks/winnowing demerits were exactly this blind spot. Each
  * repetition is suffixed with a distinct marker token so rolling
  * hashes/shingles do NOT collapse to one periodic chunk set (that would
  * understate per-doc work); doc count, language and source mix are
  * preserved so group-by shapes stay identical to the source corpus.
  * Usage: runMain graft.ScaleGenLongDocs <srcSfDir> <outDir> [mult]
  */
object ScaleGenLongDocs {

  /** Generate the ×mult documents table into `out`; non-document tables
    * are SYMLINKED (the char-level family reads only documents — a copy
    * would just burn the sweep's I/O budget). Invoked by Bench every
    * sweep (regenerate-if-absent) so the axis is STANDING (r16 verdict
    * #6), not a one-off hand run.
    */
  def generate(spark: SparkSession, src: String, out: String,
               mult: Int): Unit = {
    spark.read.parquet(s"$src/documents.parquet")
      .withColumn("text", expr(
        s"concat_ws(' ', transform(sequence(0, ${mult - 1}), k ->" +
          " concat(text, ' m', CAST(k AS STRING))))"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "events", "embeddings").foreach { t =>
      val link = java.nio.file.Paths.get(out, s"$t.parquet")
      // Absolute-normalized target: a relative `src` would otherwise be
      // resolved relative to `out` at READ time and dangle (ADVICE r17).
      val target = java.nio.file.Paths.get(src, s"$t.parquet")
        .toAbsolutePath.normalize
      val stale = java.nio.file.Files.isSymbolicLink(link) &&
        java.nio.file.Files.readSymbolicLink(link) != target
      if (stale) java.nio.file.Files.delete(link)
      if (stale || !java.nio.file.Files.exists(link,
          java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(link, target)
    }
  }

  def main(args: Array[String]): Unit = {
    val (src, out) = (args(0), args(1))
    val mult = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, mult)
    println(s"[scalegen-longdocs] doc length x$mult at fixed count")
    spark.stop()
  }
}
