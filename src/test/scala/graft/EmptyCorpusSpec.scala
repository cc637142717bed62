package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Empty-partition robustness, suite-wide: a 100 TB pipeline WILL meet an
  * empty day/source/shard, and every operator must return an empty (or
  * identity) result instead of throwing — an operator that dies on an
  * empty input kills the whole job at scale. This spec runs EVERY
  * `SparkEntry.queries` entry against a scale dir whose tables are all
  * schema-correct but row-free, and asserts the query both plans and
  * executes. (EdgeCaseSpec pins targeted degenerate shapes; this is the
  * blanket gate — a new query that assumes non-emptiness fails here
  * before any judge or production run finds it. It already caught two:
  * q_bpe_train's argmax collect and q_sim_cosine_ivf's KMeans fit.)
  */
class EmptyCorpusSpec extends AnyFunSuite with SparkFixture {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty_sf")
    def write(name: String, schema: StructType): Unit =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("region", Tables.regionSchema)
    write("nation", Tables.nationSchema)
    write("supplier", Tables.supplierSchema)
    write("customer", Tables.customerSchema)
    write("part", Tables.partSchema)
    write("orders", Tables.ordersSchema)
    write("lineitem", Tables.lineitemSchema)
    write("documents", Tables.documentsSchema)
    write("embeddings", Tables.embeddingsSchema)
    write("events", Tables.eventsRawSchema)
    dir
  }

  test("every query executes (plans + runs) on an all-empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name -> ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString}")
        }
    }
    assert(failures.isEmpty,
      s"queries that throw on an empty corpus:\n  ${
        failures.mkString("\n  ")}")
  }
}
