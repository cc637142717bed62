package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-session robustness: a shared cluster runs MANY queries at
  * once, and the store-building seams (Incremental / ensureBucketed) must
  * not corrupt each other when two queries race to materialize the SAME
  * dir-keyed artifact (the pagerank/sssp/2hop family shares one adjacency
  * store; clusters/bigstar share the pair store). This spec runs
  * store-sharing and store-independent queries in parallel threads on the
  * shared session and asserts each result is row-identical to its serial
  * run — a lost-update or half-written _SUCCESS would surface as a read
  * error or a wrong count.
  */
class ConcurrencySpec extends AnyFunSuite with SparkFixture {

  private val names = Seq(
    // two queries sharing the SAME bucketed adjacency store
    "q_graph_pagerank", "q_graph_sssp",
    // two sharing the corpus pair store
    "q_dedup_clusters", "q_graph_triangles",
    // independent store builders
    "q_join_bucketed", "q_layout_zorder",
    // pure queries riding alongside
    "q_agg_hash", "q_win_rank_topn")

  test("concurrent queries (shared stores included) match serial results") {
    // fresh input-dir COPY → every dir-keyed store is COLD, so the
    // concurrent phase (run FIRST) races the builds themselves, not
    // just warm reads
    val dir = tmpDir("conc_sf")
    val src = java.nio.file.Paths.get(sfDir)
    java.nio.file.Files.walk(src).forEach { p =>
      val rel = src.relativize(p).toString
      if (rel.nonEmpty) {
        val t = java.nio.file.Paths.get(dir, rel)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, dir).collect().toSeq)
    }
    val concurrent = Await.result(Future.sequence(futures), 10.minutes).toMap
    val serial = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir).collect().toSeq
    }.toMap
    names.foreach { n =>
      assert(concurrent(n) == serial(n),
        s"$n diverged under concurrency (store race?)")
    }
  }
}
