package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sketches
import graft.operators.Llm
import graft.sources.Tables

/** CMS guarantees: never under-counts, over-counts bounded by eps·N. */
class SketchesSpec extends AnyFunSuite with SparkFixture {

  test("count-min sketch brackets exact token counts within eps*N") {
    val toks = Llm.tokens(Tables.documents(spark, sfDir))
      .select("tok").cache()
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    val cms = Sketches.countMinOver(toks, "tok", eps = 0.001)
    val est = Sketches.estimate(cms, exact.keys.toSeq)
    toks.unpersist()
    exact.foreach { case (tok, n) =>
      val e = est(tok)
      assert(e >= n, s"CMS under-counted $tok: $e < $n")
      assert(e <= n + math.ceil(0.001 * total).toLong + 1,
        s"CMS over-count beyond bound for $tok: $e vs $n (N=$total)")
    }
  }

  test("heavy-hitters query: 20 rows, descending, CMS filter drops none") {
    val rows = Sketches.qSketchHeavyHitters.fn(spark, sfDir).collect()
    // the CMS certification filter must be a no-op (est within bounds for
    // every candidate) — fewer than 20 rows means the bound failed
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("CMS is deterministic for a fixed seed") {
    val toks = Llm.tokens(Tables.documents(spark, sfDir)).select("tok")
    val a = Sketches.countMinOver(toks, "tok")
    val b = Sketches.countMinOver(toks, "tok")
    val keys = Seq("engine", "data", "the", "query")
    assert(Sketches.estimate(a, keys) == Sketches.estimate(b, keys))
  }
}
