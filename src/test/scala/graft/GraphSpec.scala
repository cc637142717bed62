package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Graph, Llm}

/** Large-star/small-star contraction: O(log n) rounds on the shapes that
  * break diameter-bounded propagation, exact agreement with it elsewhere.
  */
class GraphSpec extends AnyFunSuite with SparkFixture {

  private def ccMap(edges: Seq[(Long, Long)],
                    maxRounds: Int = 30): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("diameter-200 chain collapses to one component in O(log n) rounds") {
    // propagation's worst case: a path graph needs `diameter` rounds there;
    // contraction must finish far inside 15
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = ccMap(chain, maxRounds = 15)
    assert(got.size == 201)
    assert(got.values.forall(_ == 0L))
  }

  test("multiple components, self-loops, duplicate + reversed edges") {
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L),       // triangle {3,5,9}
      (20L, 21L), (21L, 20L), (20L, 21L), // dup + reversed pair {20,21}
      (7L, 7L),                           // self-loop: singleton {7}
      (40L, 41L), (41L, 42L))             // path {40,41,42}
    val got = ccMap(edges)
    assert(got == Map(
      3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L,
      7L -> 7L,
      40L -> 40L, 41L -> 40L, 42L -> 40L))
  }

  test("star-center hub: high-degree node labels the whole component") {
    // hub 1000 with 300 spokes including the component min 1
    val edges = (1L to 300L).map(i => (1000L, i))
    val got = ccMap(edges)
    assert(got.size == 301)
    assert(got.values.forall(_ == 1L))
  }

  test("agrees with min-label propagation on the real near-dup pair graph") {
    val viaContraction = Llm.qDedupClustersBigstar.fn(spark, sfDir)
    val viaPropagation = Llm.qDedupClusters.fn(spark, sfDir)
    assert(viaContraction.exceptAll(viaPropagation).count() == 0)
    assert(viaPropagation.exceptAll(viaContraction).count() == 0)
  }

  test("triangle census: known counts on canonical toy graphs") {
    val s = spark
    import s.implicits._
    def census(edges: Seq[(Long, Long)]) = {
      val r = Graph.triangleCensus(edges.toDF("a", "b")).first()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    }
    // one triangle: 3 nodes, 3 edges, 3 wedges, coeff 3*1/3 = 1
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == (3L, 3L, 3L, 1L, 1.0))
    // star K1,3: no triangles, center degree 3 -> 3 wedges, coeff 0
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L))) == (4L, 3L, 3L, 0L, 0.0))
    // K4: 4 triangles, every node degree 3 -> 12 wedges, coeff 3*4/12 = 1
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))) == (4L, 6L, 12L, 4L, 1.0))
    // path P3: 2 edges, 1 wedge, no triangle
    assert(census(Seq((1L, 2L), (2L, 3L))) == (3L, 2L, 1L, 0L, 0.0))
  }

  test("rootAndDepth: pointer doubling resolves chains, forests; cycles throw") {
    val s = spark
    import s.implicits._
    def forest(rows: (Long, Long, Boolean)*) =
      rows.toDF("node", "parent", "is_root")
    // depth-5 chain 1<-2<-3<-4<-5<-6: needs ~log2(5)=3 rounds, not 5
    val chain = Graph.rootAndDepth(forest(
      (1L, 1L, true), (2L, 1L, false), (3L, 2L, false),
      (4L, 3L, false), (5L, 4L, false), (6L, 5L, false)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(chain(1L) == (1L, 0L) && chain(4L) == (1L, 3L) &&
      chain(6L) == (1L, 5L))
    // two-tree forest: labels stay within each tree
    val f = Graph.rootAndDepth(forest(
      (1L, 1L, true), (10L, 10L, true),
      (2L, 1L, false), (3L, 2L, false), (11L, 10L, false)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(f(3L) == (1L, 2L) && f(11L) == (10L, 1L) && f(10L) == (10L, 0L))
    // a parent cycle (2<->3, no root on the chain) must raise, not hang
    intercept[IllegalArgumentException] {
      Graph.rootAndDepth(forest(
        (1L, 1L, true), (2L, 3L, false), (3L, 2L, false)), maxRounds = 4)
        .collect()
    }
  }

  test("bfsHops: exact hop distances, multi-source min, cap, early exit") {
    val s = spark
    import s.implicits._
    def und(edges: (Long, Long)*) = {
      val e = edges.toDF("src", "dst")
      e.union(e.select(col("dst"), col("src"))).toDF("src", "dst")
    }
    def run(g: org.apache.spark.sql.DataFrame, seeds: Seq[Long], cap: Int) =
      Graph.bfsHops(g, seeds.toDF("node"), cap)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // chain 0-1-2-3-4-5 from node 0: exact hops, cap cuts at 3
    val chain = und((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(chain, Seq(0L), 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5))
    assert(run(chain, Seq(0L), 3) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    // multi-source: distance is the MIN over seeds (0 and 5)
    assert(run(chain, Seq(0L, 5L), 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 0))
    // disconnected part never appears; BFS early-exits before the cap
    val twoIslands = und((0L, 1L), (10L, 11L))
    assert(run(twoIslands, Seq(0L), 8) == Map(0L -> 0, 1L -> 1))
    // seed not in the graph stays at hop 0 with no expansion
    assert(run(twoIslands, Seq(99L), 4) == Map(99L -> 0))
  }

  test("pageRank: uniform on regular graphs, mass sums to ~1, hubs rank up") {
    val s = spark
    import s.implicits._
    // triangle = 2-regular: rank stays uniform at 1/3 every iteration
    val tri = Graph.pageRank(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"),
      iters = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(tri.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
    // star K1,4: center accumulates rank above the leaves; mass conserved
    val star = Graph.pageRank(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b"),
      iters = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(star(1L) > star(2L) * 2, "star center must dominate leaves")
    assert(math.abs(star.values.sum - 1.0) < 1e-9, "rank mass conserved")
    assert(Seq(2L, 3L, 4L, 5L).map(star).distinct.size == 1,
      "symmetric leaves get identical rank")
  }
}
