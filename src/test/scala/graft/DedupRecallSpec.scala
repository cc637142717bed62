package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Llm

/** Approximate dedup/ANN paths must recover (almost) everything the exact
  * formulations find — the contract that makes them valid 100 TB stand-ins.
  */
class DedupRecallSpec extends AnyFunSuite with SparkFixture {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash+LSH recall >= 0.9 vs exact Jaccard, no false positives") {
    val exact = pairSet(Llm.qDedupJaccardPairs.fn(spark, sfDir))
    val lsh = pairSet(Llm.qDedupMinhashLsh.fn(spark, sfDir))
    assert(exact.nonEmpty, "exact query found no pairs — test data changed?")
    // LSH verifies candidates exactly, so every emitted pair must be real
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${lsh.size}/${exact.size})")
  }

  test("cosine ANN-LSH recall >= 0.8 vs exact near-dup, no false positives") {
    val exact = pairSet(Llm.qSimCosineNearDup.fn(spark, sfDir))
    val ann = pairSet(Llm.qSimCosineAnnLsh.fn(spark, sfDir))
    assert(exact.nonEmpty)
    assert(ann.subsetOf(exact), s"false positives: ${ann.diff(exact)}")
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall < 0.8 (${ann.size}/${exact.size})")
  }

  test("SimHash pairs are near-dups under exact Jaccard more often than random") {
    val sim = pairSet(Llm.qDedupSimhash.fn(spark, sfDir))
    val exact = pairSet(Llm.qDedupJaccardPairs.fn(spark, sfDir))
    assert(sim.nonEmpty, "simhash found nothing")
    val hitRate = sim.intersect(exact).size.toDouble / sim.size
    assert(hitRate >= 0.5, s"simhash precision vs jaccard-0.5 only $hitRate")
  }

  test("IVF two-stage ANN recovers most of the brute-force top-5") {
    def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(Llm.qSimCosineTopk.fn(spark, sfDir))
    val ivf = topkSet(Llm.ivfProbeTopk(spark, sfDir))
    assert(exact.size == 50)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // measured 0.64 at sf0.001 / 0.74 at sf0.01 (deterministic: seed-fixed
    // KMeans over fixed data; ParitySpec proves the output identical across
    // 3/7/16-way shuffle parallelism). The bound sits just under the
    // measured floor so a genuine regression of the cell-probe logic
    // fails, not noise.
    assert(recall >= 0.6,
      s"IVF recall $recall < 0.6 (nprobe=4 of 16 cells; measured 0.64)")
    // the r20 certified wrapper must agree with the spec's own recall
    // computation: its in-plan certificate rides the same ≥0.6 bound
    val certified = Llm.qSimCosineIvf.fn(spark, sfDir).collect()
    assert(certified.nonEmpty)
    certified.foreach { r =>
      assert(r.getInt(r.fieldIndex("recall_ge_60pct")) ==
        (if (recall >= 0.6) 1 else 0))
    }
  }

  test("IVF is deterministic: two builds give identical rows") {
    val r1 = Llm.ivfProbeTopk(spark, sfDir).collect().map(_.toSeq).toSeq
    val r2 = Llm.ivfProbeTopk(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }

  test("dedup clusters: pair endpoints co-cluster, id = min member") {
    val pairs = pairSet(Llm.qDedupJaccardPairs.fn(spark, sfDir))
    val cl = Llm.qDedupClusters.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(cl(a) == cl(b), s"pair ($a,$b) split across clusters") }
    cl.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid,
        s"cluster $cid is not its own min member") }
  }

  test("corpus curation: one verdict per doc, dup verdicts match the pair graph") {
    val verdicts = Llm.qCorpusCurate.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val docs = Llm.qTextQuality.fn(spark, sfDir).count()
    assert(verdicts.size == docs, "a doc was dropped or duplicated")
    val dupB = pairSet(Llm.qDedupJaccardPairs.fn(spark, sfDir)).map(_._2)
    dupB.foreach { b =>
      assert(verdicts(b) == "duplicate", s"pair b-side $b not marked dup") }
    assert(verdicts.values.toSet.size >= 4,
      s"verdict branches unexercised: ${verdicts.values.toSet}")
    assert(verdicts.values.count(_ == "keep") > verdicts.size / 2)
  }

  test("exact dedup keeps one keeper per content hash") {
    val df = Llm.qDedupExactHash.fn(spark, sfDir)
    assert(df.count() == df.select("content_hash").distinct().count())
  }

  test("semdedup: one proto per label = its max-cos min-id vector; drops >= 0.25") {
    val rows = Llm.qEmbedSemdedup.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getDouble(2), r.getString(3)))
    val nVecs = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == nVecs, "a vector was dropped or duplicated")
    rows.groupBy(_._2).foreach { case (label, grp) =>
      val protos = grp.filter(_._4 == "proto")
      assert(protos.length == 1, s"label $label has ${protos.length} protos")
      val maxCos = grp.map(_._3).max
      val expect = grp.filter(_._3 == maxCos).map(_._1).min
      assert(protos.head._1 == expect,
        s"label $label proto ${protos.head._1} != max-cos min-id $expect")
      grp.filter(_._4 == "drop").foreach { case (id, _, c, _) =>
        assert(c >= 0.25, s"vec $id dropped at cos $c < 0.25") }
      grp.filter(_._4 == "keep").foreach { case (id, _, c, _) =>
        assert(c < 0.25, s"vec $id kept at cos $c >= 0.25") }
    }
    assert(rows.map(_._4).toSet == Set("proto", "drop", "keep"),
      "a verdict branch is unexercised at this SF")
  }

  test("r20 tuned LSH band shapes hold 0.95-dedup recall on the " +
      "ScaleGenEmbed construction") {
    // smoke-scale instance of the SAME construction the 10\u2075 rehearsal
    // measured (BASELINE.md r20 ANN crossover): \u00d75 jittered replication,
    // eps = 0.02 \u21d2 the 0.95-threshold truth is exactly the intra-cluster
    // pair set (C(5,2) = 10 pairs per base vector). The tuned shapes from
    // the 10\u2075 run \u2014 12 rows/band, 8 vs 16 bands \u2014 must keep their
    // measured recall class here too (everything is deterministic:
    // hash-driven jitter, literal hyperplanes).
    val base = graft.sources.Tables.embeddings(spark, sfDir)
    val jr = ScaleGenEmbed.jitterReplicate(base, 5, 0.02).cache()
    try {
      val exact = pairSet(Llm.cosineNearDupPairs(jr, 0.95))
      val nBase = base.count()
      assert(exact.size == nBase * 10,
        s"constructed truth broke: ${exact.size} pairs != ${nBase * 10} " +
          "intra-cluster pairs \u2014 jitter eps or threshold drifted")
      for ((bands, rows, bound) <- Seq((8, 12, 0.95), (16, 12, 0.99))) {
        val found = pairSet(Llm.cosineAnnLshPairs(jr, 0.95, bands, rows))
        assert(found.subsetOf(exact),
          s"${bands}x$rows false positives: ${found.diff(exact)}")
        val recall = found.intersect(exact).size.toDouble / exact.size
        assert(recall >= bound,
          s"${bands}x$rows recall $recall < $bound " +
            s"(${found.size}/${exact.size})")
      }
    } finally jr.unpersist(blocking = false)
  }

}
