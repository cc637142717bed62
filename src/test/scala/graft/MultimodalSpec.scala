package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** §2.J multimodal design: binary columns + typed metadata; decode runs
  * through REAL JDK codecs (ImageIO PNG, AudioSystem WAV) and every
  * Spark-side seam (schema, repartition, batched mapPartitions) is real.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private lazy val assets = Multimodal.syntheticAssets(spark, 30).cache()

  test("PNG encode→decode roundtrip is pixel-exact") {
    val png = Multimodal.encodePng(7, 5,
      (x, y) => ((x * 40) << 16) | ((y * 50) << 8) | (x + y))
    val img = Multimodal.decodeImage(png)
    assert(img.getWidth == 7 && img.getHeight == 5)
    for (y <- 0 until 5; x <- 0 until 7)
      assert((img.getRGB(x, y) & 0xffffff) ==
        (((x * 40) << 16) | ((y * 50) << 8) | (x + y)))
  }

  test("WAV encode→decode roundtrip is sample-exact") {
    val samples = Array.tabulate(1000)(i => ((i * 997) % 65536 - 32768).toShort)
    val back = Multimodal.decodeWav(Multimodal.encodeWav(samples, 16000))
    assert(back.toSeq == samples.toSeq)
  }

  test("frame pack→unpack preserves every frame's bytes") {
    val frames = (0 until 4).map(f =>
      Multimodal.encodePng(6, 4, (x, y) => (f * 60 + x + y) << 16))
    val back = Multimodal.unpackFrames(Multimodal.packFrames(frames))
    assert(back.length == 4)
    frames.zip(back).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("synthetic assets match the declared schema shape") {
    val schema = assets.schema
    assert(schema.fieldNames.toSeq ==
      Multimodal.assetSchema.fieldNames.toSeq)
    assert(assets.count() == 30)
    assert(assets.where(col("media").isNull).count() == 0)
  }

  test("decode+featurize is deterministic and keeps one row per asset") {
    val d1 = Multimodal.decodeAndFeaturize(assets, dim = 16)
    val d2 = Multimodal.decodeAndFeaturize(assets, dim = 16)
    val r1 = d1.collect().sortBy(_.asset_id)
    val r2 = d2.collect().sortBy(_.asset_id)
    assert(r1.length == 30)
    r1.zip(r2).foreach { case (a, b) =>
      assert(a.asset_id == b.asset_id)
      assert(a.features.toSeq == b.features.toSeq, "non-deterministic decode")
      assert(a.features.length == 16)
    }
  }

  test("resize clamps the long side and preserves aspect ratio direction") {
    val resized = Multimodal.resizeMeta(
      Multimodal.decodeAndFeaturize(assets), maxSide = 64)
    resized.collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(w <= 64 + 1 && h <= 64 + 1, s"not clamped: $w x $h")
    }
  }

  test("t2 featurization query: one row per document, 8 integer bins") {
    val out = Multimodal.qMultimodalFeatures.fn(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(out.length == nDocs)
    out.foreach { r =>
      val bins = r.getAs[String]("feat").split(",")
      assert(bins.length == 8)
      // md5 hex chars are 0-9a-f (ascii 48..102); 4 chars per bin
      bins.foreach(b => assert(b.toLong >= 4 * 48 && b.toLong <= 4 * 102))
      assert(r.getAs[Int]("out_w") <= 256 + 1)
      assert(r.getAs[Int]("n_bytes") == 32)
    }
  }

  test("frame sampling yields duration/stride rows per video asset") {
    val frames = Multimodal.sampleFrames(assets, strideMs = 1000)
    val counts = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vids = assets.where(col("kind") === "video")
      .select("asset_id", "meta.duration_ms").collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val expect = math.max(1, r.getLong(1) / 1000)
      assert(counts(r.getLong(0)) == expect)
    }
  }

  test("JPEG re-encode is genuinely lossy yet aHash-preserving") {
    // the cross-format certification is only meaningful if the codec
    // actually changed pixels: a quality-0.9 JPEG of a 0/255 block
    // raster must decode to DIFFERENT luminance somewhere (ringing at
    // block edges), while q_multimodal_jpeg's parity proves the
    // 64-bit aHash survived bit-for-bit anyway
    import graft.operators.Multimodal._
    val rgb = (x: Int, y: Int) => {
      val v = if (((x / 4) * 8 + (y / 3)) % 3 != 0) 255 else 0
      (v << 16) | (v << 8) | v
    }
    val png = encodePng(32, 24, rgb)
    val jpg = encodeJpeg(decodeImage(png))
    val ip = decodeImage(png)
    val ij = decodeImage(jpg)
    val diffs = (for { y <- 0 until 24; x <- 0 until 32 } yield {
      def lum(p: Int) =
        (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      math.abs(lum(ip.getRGB(x, y)) - lum(ij.getRGB(x, y)))
    })
    assert(diffs.exists(_ > 0),
      "JPEG round trip changed no pixel — the lossy leg is not lossy")
    assert(diffs.max < 128,
      s"JPEG error too large for any hash to survive: max=${diffs.max}")
  }

  test("cross-format hamming: self zero, negative control far") {
    val rows = graft.operators.Multimodal.qMultimodalJpeg
      .fn(spark, sfDir).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, "png-vs-jpeg hash must match per asset")
      assert(r.getLong(3) >= 30L,
        s"different assets must be far apart: ${r.getLong(3)}")
      assert(r.getString(1).length == 64)
    }
  }
}
