package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Q
import graft.sources.Tables

/** Multimodal (image/audio/video) column design — SURVEY.md §2.J design row.
  *
  * Assets are opaque `BinaryType` payloads plus a typed metadata struct —
  * the schema a 100 TB multimodal corpus would use. The actual media codecs
  * are NOT in this container, so the decode kernels below are clearly-marked
  * DETERMINISTIC STUBS (hash-derived pixels/samples); everything around them
  * — schema, batched per-partition iteration, partitioning, output shape —
  * is the real Spark plumbing and is unit-tested.
  *
  * Scale posture: decode/feature-extract run via mapPartitions on the
  * executor side (one JNI/codec context per partition, amortized across the
  * batch — the Scala analog of Python's mapInPandas batching); assets are
  * repartitioned by asset_id so media bytes never skew one task; outputs are
  * narrow columns (features, dims) so downstream stages drop the payload
  * early.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  final case class AssetMeta(width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int],
                             duration_ms: Option[Long])
  final case class Asset(asset_id: Long, kind: String, media: Array[Byte],
                         meta: AssetMeta)
  final case class DecodedAsset(asset_id: Long, kind: String, width: Int,
                                height: Int, features: Array[Float])
  final case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Long,
                         features: Array[Float])

  /** Deterministic synthetic asset table (tests only — no real media in the
    * container). Payload bytes derive from sha2(asset_id).
    */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      sha2(col("id").cast("string"), 256).cast("binary").as("media"),
      struct(
        (pmod(col("id"), lit(1024)) + 16).cast(IntegerType).as("width"),
        (pmod(col("id") * 7, lit(768)) + 16).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("id"), lit(30000)) + 1000).as("duration_ms")).as("meta"))
  }

  /** STUB decode kernel: a real build links an image/audio codec here.
    * Deterministic: features are a fixed-length fold of the payload bytes.
    */
  private def decodeStub(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < media.length) {
      out(i % dim) += (media(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition (mapInPandas analog):
    * the codec context would be opened once per iterator, not per row.
    */
  def decodeAndFeaturize(assets: DataFrame, dim: Int = 16): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.repartition(col("asset_id")).as[Asset].mapPartitions { it =>
      // per-partition setup (codec init) would go here — once per batch
      it.map { a =>
        val feats = decodeStub(a.media, dim)
        DecodedAsset(a.asset_id, a.kind,
          a.meta.width.getOrElse(0), a.meta.height.getOrElse(0), feats)
      }
    }
  }

  /** Resize: pure-metadata transform (target box, preserve aspect). */
  def resizeMeta(decoded: Dataset[DecodedAsset], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide.toDouble) /
          greatest(col("width"), col("height")).cast(DoubleType)))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast(IntegerType))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast(IntegerType))

  /** Frame sampling for video assets: one row per sampled frame at a fixed
    * stride — the Spark-side shape of a frame-extraction pipeline.
    */
  def sampleFrames(assets: DataFrame, strideMs: Long = 1000,
                   dim: Int = 16): Dataset[Frame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("kind") === "video").as[Asset].flatMap { a =>
      val dur = a.meta.duration_ms.getOrElse(0L)
      val n = math.max(1, (dur / strideMs).toInt)
      val base = decodeStub(a.media, dim)
      (0 until n).iterator.map { f =>
        Frame(a.asset_id, f, f * strideMs,
          base.map(v => v * (1.0f + f))) // stub per-frame variation
      }
    }
  }

  /** Deterministic corpus-derived asset table in the full assetSchema shape:
    * one asset per document, media = the md5 hex digest of the text as
    * bytes (a stand-in payload BOTH engines can derive — there's no real
    * media in the container), meta from the doc id. This is the t2-visible
    * bridge from the driver's tables to the multimodal pipeline.
    */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      md5(col("text")).cast("binary").as("media"),
      struct(
        (pmod(col("doc_id"), lit(1024)) + 16).cast(IntegerType).as("width"),
        (pmod(col("doc_id") * 7, lit(768)) + 16).cast(IntegerType)
          .as("height"),
        lit(16000).as("sample_rate"),
        // (doc_id % 29 + 1) s + 500 ms: frame counts span 1..29 at EVERY
        // scale factor (doc_id % 30000 degenerates to <2 s for small ids,
        // which would leave the frame fan-out untested)
        ((pmod(col("doc_id"), lit(29)) + 1) * 1000 + 500)
          .as("duration_ms"))
        .as("meta"))

  /** Output row of the t2 featurization query. */
  final case class FeatRow(asset_id: Long, kind: String, width: Int,
                           height: Int, out_w: Int, out_h: Int,
                           n_bytes: Int, feat: String)

  /** The t2 multimodal query: decode (STUB kernel) + featurize + resize
    * metadata over corpus-derived assets, through the REAL pipeline seams —
    * BinaryType payload column, repartition by asset_id, typed
    * Dataset[Asset], batched mapPartitions (the codec context would open
    * once per partition iterator).
    *
    * Featurization here is an integer byte-fold (bin j sums payload bytes
    * at positions ≡ j mod 8) rather than decodeStub's float accumulation:
    * exact integers make the identical feature vector computable in DuckDB
    * (ascii() over the same md5 hex chars) → full oracle for the one
    * mandated component that previously had none. The resize math is a
    * single IEEE divide + multiply + ceil in both engines.
    */
  val qMultimodalFeatures = Q(
    "q_multimodal_features",
    (s, dir) => {
      import s.implicits._
      val dim = 8
      val maxSide = 256.0
      assetsFromDocuments(s, dir)
        .repartition(col("asset_id"))
        .as[Asset]
        .mapPartitions { it =>
          // per-partition setup (codec init) would go here — once per batch
          it.map { a =>
            val sums = new Array[Long](dim)
            var i = 0
            while (i < a.media.length) {
              sums(i % dim) += (a.media(i) & 0xff)
              i += 1
            }
            val w = a.meta.width.getOrElse(0)
            val h = a.meta.height.getOrElse(0)
            val scale = math.min(1.0, maxSide / math.max(w, h))
            FeatRow(a.asset_id, a.kind, w, h,
              math.ceil(w * scale).toInt, math.ceil(h * scale).toInt,
              a.media.length, sums.mkString(","))
          }
        }
        .toDF()
        .orderBy("asset_id")
    },
    Some("""WITH a AS (SELECT doc_id AS asset_id,
                              (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1]
                                AS kind,
                              md5(text) AS h,
                              CAST(doc_id % 1024 + 16 AS INT) AS width,
                              CAST((doc_id * 7) % 768 + 16 AS INT) AS height
                       FROM documents),
                 f AS (SELECT asset_id, CAST(i.i % 8 AS INT) AS j,
                              sum(ascii(substr(h, CAST(i.i AS INT) + 1, 1)))
                                AS s
                       FROM a CROSS JOIN range(32) AS i(i)
                       GROUP BY 1, 2),
                 feat AS (SELECT asset_id,
                                 string_agg(CAST(s AS VARCHAR), ','
                                            ORDER BY j) AS feat
                          FROM f GROUP BY asset_id)
            SELECT a.asset_id, a.kind, a.width, a.height,
                   CAST(ceil(a.width *
                     least(1.0, 256.0 / greatest(a.width, a.height)))
                     AS INT) AS out_w,
                   CAST(ceil(a.height *
                     least(1.0, 256.0 / greatest(a.width, a.height)))
                     AS INT) AS out_h,
                   CAST(length(a.h) AS INT) AS n_bytes,
                   f.feat
            FROM a JOIN feat f USING (asset_id)
            ORDER BY asset_id"""))

  /** Output row of the t2 frame-sampling query. */
  final case class FrameRow(asset_id: Long, frame_idx: Int, ts_ms: Long,
                            fsum: Long)

  /** The t2 frame-sampling query: video assets explode into one row per
    * sampled frame at a 1 s stride — the generator (flatMap) shape of a
    * video pipeline, through the same typed-Dataset/mapPartitions seams as
    * featurization. Per-frame fingerprint = integer byte-fold of the
    * payload + frame index (the stub for "decode frame f"), exact in both
    * engines → full oracle. Frame counts are bounded by duration_ms, so
    * the fan-out is data-capped (max 30 rows/asset), never unbounded.
    */
  val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, dir) => {
      import s.implicits._
      assetsFromDocuments(s, dir)
        .where(col("kind") === "video")
        .repartition(col("asset_id"))
        .as[Asset]
        .mapPartitions { it =>
          // per-partition setup (codec init) would go here — once per batch
          it.flatMap { a =>
            var bsum = 0L
            var i = 0
            while (i < a.media.length) { bsum += (a.media(i) & 0xff); i += 1 }
            val n = math.max(1L, a.meta.duration_ms.getOrElse(0L) / 1000L)
            (0L until n).iterator.map { f =>
              FrameRow(a.asset_id, f.toInt, f * 1000L, bsum + f)
            }
          }
        }
        .toDF()
        .orderBy("asset_id", "frame_idx")
    },
    Some("""WITH a AS (SELECT doc_id AS asset_id, md5(text) AS h,
                              (doc_id % 29 + 1) * 1000 + 500 AS dur
                       FROM documents WHERE doc_id % 3 = 2),
                 s AS (SELECT asset_id, dur,
                              sum(ascii(substr(h, CAST(i.i AS INT) + 1, 1)))
                                AS bsum
                       FROM a CROSS JOIN range(32) AS i(i)
                       GROUP BY 1, 2)
            SELECT asset_id, CAST(f.f AS INT) AS frame_idx,
                   f.f * 1000 AS ts_ms, CAST(bsum + f.f AS BIGINT) AS fsum
            FROM s CROSS JOIN range(30) AS f(f)
            WHERE f.f < greatest(1, dur // 1000)
            ORDER BY asset_id, frame_idx"""))

  val all: Seq[Q] = Seq(qMultimodalFeatures, qMultimodalFrames)
}
