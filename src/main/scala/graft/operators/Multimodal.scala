package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
}
