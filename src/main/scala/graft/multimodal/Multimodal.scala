package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (driver mandate): image/audio/video as opaque
  * BINARY columns with typed metadata, processed by per-partition
  * batch-shaped functions.
  *
  * The actual codec work (JPEG decode, PCM resample, H.264 frame
  * extraction) is STUBBED — no media libraries exist in this
  * environment — behind `FakeCodec`, a deterministic stand-in with the
  * same signature a real decoder would have. Everything Spark-side is
  * real and tested: the schema, the binary column handling, the
  * mapPartitions batch shape (one codec init per PARTITION, not per
  * row — exactly how a JNI/ffmpeg handle must be scoped on executors),
  * and the explode-to-frames layout.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true)
    )), nullable = true)))

  final case class AssetMeta(width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int], n_frames: Option[Int])
  final case class Asset(asset_id: Long, kind: String,
                         content: Array[Byte], meta: AssetMeta)
  final case class AssetFeature(asset_id: Long, kind: String, dim: Int,
                                feature: Array[Float])
  final case class Frame(asset_id: Long, frame_idx: Int, content: Array[Byte])

  /** STUB — deterministic stand-in for a real media codec. A production
    * deployment replaces this object (alone) with JNI/ffmpeg bindings;
    * nothing else changes.
    */
  object FakeCodec {
    /** "Decode" bytes to a fixed-dim float feature (byte histogram). */
    def decodeToFeature(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val hist = new Array[Float](dim)
      if (bytes != null) bytes.foreach(b => hist((b & 0xFF) % dim) += 1f)
      val n = math.max(1, if (bytes == null) 0 else bytes.length)
      hist.map(_ / n)
    }
    /** "Resize": keep every k-th byte — stands in for pixel resampling. */
    def resize(bytes: Array[Byte], k: Int): Array[Byte] =
      if (bytes == null) null
      else bytes.zipWithIndex.collect { case (b, i) if i % k == 0 => b }
    /** "Extract" frame i of a video payload (fixed-stride slice). */
    def frame(bytes: Array[Byte], i: Int, frameSize: Int = 64): Array[Byte] =
      if (bytes == null) Array.empty
      else bytes.slice(i * frameSize, (i + 1) * frameSize)
  }

  /** Deterministic synthetic asset table derived from a numeric id
    * column — payload bytes from repeated md5, metadata by kind.
    */
  def syntheticAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame =
    ids.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      unbase64(base64(repeat(unhex(md5(col(idCol).cast("string"))), 8))).as("content"))
      .withColumn("meta", struct(
        when(col("kind") === "image", lit(32)).cast("int").as("width"),
        when(col("kind") === "image", lit(32)).cast("int").as("height"),
        when(col("kind") === "audio", lit(16000)).cast("int").as("sample_rate"),
        when(col("kind") === "video", lit(4)).cast("int").as("n_frames")))

  /** Batch feature extraction: one codec per partition, rows streamed
    * through it — the executor-side shape a real decoder needs.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: val codec = NativeCodec.open()  — once per partition
      it.map(a => AssetFeature(a.asset_id, a.kind, dim,
        FakeCodec.decodeToFeature(a.content, dim)))
    }
  }

  /** Frame sampling: video assets explode to n_frames rows. */
  def sampleFrames(assets: Dataset[Asset]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = a.meta.n_frames.getOrElse(0)
      (0 until n).map(i => Frame(a.asset_id, i, FakeCodec.frame(a.content, i)))
    }
  }

  /** Metadata-preserving resize of image payloads. */
  def resizeImages(assets: Dataset[Asset], factor: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      if (a.kind != "image") a
      else a.copy(
        content = FakeCodec.resize(a.content, factor),
        meta = a.meta.copy(
          width = a.meta.width.map(_ / factor),
          height = a.meta.height.map(_ / factor)))
    }
  }
}
