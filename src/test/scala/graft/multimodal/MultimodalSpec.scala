package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.{Tables => T}

class MultimodalSpec extends SparkSpec {

  private def assets() = {
    import spark.implicits._
    Multimodal.syntheticAssets(
      spark, T.documents(spark, sf()).select(col("doc_id")), "doc_id")
      .as[Multimodal.Asset]
  }

  test("synthetic asset table matches the declared multimodal schema") {
    val df = Multimodal.syntheticAssets(
      spark, T.documents(spark, sf()).select(col("doc_id")), "doc_id")
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("audio", "image", "video"))
    // payloads are non-empty and deterministic (md5-derived)
    val r = df.filter(col("asset_id") === 3).select("content").collect().head
    assert(r.getAs[Array[Byte]](0).length == 128) // 16-byte md5 × 8
  }

  test("feature extraction keeps batch shape: one row per asset, fixed dim") {
    val feats = Multimodal.extractFeatures(assets(), dim = 16)
    assert(feats.count() == 500)
    val f = feats.filter(_.asset_id == 1).collect().head
    assert(f.feature.length == 16)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-5) // normalized histogram
    // deterministic across runs
    val again = Multimodal.extractFeatures(assets(), dim = 16)
      .filter(_.asset_id == 1).collect().head
    assert(f.feature.toSeq == again.feature.toSeq)
  }

  test("video frame sampling explodes to n_frames rows per video") {
    import spark.implicits._
    val nVideos = assets().filter(_.kind == "video").count()
    val frames = Multimodal.sampleFrames(assets())
    assert(frames.count() == nVideos * 4)
    val perAsset = frames.groupByKey(_.asset_id).count().collect().map(_._2).toSet
    assert(perAsset == Set(4L))
  }

  test("image resize halves metadata dims and shrinks payload") {
    val resized = Multimodal.resizeImages(assets(), factor = 2)
    val img = resized.filter(_.kind == "image").collect().head
    assert(img.meta.width.contains(16) && img.meta.height.contains(16))
    assert(img.content.length == 64) // every 2nd of 128 bytes
    // non-images pass through untouched
    val audio = resized.filter(_.kind == "audio").collect().head
    assert(audio.content.length == 128)
  }
}
