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

  test("BMP codec round-trips pixels exactly and rejects other profiles") {
    val rgb = Array.tabulate(7 * 5)(i => (i * 37 + 11) % 0xFFFFFF) // odd width → padded rows
    val bytes = Multimodal.PureCodecs.writeBmp(7, 5, rgb)
    val (w, h, back) = Multimodal.PureCodecs.parseBmp(bytes)
    assert(w == 7 && h == 5)
    assert(back.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.PureCodecs.parseBmp("not a bitmap at all".getBytes)
    }
  }

  test("WAV codec round-trips PCM16 samples exactly, tolerating extra chunks") {
    val samples = Array.tabulate(321)(i => ((i * 997) % 65536 - 32768).toShort)
    val bytes = Multimodal.PureCodecs.writeWav(samples, 16000)
    val (rate, channels, back) = Multimodal.PureCodecs.parseWav(bytes)
    assert(rate == 16000 && channels == 1)
    assert(back.toSeq == samples.toSeq)
    // splice an unknown word-aligned chunk between fmt and data — the
    // parser must walk past it (real WAVs carry LIST/INFO chunks)
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = bytes.slice(0, 36) ++ junk ++ bytes.slice(36, bytes.length)
    val (rate2, _, back2) = Multimodal.PureCodecs.parseWav(spliced)
    assert(rate2 == 16000 && back2.toSeq == samples.toSeq)
  }

  test("synthetic asset table matches the declared multimodal schema with real payloads") {
    val df = Multimodal.syntheticAssets(
      spark, T.documents(spark, sf()).select(col("doc_id")), "doc_id")
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("audio", "image", "video"))
    // image payloads are REAL BMPs: 54-byte headers + 16 rows × 48 bytes
    val img = df.filter(col("kind") === "image").select("content").collect().head
      .getAs[Array[Byte]](0)
    assert(img.length == 54 + 16 * 48)
    val (w, h, _) = Multimodal.PureCodecs.parseBmp(img)
    assert(w == 16 && h == 16)
    // audio payloads are REAL WAVs: 44-byte header + 400 PCM16 samples
    val wav = df.filter(col("kind") === "audio").select("content").collect().head
      .getAs[Array[Byte]](0)
    assert(wav.length == 44 + 400 * 2)
    assert(Multimodal.PureCodecs.parseWav(wav)._1 == 16000)
    // video payloads are REAL MJPEG AVIs: RIFF container, 4 JPEG frames
    val vid = df.filter(col("kind") === "video").select("content").collect().head
      .getAs[Array[Byte]](0)
    val (vw, vh, jpegs) = Multimodal.PureCodecs.parseMjpegAvi(vid)
    assert(vw == 16 && vh == 16 && jpegs.length == 4)
    // each frame is a standalone decodable baseline JPEG (SOI marker)
    jpegs.foreach { j =>
      assert((j(0) & 0xFF) == 0xFF && (j(1) & 0xFF) == 0xD8, "missing JPEG SOI")
      val (fw, fh, _) = Multimodal.PureCodecs.decodeJpeg(j)
      assert(fw == 16 && fh == 16)
    }
  }

  test("MJPEG AVI codec round-trips frames within JPEG loss; rejects non-AVI bytes") {
    // smooth gradient frames survive baseline JPEG with small error
    val frames = (0 until 3).map { f =>
      Array.tabulate(16 * 16) { i =>
        val v = ((i % 16) * 8 + (i / 16) * 8 + f * 10) % 256
        (v << 16) | (v << 8) | v
      }
    }
    val avi = Multimodal.PureCodecs.writeMjpegAvi(16, 16, frames)
    val (w, h, jpegs) = Multimodal.PureCodecs.parseMjpegAvi(avi)
    assert(w == 16 && h == 16 && jpegs.length == 3)
    frames.zip(jpegs).foreach { case (orig, j) =>
      val (_, _, back) = Multimodal.PureCodecs.decodeJpeg(j)
      val mae = orig.zip(back).map { case (a, b) =>
        math.abs((a & 0xFF) - (b & 0xFF))
      }.sum.toDouble / orig.length
      assert(mae < 8.0, s"JPEG round-trip error too large: $mae")
    }
    intercept[IllegalArgumentException] {
      Multimodal.PureCodecs.parseMjpegAvi("definitely not an avi".getBytes)
    }
  }

  test("feature extraction keeps batch shape: one row per asset, fixed dim, deterministic") {
    val feats = Multimodal.extractFeatures(assets(), dim = 16)
    assert(feats.count() == 500)
    val byKind = feats.collect().groupBy(_.kind)
    assert(byKind.keySet == Set("image", "audio", "video"))
    byKind.values.foreach(fs => assert(fs.forall(_.feature.length == 16)))
    // audio features reflect the REAL decode: the square wave's
    // zero-crossing rate is ~1/period, strictly between 0 and 0.5
    val zcr = byKind("audio").map(_.feature(1))
    assert(zcr.forall(z => z > 0f && z < 0.5f))
    // image features reflect the REAL decode: mean luminance in (0, 1)
    val luma = byKind("image").map(_.feature(0))
    assert(luma.forall(l => l > 0f && l < 1f))
    // deterministic across runs
    val f = byKind("image").minBy(_.asset_id)
    val again = Multimodal.extractFeatures(assets(), dim = 16)
      .filter(_.kind == "image").collect().minBy(_.asset_id)
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

  test("image resize REALLY resamples pixels: new header dims, parseable output") {
    val resized = Multimodal.resizeImages(assets(), factor = 2)
    val img = resized.filter(_.kind == "image").collect().head
    assert(img.meta.width.contains(8) && img.meta.height.contains(8))
    val (w, h, rgb) = Multimodal.PureCodecs.parseBmp(img.content)
    assert(w == 8 && h == 8 && rgb.length == 64)
    assert(img.content.length == 54 + 8 * 24) // 8 rows × 24 bytes (already aligned)
    // non-images pass through untouched
    val audio = resized.filter(_.kind == "audio").collect().head
    assert(audio.content.length == 44 + 400 * 2)
  }

  test("bilinear resize (default) round-trips and beats nearest-neighbor MSE on a gradient") {
    // 32×32 diagonal gradient: the analytic value at any (x, y) is
    // known, so the ideal ×2 downsample is the gradient sampled at the
    // back-projected pixel centers. Bilinear interpolates a linear
    // function exactly (up to rounding); NN is off by the half-pixel
    // phase — so bilinear MSE must be strictly smaller.
    def grad(x: Double, y: Double): Int = math.round((x + y) * 255 / 62.0).toInt
    val rgb = Array.tabulate(32 * 32) { i =>
      val v = grad(i % 32, i / 32); (v << 16) | (v << 8) | v
    }
    val bmp = Multimodal.PureCodecs.writeBmp(32, 32, rgb)
    def mse(resized: Array[Byte]): Double = {
      val (w, h, px) = Multimodal.PureCodecs.parseBmp(resized)
      assert(w == 16 && h == 16)
      px.zipWithIndex.map { case (p, i) =>
        val ideal = grad((i % 16 + 0.5) * 2 - 0.5, (i / 16 + 0.5) * 2 - 0.5)
        val d = (p & 0xFF) - ideal
        d.toDouble * d
      }.sum / px.length
    }
    val mseBilinear = mse(Multimodal.PureCodecs.resizeBmpBilinear(bmp, 2))
    val mseNearest = mse(Multimodal.PureCodecs.resizeBmp(bmp, 2))
    info(f"gradient fixture MSE: bilinear=$mseBilinear%.3f nearest=$mseNearest%.3f")
    assert(mseBilinear < mseNearest,
      f"bilinear ($mseBilinear%.3f) must beat nearest ($mseNearest%.3f)")
    assert(mseBilinear < 1.0, f"bilinear on a linear gradient should be ~exact, got $mseBilinear%.3f")

    // the dataset-level default is bilinear and still emits parseable
    // BMPs with correct headers
    val resized = Multimodal.resizeImages(assets(), factor = 2)
    val img = resized.filter(_.kind == "image").collect().head
    val (w, h, _) = Multimodal.PureCodecs.parseBmp(img.content)
    assert(w == 8 && h == 8)
    assert(img.meta.width.contains(8) && img.meta.height.contains(8))
  }
}
