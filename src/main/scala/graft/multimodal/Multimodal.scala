package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal columns (driver mandate): image/audio/video as opaque
  * BINARY columns with typed metadata, processed by per-partition
  * batch-shaped functions.
  *
  * Codec status by kind — ALL REAL as of round 6:
  *  - image: uncompressed 24-bit BMP, written and parsed by
  *    [[PureCodecs]] (pure JVM): header decode, bottom-up padded BGR
  *    pixel rows, bilinear/nearest resampling, luminance features.
  *  - audio: RIFF/WAVE PCM16, written and parsed by [[PureCodecs]]:
  *    chunk walk, sample decode, RMS/zero-crossing/amplitude-histogram
  *    features.
  *  - video: MJPEG-in-AVI — the same RIFF chunk grammar as WAV for the
  *    container, baseline JPEG per frame through the JDK's ImageIO
  *    (pure JVM, headless, byte-deterministic on this JDK). Real frame
  *    extraction and real pixel decode; H.264/VP9 would still need
  *    native codecs, and that boundary is now a per-profile statement
  *    rather than a stubbed kind.
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

  /** REAL pure-JVM codecs for the two formats that need no native
    * libraries: uncompressed 24-bit BMP and RIFF/WAVE PCM16. Every
    * byte written here round-trips through the parser, and the parsers
    * accept any conformant file of these profiles, not just our own
    * output.
    */
  object PureCodecs {

    // ImageIO defaults to a FILE-BACKED stream cache: every read/write
    // creates+deletes a temp file under java.io.tmpdir. The MJPEG path
    // does 4 encodes + 4 decodes per video asset, so at sf10 that is
    // ~10⁶ temp-file creations racing the shuffle spill for /tmp
    // metadata — measured as the codec rows' anomalous ~130×/decade
    // constant in the r10 sweep (plan itself is linear). Our payloads
    // are KBs; heap-backed streams are strictly better. Per-JVM static,
    // set once when the codec class loads on each executor.
    javax.imageio.ImageIO.setUseCache(false)

    // ---- little-endian helpers -------------------------------------
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def rd16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def rd32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

    // ---- BMP (24-bit uncompressed, BITMAPINFOHEADER) ----------------

    /** Encode RGB pixels (row-major, top-down, 0xRRGGBB) as a 24-bit
      * BMP: 14-byte file header + 40-byte info header + bottom-up
      * 4-byte-padded BGR rows.
      */
    def writeBmp(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == width * height, "pixel count mismatch")
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      val imageSize = (rowBytes + pad) * height
      val out = new java.io.ByteArrayOutputStream(54 + imageSize)
      out.write('B'); out.write('M')
      out.write(le32(54 + imageSize)); out.write(le32(0)); out.write(le32(54))
      out.write(le32(40)); out.write(le32(width)); out.write(le32(height))
      out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
      out.write(le32(imageSize)); out.write(le32(2835)); out.write(le32(2835))
      out.write(le32(0)); out.write(le32(0))
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val p = rgb(y * width + x)
          out.write(p & 0xFF); out.write((p >> 8) & 0xFF); out.write((p >> 16) & 0xFF)
          x += 1
        }
        var i = 0
        while (i < pad) { out.write(0); i += 1 }
        y -= 1
      }
      out.toByteArray
    }

    /** Decode a 24-bit uncompressed BMP to (width, height, top-down
      * row-major 0xRRGGBB pixels). Accepts both bottom-up (positive
      * biHeight) and top-down (negative biHeight — also conformant)
      * row order. Throws on other profiles and on truncated data.
      */
    def parseBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
      val dataOffset = rd32(bytes, 10)
      val width = rd32(bytes, 18)
      val rawHeight = rd32(bytes, 22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      require(rd16(bytes, 28) == 24, "only 24-bit BMP supported")
      require(rd32(bytes, 30) == 0, "only uncompressed BMP supported")
      require(width > 0 && height > 0, "degenerate BMP dimensions")
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      require(dataOffset >= 54 &&
        dataOffset.toLong + (height - 1).toLong * (rowBytes + pad) + rowBytes <= bytes.length,
        "truncated BMP pixel data")
      val rgb = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val rowStart = dataOffset + srcRow * (rowBytes + pad)
        var x = 0
        while (x < width) {
          val o = rowStart + x * 3
          rgb(y * width + x) =
            ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 1) & 0xFF) << 8) | (bytes(o) & 0xFF)
          x += 1
        }
        y += 1
      }
      (width, height, rgb)
    }

    /** Nearest-neighbor downsample by an integer factor — a REAL pixel
      * resample producing a valid BMP of the new dimensions.
      */
    def resizeBmp(bytes: Array[Byte], factor: Int): Array[Byte] = {
      val (w, h, rgb) = parseBmp(bytes)
      val nw = math.max(1, w / factor)
      val nh = math.max(1, h / factor)
      val out = new Array[Int](nw * nh)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          out(y * nw + x) = rgb((y * factor) * w + (x * factor))
          x += 1
        }
        y += 1
      }
      writeBmp(nw, nh, out)
    }

    /** Bilinear downsample by an integer factor — the DEFAULT resample
      * (VERDICT r5 item 8): each output pixel interpolates the four
      * source pixels around its back-projected center
      * (sx = (x+0.5)·factor − 0.5), per channel, half-up rounding —
      * pure integer/double arithmetic, deterministic. Anti-aliases
      * where nearest-neighbor keeps only one sample per block.
      */
    def resizeBmpBilinear(bytes: Array[Byte], factor: Int): Array[Byte] = {
      val (w, h, rgb) = parseBmp(bytes)
      val nw = math.max(1, w / factor)
      val nh = math.max(1, h / factor)
      val out = new Array[Int](nw * nh)
      def ch(p: Int, shift: Int): Int = (p >> shift) & 0xFF
      var y = 0
      while (y < nh) {
        val sy = (y + 0.5) * factor - 0.5
        val y0 = math.max(0, math.min(h - 1, math.floor(sy).toInt))
        val y1 = math.min(h - 1, y0 + 1)
        val fy = sy - y0
        var x = 0
        while (x < nw) {
          val sx = (x + 0.5) * factor - 0.5
          val x0 = math.max(0, math.min(w - 1, math.floor(sx).toInt))
          val x1 = math.min(w - 1, x0 + 1)
          val fx = sx - x0
          val (p00, p01) = (rgb(y0 * w + x0), rgb(y0 * w + x1))
          val (p10, p11) = (rgb(y1 * w + x0), rgb(y1 * w + x1))
          def lerp(shift: Int): Int = {
            val top = ch(p00, shift) * (1 - fx) + ch(p01, shift) * fx
            val bot = ch(p10, shift) * (1 - fx) + ch(p11, shift) * fx
            math.min(255, math.max(0, math.round(top * (1 - fy) + bot * fy).toInt))
          }
          out(y * nw + x) = (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
          x += 1
        }
        y += 1
      }
      writeBmp(nw, nh, out)
    }

    /** Image features from a decoded BMP: the shared luminance vector
      * of [[pixelFeatures]] (Rec.601 integer luma — deterministic).
      */
    def bmpFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val (_, _, rgb) = parseBmp(bytes)
      pixelFeatures(rgb, dim)
    }

    // ---- WAV (RIFF/WAVE, PCM16) -------------------------------------

    /** Encode mono PCM16 samples as a canonical 44-byte-header WAV. */
    def writeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new java.io.ByteArrayOutputStream(44 + dataSize)
      out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataSize))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
      out.write(le16(1)); out.write(le16(1)) // PCM, mono
      out.write(le32(sampleRate)); out.write(le32(sampleRate * 2))
      out.write(le16(2)); out.write(le16(16))
      out.write("data".getBytes("US-ASCII")); out.write(le32(dataSize))
      samples.foreach(s => out.write(le16(s & 0xFFFF)))
      out.toByteArray
    }

    /** Decode a PCM16 WAV by walking its RIFF chunks (tolerates extra
      * chunks like LIST before data). Returns (sampleRate, channels,
      * samples interleaved).
      */
    def parseWav(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
      var o = 12
      var sampleRate = 0
      var channels = 0
      var samples: Array[Short] = null
      while (o + 8 <= bytes.length && (sampleRate == 0 || samples == null)) {
        val id = new String(bytes, o, 4, "US-ASCII")
        val size = rd32(bytes, o + 4)
        // a negative/overlong size would stall or overrun the walk
        require(size >= 0 && o + 8 + size <= bytes.length,
          s"malformed WAV chunk '$id' (size $size)")
        id match {
          case "fmt " =>
            require(size >= 16, "fmt chunk too short")
            require(rd16(bytes, o + 8) == 1, "only PCM supported")
            channels = rd16(bytes, o + 10)
            sampleRate = rd32(bytes, o + 12)
            require(rd16(bytes, o + 22) == 16, "only 16-bit supported")
          case "data" =>
            val n = size / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = rd16(bytes, o + 8 + i * 2).toShort; i += 1 }
          case _ => // skip unknown chunk
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
      (sampleRate, channels, samples)
    }

    // ---- AVI (RIFF container, MJPEG 'MJPG' video stream) ------------
    //
    // Round 6: the video stub is gone for the MJPEG profile. The
    // container is the same RIFF chunk grammar as WAV (walker shared
    // conceptually), and the per-frame codec is baseline JPEG through
    // the JDK's own ImageIO — pure JVM, headless-safe, and measured
    // byte-deterministic on this JDK. H.264/VP9 would still need
    // native codecs; MJPEG-in-AVI is a real, widely-produced format
    // (motion-JPEG cameras, OpenCV default) and every byte written
    // here round-trips through the parser.

    /** Encode RGB pixels as a baseline JPEG via the JDK encoder. */
    def encodeJpeg(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, width, height, rgb, 0, width)
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer")
      bos.toByteArray
    }

    /** Decode a JPEG to (width, height, 0xRRGGBB pixels). */
    def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      (w, h, img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF))
    }

    /** Write an MJPEG AVI: RIFF('AVI ') { LIST hdrl { avih, LIST strl
      * { strh 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST movi
      * { '00dc' <jpeg> … } }.
      */
    def writeMjpegAvi(width: Int, height: Int, frames: Seq[Array[Int]],
                      fps: Int = 10): Array[Byte] = {
      def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def chunk(id: String, payload: Array[Byte]): Array[Byte] =
        fourcc(id) ++ le32(payload.length) ++ payload ++
          (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      def list(tpe: String, payload: Array[Byte]): Array[Byte] =
        chunk("LIST", fourcc(tpe) ++ payload)
      val jpegs = frames.map(f => encodeJpeg(width, height, f))
      val avih = Array(1000000 / fps, 0, 0, 0, frames.length, 0, 1, 0,
        width, height, 0, 0, 0, 0).flatMap(le32)
      val strh = fourcc("vids") ++ fourcc("MJPG") ++
        Array(0, 0, 0, 1, fps, 0, frames.length, 0, 0, 0).flatMap(le32) ++
        le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
      val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
        fourcc("MJPG") ++ le32(width * height * 3) ++
        Array(0, 0, 0, 0).flatMap(le32)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    /** Parse an MJPEG AVI: returns (width, height, per-frame JPEG
      * payloads). Walks the RIFF tree recursively (tolerates unknown
      * chunks/lists — real AVIs carry idx1, INFO, JUNK), takes dims
      * from the strf BITMAPINFOHEADER and frames from the movi list's
      * compressed-video chunks.
      */
    def parseMjpegAvi(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ", "not an AVI")
      var width = 0; var height = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = new String(bytes, o, 4, "US-ASCII")
          val size = rd32(bytes, o + 4)
          require(size >= 0 && o + 8 + size <= to, s"malformed AVI chunk '$id'")
          id match {
            case "LIST" => walk(o + 12, o + 8 + size)
            case "strf" => width = rd32(bytes, o + 12); height = rd32(bytes, o + 16)
            case "00dc" | "00db" =>
              frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
            case _ => // skip avih/strh/idx1/JUNK/...
          }
          o += 8 + size + (size & 1)
        }
      }
      walk(12, bytes.length)
      require(width > 0 && height > 0 && frames.nonEmpty, "missing strf/movi frames")
      (width, height, frames.toSeq)
    }

    /** Video features: per-frame JPEG decode, then the same luminance
      * feature vector as images, averaged across frames.
      */
    def aviFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val (_, _, jpegs) = parseMjpegAvi(bytes)
      val per = jpegs.map { j =>
        val (_, _, rgb) = decodeJpeg(j)
        pixelFeatures(rgb, dim)
      }
      val out = new Array[Float](dim)
      per.foreach(f => (0 until dim).foreach(i => out(i) += f(i)))
      (0 until dim).foreach(i => out(i) /= per.size)
      out
    }

    /** Shared luminance features for any decoded RGB frame: mean luma,
      * bright fraction, (dim−2)-bin luma histogram (Rec.601 integer).
      */
    def pixelFeatures(rgb: Array[Int], dim: Int): Array[Float] = {
      val f = new Array[Float](dim)
      val bins = dim - 2
      var lumaSum = 0L
      var bright = 0
      rgb.foreach { p =>
        val luma = ((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587 + (p & 0xFF) * 114) / 1000
        lumaSum += luma
        if (luma > 127) bright += 1
        f(2 + luma * bins / 256) += 1f
      }
      val n = math.max(1, rgb.length)
      f(0) = lumaSum.toFloat / n / 255f
      f(1) = bright.toFloat / n
      var i = 2
      while (i < dim) { f(i) /= n; i += 1 }
      f
    }

    /** Audio features from decoded PCM: RMS level, zero-crossing rate,
      * then a (dim−2)-bin |amplitude| histogram.
      */
    def wavFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val (_, _, samples) = parseWav(bytes)
      val f = new Array[Float](dim)
      val bins = dim - 2
      var sumSq = 0.0
      var crossings = 0
      var i = 0
      while (i < samples.length) {
        val s = samples(i).toInt
        sumSq += s.toDouble * s
        if (i > 0 && ((s >= 0) != (samples(i - 1) >= 0))) crossings += 1
        f(2 + math.min(bins - 1, math.abs(s) * bins / 32768)) += 1f
        i += 1
      }
      val n = math.max(1, samples.length)
      f(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
      f(1) = crossings.toFloat / n
      var j = 2
      while (j < dim) { f(j) /= n; j += 1 }
      f
    }

    /** 64-bit perceptual difference hash (dHash) of a BMP payload:
      * decode, integer-luminance (299·R+587·G+114·B), area-average
      * onto an 8×8 grid, then bit(8r+c) = 1 iff cell (r,c) is brighter
      * than its right neighbor (row-cyclic). PURE integer arithmetic —
      * cells of unequal pixel count (w,h not multiples of 8) compare
      * via cross-multiplied sums, so the hash is exact for any image
      * size and identical across JVMs/platforms. Near-duplicate images
      * differ in few bits; see the banded Hamming join in
      * [[graft.queries.MultimodalDedup]].
      */
    def dHash64(bytes: Array[Byte]): Long = {
      val (w, h, rgb) = parseBmp(bytes)
      require(w >= 8 && h >= 8, s"dHash needs >= 8x8, got ${w}x$h")
      val sum = Array.ofDim[Long](8, 8)
      val cnt = Array.ofDim[Long](8, 8)
      var y = 0
      while (y < h) {
        val r = y * 8 / h
        var x = 0
        while (x < w) {
          val c = x * 8 / w
          val p = rgb(y * w + x)
          sum(r)(c) += ((p >> 16 & 0xFF) * 299 + (p >> 8 & 0xFF) * 587 +
            (p & 0xFF) * 114).toLong
          cnt(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var rr = 0
      while (rr < 8) {
        var cc = 0
        while (cc < 8) {
          val nc = (cc + 1) % 8
          if (sum(rr)(cc) * cnt(rr)(nc) > sum(rr)(nc) * cnt(rr)(cc))
            bits |= 1L << (rr * 8 + cc)
          cc += 1
        }
        rr += 1
      }
      bits
    }

    /** 64-bit perceptual audio fingerprint of a PCM16 WAV payload —
      * chromaprint's core idea (sign bits of band-energy DIFFERENCES
      * across adjacent time frames) with the spectral estimate replaced
      * by lag autocorrelation, its Wiener–Khinchin integer-exact proxy:
      * decode, split into 8 equal time windows, compute per-window
      * autocorrelations at the 8 Fibonacci lags {1,2,3,5,8,13,21,34}
      * as pure Long sums over sample pairs FULLY INSIDE the window
      * (a perturbation confined to window v can therefore move only
      * windows v−1 and v's bits — the construction bound
      * [[Multimodal.nearDupAudio]] and its spec rely on), then
      * bit(8w+j) = 1 iff R_w(L_j) > R_{(w+1)%8}(L_j) — the temporal
      * difference, which measured both more discriminative (cross-
      * timbre median Hamming 29 vs 11) and colder-bucketed (max band
      * bucket 15 vs 38 on the planted fixture) than dHash64's
      * within-row comparison; the Fibonacci spacing samples the
      * period-p triangle autocorrelation at varied phases instead of
      * riding its monotone initial decay. No floats anywhere —
      * identical across JVMs/platforms.
      */
    def audioHash64(bytes: Array[Byte]): Long = {
      val lags = Array(1, 2, 3, 5, 8, 13, 21, 34)
      val (_, _, samples) = parseWav(bytes)
      val n = samples.length
      require(n >= 64, s"audioHash needs >= 64 samples, got $n")
      val r = Array.ofDim[Long](8, 8)
      var w = 0
      while (w < 8) {
        val start = w * n / 8
        val end = (w + 1) * n / 8
        var j = 0
        while (j < 8) {
          val lag = lags(j)
          var acc = 0L
          var i = start
          while (i + lag < end) {
            acc += samples(i).toLong * samples(i + lag)
            i += 1
          }
          r(w)(j) = acc
          j += 1
        }
        w += 1
      }
      var bits = 0L
      w = 0
      while (w < 8) {
        var j = 0
        while (j < 8) {
          if (r(w)(j) > r((w + 1) % 8)(j)) bits |= 1L << (w * 8 + j)
          j += 1
        }
        w += 1
      }
      bits
    }
  }

  /** Deterministic synthetic asset table derived from a numeric id
    * column. ALL THREE payload kinds are REAL files now (24-bit BMP /
    * PCM16 WAV / MJPEG AVI — round 6 retired the video stub for the
    * MJPEG profile; H.264/VP9 would still need native codecs).
    * Metadata mirrors the actual encoded headers.
    */
  def syntheticAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      (id % 3) match {
        case 0 => // image: 16×16 gradient-ish pattern
          val rgb = Array.tabulate(16 * 16) { i =>
            val (x, y) = (i % 16, i / 16)
            val r = (id * 31 + x * 7 + y * 13) % 256
            val g = (id * 17 + x * 11 + y * 3) % 256
            val b = (id * 29 + x * 5 + y * 19) % 256
            (r.toInt << 16) | (g.toInt << 8) | b.toInt
          }
          Asset(id, "image", PureCodecs.writeBmp(16, 16, rgb),
            AssetMeta(Some(16), Some(16), None, None))
        case 1 => // audio: 400-sample square wave, period/amp from the id
          val period = (id % 37 + 5).toInt
          val amp = (8000 + (id % 8) * 2000).toInt
          val samples = Array.tabulate(400)(i =>
            (if ((i / period) % 2 == 0) amp else -amp).toShort)
          Asset(id, "audio", PureCodecs.writeWav(samples, 16000),
            AssetMeta(None, None, Some(16000), None))
        case _ => // video: REAL 4-frame 16×16 MJPEG AVI
          val frames = (0 until 4).map { f =>
            Array.tabulate(16 * 16) { i =>
              val (x, y) = (i % 16, i / 16)
              val r = (id * 31 + f * 41 + x * 7 + y * 13) % 256
              val g = (id * 17 + f * 23 + x * 11 + y * 3) % 256
              val b = (id * 29 + f * 37 + x * 5 + y * 19) % 256
              (r.toInt << 16) | (g.toInt << 8) | b.toInt
            }
          }
          Asset(id, "video", PureCodecs.writeMjpegAvi(16, 16, frames),
            AssetMeta(Some(16), Some(16), None, Some(4)))
      }
    }.toDF()
  }

  /** Image-only asset table with PLANTED near-duplicate groups for the
    * perceptual-hash dedup row: ids in the same `id div 4` group share
    * one base gradient pattern; each id perturbs ONE 2×2 pixel block
    * (position and color from `id % 4`; the 0-variant is the untouched
    * canonical). A 2×2 block of the 16×16 fixture is exactly one cell
    * of the 8×8 dHash pool, so two group-mates differ in ≤ 2 cells →
    * ≤ 4 hash bits: within-group Hamming ≤ 4 BY CONSTRUCTION (the
    * spec's recall gate), while distinct base gradients scatter to
    * large distances.
    */
  def nearDupImages(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val base = id / 4
      val rgb = Array.tabulate(16 * 16) { i =>
        val (x, y) = (i % 16, i / 16)
        val r = (base * 31 + x * 7 + y * 13) % 256
        val g = (base * 17 + x * 11 + y * 3) % 256
        val b = (base * 29 + x * 5 + y * 19) % 256
        (r.toInt << 16) | (g.toInt << 8) | b.toInt
      }
      val v = (id % 4).toInt
      if (v > 0) {
        val bx = v * 2           // 2px-aligned block → one dHash pool cell
        val by = ((v + 2) % 8) * 2
        val color = if (v % 2 == 0) 0xFFFFFF else 0x000000
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            rgb((by + dy) * 16 + (bx + dx)) = color
            dx += 1
          }
          dy += 1
        }
      }
      Asset(id, "image", PureCodecs.writeBmp(16, 16, rgb),
        AssetMeta(Some(16), Some(16), None, None))
    }.toDF()
  }

  /** Audio-only asset table with PLANTED near-duplicate groups for the
    * perceptual audio dedup row — [[nearDupImages]]'s PCM16 twin. Ids
    * in the same `id div 4` group share one base two-tone square wave
    * (periods p1 = base%37+5, p2 = base%41+3 — 1517 distinct timbres
    * before the synthesis repeats, the fixture-richness bound); each
    * non-zero variant overwrites a 6-sample "click" placed ENTIRELY
    * inside time window v (samples 50v+10..50v+15 of 400), so by
    * [[PureCodecs.audioHash64]]'s window-confined autocorrelation only
    * windows v−1 and v's bits can move (R_v feeds those two temporal
    * comparisons): within-group Hamming ≤ 16 against the canonical,
    * ≤ 24 for adjacent variants and ≤ 32 for the v=1/v=3 pair (four
    * distinct touched windows; measured ≤ 17 across 25 timbres), and
    * with v ∈ {1,2,3} every group-mate pair agrees EXACTLY on bands 2
    * and 3 — banded recall 1 by construction, which AudioHashDedupSpec
    * gates against exact sample distance.
    */
  def nearDupAudio(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      val base = id / 4
      val p1 = (base % 37 + 5).toInt
      val p2 = (base % 41 + 3).toInt
      val amp = 8000
      val samples = Array.tabulate(400) { i =>
        val t1 = if ((i / p1) % 2 == 0) amp else -amp
        val t2 = if ((i / p2) % 2 == 0) amp / 4 else -amp / 4
        (t1 + t2).toShort
      }
      val v = (id % 4).toInt
      if (v > 0) {
        var i = 0
        while (i < 6) { samples(50 * v + 10 + i) = (amp / 2).toShort; i += 1 }
      }
      Asset(id, "audio", PureCodecs.writeWav(samples, 16000),
        AssetMeta(None, None, Some(16000), None))
    }.toDF()
  }

  /** Batch feature extraction: one codec per partition, rows streamed
    * through it — the executor-side shape a real decoder needs. All
    * three kinds decode for REAL (BMP / WAV / MJPEG-AVI parsers).
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feat = a.kind match {
          case "image" => PureCodecs.bmpFeatures(a.content, dim)
          case "audio" => PureCodecs.wavFeatures(a.content, dim)
          case _       => PureCodecs.aviFeatures(a.content, dim)
        }
        AssetFeature(a.asset_id, a.kind, dim, feat)
      }
    }
  }

  /** Frame sampling: video assets explode to one row per REAL frame —
    * the payload of each emitted row is that frame's JPEG bytes from
    * the AVI movi list (decodable standalone).
    */
  def sampleFrames(assets: Dataset[Asset]): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val (_, _, jpegs) = PureCodecs.parseMjpegAvi(a.content)
      jpegs.zipWithIndex.map { case (j, i) => Frame(a.asset_id, i, j) }
    }
  }

  /** REAL metadata-preserving resize of image payloads through the BMP
    * codec; the new metadata comes from the re-encoded file's actual
    * header. `method` = "bilinear" (default — anti-aliased, see
    * [[PureCodecs.resizeBmpBilinear]]) or "nearest" (the original
    * sample-and-hold path, kept for the declared multimodal_resize
    * row's pinned bytes).
    */
  def resizeImages(assets: Dataset[Asset], factor: Int,
                   method: String = "bilinear"): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    require(method == "bilinear" || method == "nearest",
      s"unknown resample method '$method'")
    assets.map { a =>
      if (a.kind != "image") a
      else {
        val resized =
          if (method == "nearest") PureCodecs.resizeBmp(a.content, factor)
          else PureCodecs.resizeBmpBilinear(a.content, factor)
        val (w, h, _) = PureCodecs.parseBmp(resized)
        a.copy(content = resized,
          meta = a.meta.copy(width = Some(w), height = Some(h)))
      }
    }
  }
}
