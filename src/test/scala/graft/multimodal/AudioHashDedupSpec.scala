package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.PureCodecs
import graft.queries.MultimodalDedup

/** Gate for multimodal_audiohash_dedup: fingerprint determinism, the
  * window-confinement construction bound, and banded-join recall vs
  * exact PCM sample distance — the audio twin of PhashDedupSpec.
  */
class AudioHashDedupSpec extends SparkSpec {

  private lazy val assets: Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal
      .nearDupAudio(spark, spark.range(0, 100).toDF("id"), "id")
      .as[Multimodal.Asset]
      .collect()
      .map(a => a.asset_id -> a.content)
      .toMap
  }

  private def nDiffSamples(a: Array[Byte], b: Array[Byte]): Int = {
    val (_, _, sa) = PureCodecs.parseWav(a)
    val (_, _, sb) = PureCodecs.parseWav(b)
    sa.zip(sb).count { case (x, y) => x != y }
  }

  test("audioHash64 is deterministic and pure-integer") {
    val wav = assets(0L)
    assert(PureCodecs.audioHash64(wav) == PureCodecs.audioHash64(wav.clone()))
  }

  test("a click confined to window v moves ONLY windows v-1 and v's bits") {
    // canonical id 4k vs variant 4k+v: R_v feeds the temporal
    // comparisons of windows v-1 and v, so the xor must fit inside
    // bits [8(v-1), 8v+8) — the construction audioHash64's
    // window-confined autocorrelation guarantees
    for (base <- 0L until 25L; v <- 1 to 3) {
      val x = PureCodecs.audioHash64(assets(base * 4)) ^
        PureCodecs.audioHash64(assets(base * 4 + v))
      val windowMask = (0xFFL << (8 * (v - 1))) | (0xFFL << (8 * v))
      assert((x & ~windowMask) == 0L,
        f"base $base variant $v leaked outside windows ${v - 1},$v: $x%016x")
    }
  }

  test("planted groups: within-group Hamming <= 24 measured, bands 2+3 exactly shared") {
    val hashes = assets.map { case (id, b) => id -> PureCodecs.audioHash64(b) }
    for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && a / 4 == b / 4
    } {
      val d = java.lang.Long.bitCount(ha ^ hb)
      assert(d <= 24, s"pair ($a,$b) Hamming $d over the confirm radius")
      // v <= 3 touches windows 0..3 only: bands 2 and 3 match EXACTLY
      for (j <- 2 to 3)
        assert(((ha >> (j * 16)) & 65535) == ((hb >> (j * 16)) & 65535),
          s"pair ($a,$b) disagrees on construction-shared band $j")
    }
  }

  test("banded join recall = 1 vs exact sample ground truth") {
    // ground truth: group-mate perturbations touch <= 12 of 400
    // samples; distinct timbres differ almost everywhere
    val truth = (for {
      (a, ba) <- assets.toSeq; (b, bb) <- assets.toSeq
      if a < b && nDiffSamples(ba, bb) <= 12
    } yield (a, b)).toSet
    assert(truth.nonEmpty)
    val hashes = assets.toSeq.map { case (id, b) => id -> PureCodecs.audioHash64(b) }
    val bucketSize = hashes
      .flatMap { case (_, h) => (0 until 4).map(j => (j, (h >> (j * 16)) & 65535)) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val found = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 24
      if (0 until 4).exists { j =>
        val (ka, kb) = ((ha >> (j * 16)) & 65535, (hb >> (j * 16)) & 65535)
        ka == kb && bucketSize((j, ka)) <= 64
      }
    } yield (a, b)).toSet
    val missed = truth -- found
    assert(missed.isEmpty, s"audio dedup missed true near-dups: $missed")
  }

  test("declared row returns a bounded confirmed-pair histogram") {
    val rows = MultimodalDedup.multimodalAudiohashDedup.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
    assert(rows.forall(_.getAs[Int]("hamming") <= 24))
  }
}
