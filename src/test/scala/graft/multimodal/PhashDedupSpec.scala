package graft.multimodal

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.multimodal.Multimodal.PureCodecs
import graft.queries.MultimodalDedup

/** Gate for multimodal_phash_dedup: dHash determinism, the planted
  * within-group Hamming bound, and banded-join recall vs the exact
  * pixel-level ground truth.
  */
class PhashDedupSpec extends SparkSpec {

  private lazy val assets: Map[Long, Array[Byte]] = {
    import spark.implicits._
    Multimodal
      .nearDupImages(spark, spark.range(0, 100).toDF("id"), "id")
      .as[Multimodal.Asset]
      .collect()
      .map(a => a.asset_id -> a.content)
      .toMap
  }

  private def pixelL1(a: Array[Byte], b: Array[Byte]): Long = {
    val (_, _, pa) = PureCodecs.parseBmp(a)
    val (_, _, pb) = PureCodecs.parseBmp(b)
    pa.zip(pb).map { case (x, y) =>
      (math.abs((x >> 16 & 0xFF) - (y >> 16 & 0xFF)) +
        math.abs((x >> 8 & 0xFF) - (y >> 8 & 0xFF)) +
        math.abs((x & 0xFF) - (y & 0xFF))).toLong
    }.sum
  }

  test("dHash64 is deterministic and size-agnostic") {
    val img = assets(0L)
    assert(PureCodecs.dHash64(img) == PureCodecs.dHash64(img.clone()))
    // resized payload keeps a close hash (area pooling survives 2x)
    val up = PureCodecs.resizeBmpBilinear(img, 2)
    val d = java.lang.Long.bitCount(
      PureCodecs.dHash64(img) ^ PureCodecs.dHash64(up))
    assert(d <= 8, s"resize moved the hash $d bits")
  }

  test("planted near-dup groups: within-group Hamming <= 4 by construction") {
    val hashes = assets.map { case (id, b) => id -> PureCodecs.dHash64(b) }
    val bad = for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && a / 4 == b / 4
      d = java.lang.Long.bitCount(ha ^ hb) if d > 4
    } yield (a, b, d)
    assert(bad.isEmpty, s"within-group pairs over bound: $bad")
  }

  test("banded join recall = 1 vs exact pixel ground truth") {
    // ground truth: pairs whose exact pixel L1 distance is tiny
    // (within-group perturbations touch <= 8 pixels; cross-group base
    // gradients differ across most of the image)
    // .toSeq first: a for-comprehension over a Map yields a Map, where
    // same-first-element pairs silently overwrite each other
    val truth = (for {
      (a, ba) <- assets.toSeq; (b, bb) <- assets.toSeq
      if a < b && pixelL1(ba, bb) <= 8L * 3 * 255
    } yield (a, b)).toSet
    assert(truth.nonEmpty)
    // the declared row's candidate machinery, re-run at pair granularity:
    // 16-bit bands with the hot-bucket (> 64) suppression cap
    val hashes = assets.toSeq.map { case (id, b) => id -> PureCodecs.dHash64(b) }
    val bucketSize = hashes
      .flatMap { case (_, h) => (0 until 4).map(j => (j, (h >> (j * 16)) & 65535)) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val found = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 6
      if (0 until 4).exists { j =>
        val (ka, kb) = ((ha >> (j * 16)) & 65535, (hb >> (j * 16)) & 65535)
        ka == kb && bucketSize((j, ka)) <= 64
      }
    } yield (a, b)).toSet
    val missed = truth -- found
    assert(missed.isEmpty, s"pHash dedup missed true near-dups: $missed")
  }

  test("declared row returns a bounded confirmed-pair histogram") {
    val rows = MultimodalDedup.multimodalPhashDedup.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
    // hamming <= 6 per the row's threshold
    assert(rows.forall(_.getAs[Int]("hamming") <= 6))
  }
}
