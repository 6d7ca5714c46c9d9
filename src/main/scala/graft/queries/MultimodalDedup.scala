package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}
import graft.multimodal.Multimodal

/** Perceptual-hash image dedup (VERDICT r8 item 3) — closes the
  * multimodal↔dedup gap: the binary-payload twin of
  * dedup_simhash_banded. Pipeline: decode BMP payloads → 64-bit dHash
  * per image (PureCodecs.dHash64, per-partition codec batch) → banded
  * Hamming join (8 bands of 8 bits; by pigeonhole, recall is EXACTLY 1
  * for Hamming ≤ 7) → exact Hamming verification on candidates only →
  * confirmed-pair histogram. Rows-only (B6-style: payload hashing is
  * not SQL-expressible in DuckDB); the semantics are gated by
  * PhashDedupSpec's recall-vs-exact-pixel-distance check instead.
  *
  * Scale shape: fingerprinting is one linear codec pass; the join cost
  * is bucket collisions, not n² — PROVIDED hot buckets are suppressed.
  * Perceptual hashes of low-texture images cluster (whole bands go
  * 0x8080 for any monotone gradient), so without a cap the flooded
  * buckets degenerate the band join toward n² — the same failure class
  * as r8's b6_lsh_embedding_near. Two levers, both standard:
  * 16-bit bands (4×65536 buckets instead of 8×256) and a bucket-size
  * cap (size > 64 ⇒ the band value is non-discriminative; drop the
  * bucket, not the docs). Recall after the cap: guaranteed for any
  * pair sharing ≥ 1 sub-cap band — which the planted groups satisfy by
  * construction (group-mates always share the base-dependent high band
  * that distinguishes their group; PhashDedupSpec gates it), and which
  * holds for real corpora exactly when a pair agrees on anything
  * distinctive at all. The bucket-count frame is ≤ 4·|distinct values|
  * rows — broadcastable at any corpus scale.
  */
object MultimodalDedup {

  val multimodalPhashDedup: Q = Q.noOracle("multimodal_phash_dedup") { (s, d) =>
    import s.implicits._
    // few-file straggler guard: the codec synthesis + dHash is heavy
    // per-row work downstream of the id scan (r16; Tables.spreadExplodeInput)
    val assets = Multimodal
      .nearDupImages(s,
        T.spreadExplodeInput(s, T.documents(s, d)).select(col("doc_id")), "doc_id")
      .as[Multimodal.Asset]
    val fp = assets.mapPartitions { it =>
      it.map(a => (a.asset_id, Multimodal.PureCodecs.dHash64(a.content)))
    }.toDF("asset_id", "h")
    val bands = fp.select(col("asset_id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .select(col("asset_id"), col("h"), col("j"),
        expr("(h >> (j * 16)) & 65535").as("k"))
    val coldBuckets = bands.groupBy(col("j"), col("k"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64)
      .select(col("j"), col("k"))
    val kept = bands.join(broadcast(coldBuckets), Seq("j", "k"))
    val cand = kept.as("x").join(kept.as("y"),
        col("x.j") === col("y.j") && col("x.k") === col("y.k")
          && col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("x.h").as("ha"),
        col("y.asset_id").as("b"), col("y.h").as("hb"))
      .distinct()
    cand
      .select(col("a"), col("b"), expr("bit_count(ha ^ hb)").as("hamming"))
      .filter(col("hamming") <= 6)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming").asc_nulls_first)
  }

  /** Perceptual audio dedup (VERDICT r9 item 5) — the PCM16 twin of
    * the image row, completing the image/audio symmetry of the
    * multimodal↔dedup bridge. Pipeline: decode WAV payloads → 64-bit
    * autocorrelation-sign fingerprint (PureCodecs.audioHash64, pure
    * Long arithmetic, one codec pass per partition) → the SAME
    * 4×16-bit banded Hamming join with the hot-bucket (> 64)
    * suppression cap → exact Hamming verification → confirmed-pair
    * histogram. Group-mate pairs agree exactly on bands 2 and 3 by the
    * fixture's window-confinement construction, so banded recall is 1
    * (AudioHashDedupSpec gates it against exact sample distance); the
    * cap guards the degenerate tail when the synthesis's 1517 distinct
    * timbres saturate at corpus scale — identical-timbre floods drop
    * their non-discriminative buckets, not the assets. The confirm
    * threshold 24 sits between the measured within-group maximum (17)
    * and the cross-timbre median (29) — a tuned knob, like every
    * perceptual-dedup radius.
    */
  val multimodalAudiohashDedup: Q = Q.noOracle("multimodal_audiohash_dedup") { (s, d) =>
    import s.implicits._
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val assets = Multimodal
      .nearDupAudio(s,
        T.spreadExplodeInput(s, T.documents(s, d)).select(col("doc_id")), "doc_id")
      .as[Multimodal.Asset]
    val fp = assets.mapPartitions { it =>
      it.map(a => (a.asset_id, Multimodal.PureCodecs.audioHash64(a.content)))
    }.toDF("asset_id", "h")
    val bands = fp.select(col("asset_id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .select(col("asset_id"), col("h"), col("j"),
        expr("(h >> (j * 16)) & 65535").as("k"))
    val coldBuckets = bands.groupBy(col("j"), col("k"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64)
      .select(col("j"), col("k"))
    val kept = bands.join(broadcast(coldBuckets), Seq("j", "k"))
    val cand = kept.as("x").join(kept.as("y"),
        col("x.j") === col("y.j") && col("x.k") === col("y.k")
          && col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a"), col("x.h").as("ha"),
        col("y.asset_id").as("b"), col("y.h").as("hb"))
      .distinct()
    cand
      .select(col("a"), col("b"), expr("bit_count(ha ^ hb)").as("hamming"))
      .filter(col("hamming") <= 24)
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("hamming").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(multimodalPhashDedup, multimodalAudiohashDedup)
}
