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
  * is bucket collisions, not n² — identical economics to
  * dedup_minhash_lsh, with the fingerprint broadcastable (8 bytes per
  * image vs the payload's KBs).
  */
object MultimodalDedup {

  val multimodalPhashDedup: Q = Q.noOracle("multimodal_phash_dedup") { (s, d) =>
    import s.implicits._
    val assets = Multimodal
      .nearDupImages(s, T.documents(s, d).select(col("doc_id")), "doc_id")
      .as[Multimodal.Asset]
    val fp = assets.mapPartitions { it =>
      it.map(a => (a.asset_id, Multimodal.PureCodecs.dHash64(a.content)))
    }.toDF("asset_id", "h")
    val bands = fp.select(col("asset_id"), col("h"),
        explode(sequence(lit(0), lit(7))).as("j"))
      .select(col("asset_id"), col("h"), col("j"),
        expr("(h >> (j * 8)) & 255").as("k"))
    val cand = bands.as("x").join(bands.as("y"),
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

  def all: Seq[Q] = Seq(multimodalPhashDedup)
}
