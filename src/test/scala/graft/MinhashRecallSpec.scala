package graft

import graft.queries.{LlmOpsAnn, LlmOpsExt}

/** The oracle proves dedup_minhash_lsh computes what its SQL says; this
  * proves the ALGORITHM is right: the band-bucket candidates must
  * recall the true Jaccard ≥ 0.2 pairs (4 bands of 2 ⇒ per-pair miss
  * probability (1−J²)⁴ — small for the pairs that matter, and measured
  * 25/25 at J ≥ 0.1 on sf0.01 with one false candidate).
  */
class MinhashRecallSpec extends SparkSpec {

  test("minhash banding recalls the exact Jaccard pairs") {
    val exact = LlmOpsExt.dedupNgramJaccard.fn(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty)
    val cand = LlmOpsAnn.dedupMinhashLsh.fn(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = exact.filter(_._3 >= 0.2)
    val recalled = strong.count(p => cand.contains((p._1, p._2)))
    assert(strong.nonEmpty && recalled == strong.length,
      s"banding missed ${strong.length - recalled} of ${strong.length} strong pairs")
  }
}
