package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.{Tables => T}
import graft.queries.{LlmOps, LlmOpsExt}

/** B6: the probabilistic LSH paths are checked for RECALL against the
  * exact, oracle-verified queries on the same data — candidates must be
  * a superset of the true near pairs.
  */
class LshSpec extends SparkSpec {

  test("MinHashLSH candidates cover the exact Jaccard >= 0.1 pairs") {
    val docs = T.documents(spark, sf())
    val exact = LlmOpsExt.dedupNgramJaccard.fn(spark, sf())
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must produce exact near-dup pairs")
    // Jaccard >= 0.1  ⇔  distance <= 0.9
    val lsh = Lsh.textNearDupPairs(spark, docs, maxJaccardDistance = 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall too low: $recall (missed ${exact.diff(lsh).take(5)})")
  }

  test("BucketedRandomProjectionLSH finds close embedding pairs") {
    val emb = T.embeddings(spark, sf())
    // exact close pairs among first 100 vectors (cosine >= 0.2 — the
    // oracle-verified sim_threshold_join)
    val exact = LlmOps.simThresholdJoin.fn(spark, sf())
      .filter(col("sim") >= 0.35)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val lsh = Lsh.embeddingNearPairs(spark, emb, maxL2Distance = 15.0)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"BRP recall too low: $recall")
  }
}
