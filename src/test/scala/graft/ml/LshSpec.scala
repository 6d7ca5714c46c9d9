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

  test("text probe top-k recalls the brute-force Jaccard nearest neighbors") {
    import org.apache.spark.sql.expressions.Window
    val docs = T.documents(spark, sf())
    val k = 5; val nProbes = 32
    val got = Lsh.textProbeTopK(spark, docs, k = k, nProbes = nProbes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth: exact Jaccard over distinct 3-gram
    // shingle sets, same probe set (lowest doc_ids), same tie-break
    val sh = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(
            slice(sequence(1, greatest(size(t) - 2, 1)), 1, greatest(size(t) - 2, 0)),
            i -> concat_ws(' ', slice(t, i, 3))))""").as("s"))
      .filter(size(col("s")) > 0)
    val probes = sh.orderBy(col("doc_id").asc).limit(nProbes)
      .select(col("doc_id").as("q"), col("s").as("qs"))
    val corpus = sh.select(col("doc_id").as("nb"), col("s").as("ns"))
    val inter = size(array_intersect(col("qs"), col("ns"))).cast("double")
    val uni = (size(col("qs")) + size(col("ns"))).cast("double") - inter
    val truthRows = probes.crossJoin(corpus).filter(col("q") =!= col("nb"))
      .select(col("q"), col("nb"), (lit(1.0) - inter / uni).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("dist").asc, col("nb").asc)))
      .filter(col("rn") <= k)
      .select("q", "nb", "dist").collect()
    // The fixture corpus is bimodal (measured at sf0.001: of the 160
    // brute-force top-5 pairs, 11 are true near-dups at dist < 0.1 and
    // the rest sit at dist ≥ 0.9): the far block is tie-broken noise no
    // MinHash bucket can — or should — surface, so the recall gate is
    // over the NEAR truth pairs, the pairs the operator exists to find.
    val nearTruth = truthRows.filter(_.getDouble(2) <= 0.5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearTruth.nonEmpty, "fixture must contain near-dup truth pairs")
    // ADVICE r14: the 0.5 cutoff assumes bimodality — near block
    // < 0.1, noise ≥ 0.9, nothing between. Assert the gap, so a future
    // fixture with genuine mid-range pairs (which would silently fall
    // OUTSIDE the recall gate) fails loudly here instead.
    val midTruth = truthRows.filter(r =>
      r.getDouble(2) > 0.5 && r.getDouble(2) < 0.9)
    assert(midTruth.isEmpty,
      s"fixture no longer bimodal: ${midTruth.length} truth pairs in (0.5, 0.9) — " +
        "re-derive the recall cutoff from the observed distance gap")
    val recall = nearTruth.count(got.contains).toDouble / nearTruth.size
    assert(recall >= 0.9, s"text probe top-k near-pair recall too low: $recall")
    // the per-probe cap is a hard output bound
    val counts = Lsh.textProbeTopK(spark, docs, k = k, nProbes = nProbes)
      .groupBy(col("q")).count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= k))
  }

  test("probe top-k recalls the brute-force nearest neighbors") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorOps
    val emb = T.embeddings(spark, sf())
    val k = 5; val nProbes = 32
    val got = Lsh.embeddingProbeTopK(spark, emb, k = k, nProbes = nProbes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth for the same probe set
    val probes = emb.orderBy(col("vec_id").asc).limit(nProbes)
      .select(col("vec_id").as("q"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nb"), col("embedding").as("nvec"))
    val d2 = VectorOps.ssq(col("qvec")) + VectorOps.ssq(col("nvec")) -
      lit(2.0) * VectorOps.dot(col("qvec"), col("nvec"))
    val truth = probes.crossJoin(corpus).filter(col("q") =!= col("nb"))
      .select(col("q"), col("nb"), sqrt(greatest(d2, lit(0.0))).as("dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("dist").asc, col("nb").asc)))
      .filter(col("rn") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = truth.count(got.contains).toDouble / truth.size
    // approximate by design; the floor documents measured behavior with
    // headroom (measured ~0.9+ at sf0.001 with 4 tables, w=0.5)
    assert(recall >= 0.6, s"probe top-k recall too low: $recall")
    // the per-probe cap is a hard output bound
    val counts = Lsh.embeddingProbeTopK(spark, emb, k = k, nProbes = nProbes)
      .groupBy(col("q")).count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= k))
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
