package graft

import org.apache.spark.sql.functions._
import graft.queries.BpeOps

/** The vocab-broadcast cutover fallback (VERDICT r13 item 5): above
  * the ~4M-word broadcast ceiling the BPE rows switch from a whole-
  * vocab broadcast map to BpeOps.docWordTokensSplit — a frequency-
  * floored broadcast head + shuffle-join tail. These pins prove the
  * split path is RESULT-IDENTICAL to the broadcast path at every
  * floor regime, so the cutover is a pure plan change.
  */
class BpeFallbackSpec extends SparkSpec {

  private def perDoc(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("frequency-floored split path matches the broadcast path in every floor regime") {
    // ground truth: the declared rows' broadcast-map shape
    val truth = perDoc(
      BpeOps.docWordsForTest(spark, sf())
        .join(broadcast(BpeOps.wordBpeCounts(spark, sf())), "w"))
    assert(truth.nonEmpty)
    // floor = 1: every word is hot — pure broadcast, no tail
    assert(perDoc(BpeOps.docWordTokensSplit(spark, sf(), 1L)) == truth)
    // floor = huge: every word is cold — pure shuffle tail, no head
    assert(perDoc(BpeOps.docWordTokensSplit(spark, sf(), Long.MaxValue)) == truth)
    // floor that actually SPLITS the vocab: both paths live
    val freq = BpeOps.docWordsForTest(spark, sf())
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .agg(min(col("f")), max(col("f"))).head()
    val (fMin, fMax) = (freq.getLong(0), freq.getLong(1))
    assert(fMin < fMax, "fixture vocab must have a frequency spread")
    val floor = (fMin + fMax) / 2 + 1
    val split = BpeOps.docWordTokensSplit(spark, sf(), floor)
    assert(perDoc(split) == truth)
  }

  test("the split plan broadcasts the head and shuffle-joins only the tail") {
    val floor = 2L
    val plan = BpeOps.docWordTokensSplit(spark, sf(), floor)
      .queryExecution.sparkPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"head must broadcast:\n$plan")
    // the tail join must exist and must NOT be a broadcast of the
    // corpus side (a SortMergeJoin/ShuffledHashJoin on w is the
    // at-scale shape; tiny test inputs may still auto-broadcast the
    // COLD MAP side, which is fine — the map is what the floor bounds)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val strict = BpeOps.docWordTokensSplit(spark, sf(), floor)
        .queryExecution.sparkPlan.toString()
      assert(strict.contains("SortMergeJoin") || strict.contains("ShuffledHashJoin"),
        s"tail must be a shuffle join when broadcast is off:\n$strict")
      // the explicit broadcast() hint on the head SURVIVES the conf —
      // the hot map is floor-bounded small at any SF
      assert(strict.contains("BroadcastHashJoin"),
        s"hinted head broadcast must survive autoBroadcast=-1:\n$strict")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
