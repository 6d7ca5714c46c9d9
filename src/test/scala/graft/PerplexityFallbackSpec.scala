package graft

import graft.queries.CorpusOps4

/** The perplexity model-broadcast cutover (VERDICT r14 item 6 /
  * ADVICE r14): the scoring joins' broadcast hints are now GATED on a
  * measured floored-model type count, with a frequency-floored split
  * (the BpeOps.docWordTokensSplit pattern) past the ceiling. These
  * pins prove the split path is RESULT-IDENTICAL to the broadcast path
  * in every floor regime — the integer-exact scoring pipeline is
  * untouched, only the join plan changes — and that the measured gate
  * actually switches paths.
  */
class PerplexityFallbackSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("frequency-floored split scoring matches the broadcast scoring in every floor regime") {
    val truth = rows(CorpusOps4.perplexityScored(spark, sf(), hotFloor = None))
    assert(truth.size == 25)
    // floor = 1: every type is hot — pure broadcast head, empty tail
    assert(rows(CorpusOps4.perplexityScored(spark, sf(), Some(1L))) == truth)
    // floor = huge: every type is cold — pure shuffle tail, empty head
    assert(rows(CorpusOps4.perplexityScored(spark, sf(), Some(Long.MaxValue))) == truth)
    // a floor that actually SPLITS the model (training counts straddle
    // it): both head and tail live
    assert(rows(CorpusOps4.perplexityScored(spark, sf(), Some(3L))) == truth)
  }

  test("the measured type-count gate switches the declared row to the split path") {
    // ceiling 0 forces measured-count > ceiling, so the DECLARED entry
    // (hotFloor = None) must take the split path — and still match
    val truth = rows(SparkEntry.queries("text_perplexity_sb")(spark, sf()))
    spark.conf.set("spark.graft.perplexity.broadcastTypeCeiling", "0")
    try {
      val forced = SparkEntry.queries("text_perplexity_sb")(spark, sf())
      // the split path is the only shape with a Union of hit/miss arms
      assert(forced.queryExecution.sparkPlan.toString.contains("Union"),
        "ceiling=0 must route the declared row through the split joins")
      assert(rows(forced) == truth)
    } finally spark.conf.unset("spark.graft.perplexity.broadcastTypeCeiling")
  }

  test("the split plan broadcasts the head and shuffle-joins only the tail") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val strict = CorpusOps4.perplexityScored(spark, sf(), Some(3L))
        .queryExecution.sparkPlan.toString()
      // the explicit broadcast() hint on the floor-bounded head SURVIVES
      // autoBroadcast=-1 (small at any SF by construction)
      assert(strict.contains("BroadcastHashJoin"),
        s"hinted head broadcast must survive autoBroadcast=-1:\n${strict.take(4000)}")
      assert(strict.contains("SortMergeJoin") || strict.contains("ShuffledHashJoin"),
        s"tail must be a shuffle join when broadcast is off:\n${strict.take(4000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
