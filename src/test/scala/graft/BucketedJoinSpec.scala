package graft

import org.apache.spark.sql.functions._
import graft.queries.NoOracle

/** B5 depth: the bucketed co-located join must (a) actually eliminate
  * the shuffle — no Exchange anywhere in the executed join plan — and
  * (b) return exactly the same aggregate as the direct unbucketed join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed SMJ has no Exchange and matches the unbucketed join") {
    val rows = NoOracle.bucketedJoin.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // the plan property is part of the row contract
    assert(rows.forall(_.getBoolean(3)), "bucketed join still shuffled")

    val li = Tables.lineitem(spark, sf()).filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf()).filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(Tables.dec2(col("l_quantity"))).cast("double").as("qty"))
      .orderBy(col("o_orderstatus").asc_nulls_first)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("runtime bloom filter injects iff enabled, and never changes the result") {
    // positive: the declared row's own plan assertion, plus cardinality
    val row = NoOracle.runtimeBloomFilter.fn(spark, sf("sf0.01")).collect().head
    val (n, injected) = (row.getLong(0), row.getBoolean(1))
    assert(injected, "InjectRuntimeFilter did not fire under lowered thresholds")
    assert(n > 0)

    // negative control: same join with the feature off — no
    // BloomFilterMightContain anywhere, identical count
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val probe = Tables.lineitem(spark, sf("sf0.01"))
        .select(col("l_partkey"), col("l_quantity"))
      val build = Tables.part(spark, sf("sf0.01"))
        .filter(col("p_brand") === "Brand#17").select(col("p_partkey"))
      val joined = probe.join(build, col("l_partkey") === col("p_partkey"))
      val nOff = joined.count()
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def hasBloom(p: SparkPlan): Boolean = p match {
        case a: AdaptiveSparkPlanExec => hasBloom(a.executedPlan)
        case other =>
          other.expressions.exists(
            _.exists(_.isInstanceOf[BloomFilterMightContain])) ||
            other.children.exists(hasBloom)
      }
      assert(!hasBloom(joined.queryExecution.executedPlan),
        "bloom filter present with the feature disabled")
      assert(nOff == n, "runtime filter changed the join result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
