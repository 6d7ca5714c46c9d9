package graft.plans

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the custom TopKPerKey operator: exact agreement with the
  * window-function formulation, the partial/final plan shape (two
  * Execs around one Exchange, NO SortExec beneath them — the whole
  * point), heavy-skew correctness, and empty input.
  */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def collectExec(p: SparkPlan): Seq[SparkPlan] = p match {
    // AQE hides materialized stages behind QueryStageExec (children=Nil)
    case a: AdaptiveSparkPlanExec => collectExec(a.executedPlan)
    case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Seq(qs) ++ collectExec(qs.plan)
    case re: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      Seq(re) ++ collectExec(re.child)
    case other => Seq(other) ++ other.children.flatMap(collectExec)
  }

  test("matches the window row_number formulation exactly") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 20L), ("a", 5L, 5L),
      ("b", 6L, 1L), ("b", 7L, 2L),
      ("c", 8L, 100L)
    ).toDF("k", "id", "v")
    val got = TopKPerKey(df, Seq("k"), "v", "id", 2)
      .select(col("k"), col("id"), col("v"))
      .orderBy(col("k"), col("v").desc, col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").asc)
    val exp = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("k"), col("id"), col("v"))
      .orderBy(col("k"), col("v").desc, col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp)
    // tie at v=30 within "a": both kept, ordered by id
    assert(got.filter(_._1 == "a").map(_._2) == Seq(2L, 3L))
  }

  test("plan shape: partial and final Execs around one Exchange, no Sort beneath") {
    val df = Tables.customerLike()
    val q = TopKPerKey(df, Seq("k"), "v", "id", 3)
    val plan = q.queryExecution.executedPlan
    q.collect() // materialize under AQE so executedPlan is final
    val nodes = collectExec(q.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.size == 2, s"expected partial+final TopKPerKeyExec, got ${topks.size}")
    assert(topks.count(_.partial) == 1 && topks.count(!_.partial) == 1)
    assert(nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "the final Exec's ClusteredDistribution must have inserted a shuffle")
    assert(!nodes.exists(_.isInstanceOf[SortExec]),
      "no SortExec anywhere — bounded heaps replace the window sort")
    assert(plan != null)
  }

  test("heavy skew: one key with 50k rows still returns exactly k, correct ones") {
    val skew = spark.range(0, 50000).select(lit("hot").as("k"), col("id"),
        (col("id") % 1000).as("v"))
      .unionAll(spark.range(50000, 50005).select(lit("cold").as("k"), col("id"),
        col("id").as("v")))
    val got = TopKPerKey(skew, Seq("k"), "v", "id", 3)
      .orderBy(col("k"), col("v").desc, col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.count(_._1 == "hot") == 3 && got.count(_._1 == "cold") == 3)
    // hot's top v is 999, earliest ids achieving it: 999, 1999, 2999
    assert(got.filter(_._1 == "hot") == Seq(("hot", 999L, 999L),
      ("hot", 1999L, 999L), ("hot", 2999L, 999L)))
    assert(got.filter(_._1 == "cold").map(_._2) == Seq(50004L, 50003L, 50002L))
  }

  test("TopKColumnPruning pushes pruning through the custom node into the parquet scan") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet") // 16-column wide table
    val q = TopKPerKey(li, Seq("l_suppkey"), "l_partkey", "l_orderkey", 2)
      .select(col("l_suppkey"), col("l_partkey"))
    q.collect()
    val scans = collectExec(q.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val readCols = scans.head.requiredSchema.fieldNames.toSet
    assert(readCols == Set("l_suppkey", "l_partkey", "l_orderkey"),
      s"scan must read ONLY the needed columns, got $readCols")
    // and the result is still the window answer
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_partkey").desc, col("l_orderkey").asc)
    val exp = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).count()
    assert(q.count() == exp)
  }

  test("empty input yields empty output") {
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "id", "v")
    assert(TopKPerKey(empty, Seq("k"), "v", "id", 5).collect().isEmpty)
  }

  private object Tables {
    def customerLike() = Seq.tabulate(1000)(i =>
      (s"g${i % 7}", i.toLong, (i * 37 % 500).toLong)).toDF("k", "id", "v")
  }
}
