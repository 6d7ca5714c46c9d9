package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime half of the skew story
  * (join_skew_salted is the manual half): a heavily skewed sort-merge
  * join must have its hot partition SPLIT by OptimizeSkewedJoin when
  * the thresholds say so, with results identical to the unskewed
  * execution. Thresholds are forced low so the corpus-sized fixture
  * reliably trips the optimization; the assertion reads the isSkew
  * flag off the executed SortMergeJoinExec, not a plan string.
  */
class AqeSkewSpec extends SparkSpec {

  test("OptimizeSkewedJoin splits the hot key's partition; results unchanged") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k facts, 90% on key 7 (the hot key), joined to 100 dims
      val facts = spark.range(0, 50000)
        .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 100)
          .as("k"), col("id").as("payload"))
      val dims = spark.range(0, 100).select(col("id").as("dk"),
        concat(lit("d"), col("id")).as("name"))
      val joined = facts.join(dims.hint("merge"), col("k") === col("dk"))
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val rows = joined.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

      // ground truth from a driver-side recompute: key 7 holds every
      // id with id % 10 != 0 (45,000 rows; no cold id maps to 7 since
      // id % 100 == 7 implies id % 10 == 7)
      val hot = (0 until 50000).filterNot(_ % 10 == 0)
      val got7 = rows.find(_._1 == "d7").get
      assert(got7._2 === hot.size.toLong)
      assert(got7._3 === hot.map(_.toLong).sum)
      assert(rows.map(_._2).sum === 50000L)

      // the skew flag must be present on the executed SMJ
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      // materialized query stages are leaf-like (children = Nil); the
      // join lives inside stage.plan, so descend explicitly
      def smjs(p: SparkPlan): Seq[SortMergeJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => smjs(a.executedPlan)
        case q: QueryStageExec        => smjs(q.plan)
        case j: SortMergeJoinExec     => Seq(j) ++ j.children.flatMap(smjs)
        case other                    => other.children.flatMap(smjs)
      }
      val joins = smjs(joined.queryExecution.executedPlan)
      assert(joins.nonEmpty, "expected a sort-merge join in the executed plan")
      assert(joins.exists(_.isSkewJoin),
        "OptimizeSkewedJoin did not mark the hot join — skew handling not exercised")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
