package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure AQE skew-split engagement on a REAL remapped-FK join of a
  * SkewUp corpus (VERDICT r11 item 5: b21_aqe_skew proves the mechanism
  * on a synthetic hot key; this probes it on the corpus's own
  * customer⋈orders join, where SkewUp concentrated o_custkey onto 1 or
  * k hot keys). Thresholds are forced low exactly like b21 — local
  * sf1 partitions are MBs, far under the 256 MB production default —
  * the probe's point is WHICH partitions OptimizeSkewedJoin marks and
  * that the answer is "the hot ones", per corpus shape.
  *
  * Usage: tools/run.sh graft.SkewProbe <sfDir> [queryKey...]
  * With no keys: runs the built-in customer⋈orders probe and prints
  * join rows, wall seconds, n SMJ nodes, isSkewJoin flags. With keys:
  * times each declared query (median of 3, TimeQ protocol) under the
  * SAME scaled-down skew thresholds — the production regime where a
  * hot shuffle partition EXCEEDS skewedPartitionThresholdInBytes, so a
  * local ratio measured here is what a 100 TB run would see AFTER
  * OptimizeSkewedJoin, not the sub-threshold artifact plain TimeQ sees.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.length > 1) {
      args.tail.foreach { k =>
        val fn = SparkEntry.queries(k)
        val times = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[skewprobe] $k%-26s median=${times(1)}%6.2f s  (${times.mkString(", ")})")
      }
      spark.stop(); return
    }

    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
      // many mappers, like a real cluster scan (b21's note: AQE splits
      // at map-chunk granularity; a single-file scan yields 1 mapper)
      .repartition(16)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = orders.join(cust.hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
    val t0 = System.nanoTime()
    val n = joined.collect().map(_.getLong(1)).sum
    val secs = (System.nanoTime() - t0) / 1e9

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def smjs(p: SparkPlan): Seq[SortMergeJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => smjs(a.executedPlan)
      case qe: QueryStageExec       => smjs(qe.plan)
      case j: SortMergeJoinExec     => Seq(j) ++ j.children.flatMap(smjs)
      case other                    => other.children.flatMap(smjs)
    }
    val joins = smjs(joined.queryExecution.executedPlan)
    println(f"[skewprobe] $sfDir rows=$n wall=$secs%.2f s smj=${joins.size} " +
      s"isSkewJoin=${joins.map(_.isSkewJoin).mkString(",")}")
    spark.stop()
  }
}
