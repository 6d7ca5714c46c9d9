package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diagnostic main: times the custom TopKPerKey operator against the
  * window `row_number() <= k` formulation on the same input (median of
  * 3, same session) — the evidence artifact for the §4 tier-(c)
  * operator's reason to exist.
  *
  * Usage: tools/run.sh graft.TopKProbe <sfDir> [k]
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(Tables.orders(spark, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("o_orderkey"),
        (Tables.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    def time(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    val (tCustom, nCustom) = time {
      graft.plans.TopKPerKey(o, Seq("seg"), "cents", "o_orderkey", k).count()
    }
    val w = Window.partitionBy(col("seg")).orderBy(col("cents").desc, col("o_orderkey").asc)
    val (tWindow, nWindow) = time {
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
    }
    require(nCustom == nWindow, s"row-count mismatch: $nCustom vs $nWindow")
    println(f"topk_custom=$tCustom%.3f s  topk_window=$tWindow%.3f s  " +
      f"speedup=${tWindow / tCustom}%.2fx  rows=$nCustom  k=$k  dir=$dir")
  }
}
