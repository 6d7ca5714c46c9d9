package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL probe against the registered corpus:
  * `tools/run.sh graft.SqlProbe <sfDir> "<sql>"` — prints up to 20 rows.
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sql) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.registerTables(spark, sfDir)
    spark.sql(sql).show(20, truncate = false)
    spark.stop()
  }
}
