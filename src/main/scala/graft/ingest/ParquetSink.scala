package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, month, year}

/** Partitioned parquet lake sink (SURVEY.md §2B B5): year/month layout
  * so time-range queries prune partitions — at 100 TB this is the
  * difference between scanning a month and scanning the lake.
  */
object ParquetSink {

  /** Write `df` partitioned by (year, month) of `tsCol`. */
  def writePartitioned(df: DataFrame, tsCol: String, path: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("part_year", year(col(tsCol)))
      .withColumn("part_month", month(col(tsCol)))
      .write
      .partitionBy("part_year", "part_month")
      .mode(mode)
      .parquet(path)

  def readLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
