package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, month, year}

/** Partitioned parquet lake sink (SURVEY.md §2B B5): year/month layout
  * so time-range queries prune partitions — at 100 TB this is the
  * difference between scanning a month and scanning the lake.
  */
object ParquetSink {

  /** Write `df` partitioned by (year, month) of `tsCol`, rows sorted by
    * the timestamp within each file so parquet row-group min/max stats
    * support time-range skipping WITHIN a partition too (partition
    * pruning gets a query to the right month; row-group stats get it to
    * the right days).
    */
  def writePartitioned(df: DataFrame, tsCol: String, path: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("part_year", year(col(tsCol)))
      .withColumn("part_month", month(col(tsCol)))
      .sortWithinPartitions(col("part_year"), col("part_month"), col(tsCol))
      .write
      .partitionBy("part_year", "part_month")
      .mode(mode)
      .parquet(path)

  def readLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partition columns of a lake directory, detected from its Hive-style
    * `name=value` layout (the same discovery Spark itself performs).
    * Empty for an unpartitioned lake.
    */
  def partitionColumns(path: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    @annotation.tailrec
    def loop(dir: java.nio.file.Path, acc: Vector[String]): Vector[String] = {
      val sub = Files.list(dir).iterator()
      var next: Option[(java.nio.file.Path, String)] = None
      while (next.isEmpty && sub.hasNext) {
        val p = sub.next()
        val n = p.getFileName.toString
        if (Files.isDirectory(p) && n.contains("="))
          next = Some((p, n.substring(0, n.indexOf('='))))
      }
      next match {
        case Some((p, colName)) => loop(p, acc :+ colName)
        case None               => acc
      }
    }
    loop(Paths.get(path), Vector.empty)
  }

  /** Compact a lake directory in place: rewrite to ~`targetPartitions`
    * files per write, PRESERVING the lake's partition layout (a flat
    * rewrite of a year/month lake would silently destroy partition
    * pruning and break later partitioned appends into the same path).
    * Streaming / per-batch appends accumulate small files; at 100 TB the
    * small-file problem costs more than the data — scan tasks, NameNode
    * pressure, footer reads all scale with file count, not bytes.
    *
    * The swap is two renames (old→bak, tmp→dst): each rename is atomic
    * but there is a brief window with no directory at `path`; readers
    * racing a compaction should retry, or compaction should run in a
    * maintenance window.
    */
  def compact(spark: SparkSession, path: String, targetPartitions: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val partCols = partitionColumns(path)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    val df = spark.read.parquet(path)
    val writer =
      if (partCols.isEmpty) df.repartition(targetPartitions).write
      else df.repartition(targetPartitions, partCols.map(col): _*)
        .write.partitionBy(partCols: _*)
    writer.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = Paths.get(path)
    val bak = Paths.get(path.stripSuffix("/") + "__compact_old")
    Files.move(dst, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), dst, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the old generation
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().forEachRemaining(rm)
      Files.deleteIfExists(p)
    }
    rm(bak)
  }
}
