package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a parquet lake — the third load mode next
  * to append and stage-and-swap full refresh (graft.ingest.JdbcSink):
  * new keys insert, existing keys take the incoming row. Plain parquet
  * has no transactional MERGE, so the operator uses the same
  * stage-and-swap discipline as ParquetSink.compact: resolve the merge
  * into a staged rewrite, then two atomic renames.
  *
  * Scale posture: the merge itself is one shuffle on the key
  * (row_number over key, incoming rows ranked above existing — no
  * driver-side state, no collect). The rewrite cost is the lake, which
  * is why real 100 TB lakes use [[intoPartitionedParquet]]: only the
  * partitions the incoming batch touches are read, merged, and
  * swapped; untouched partitions are never rewritten (or even read).
  */
object Upsert {

  /** Merge `incoming` into the lake at `path` by `keys` (latest wins,
    * incoming over existing; ties WITHIN incoming broken by descending
    * `versionCol` then deterministic key order). Returns the merged
    * frame count. */
  def intoParquet(spark: SparkSession, path: String, incoming: DataFrame,
                  keys: Seq[String], versionCol: String): Long = {
    import graft.ingest.LakeFs
    val exists = LakeFs.isDirectory(spark, path)
    val merged =
      if (!exists) dedupLatest(incoming, keys, versionCol)
      else {
        val existing = spark.read.parquet(path)
        val all = existing.withColumn("graft_src", lit(0))
          .unionByName(incoming.withColumn("graft_src", lit(1)))
        dedupLatest(all, keys, versionCol, srcCol = Some("graft_src"))
          .drop("graft_src")
      }
    if (!exists) {
      merged.write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      // stage-and-swap through the Hadoop FileSystem API (HDFS/S3A
      // portable; brief no-directory window between the renames — see
      // LakeFs.swap for per-store atomicity)
      val tmp = path.stripSuffix("/") + "__upsert_tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      LakeFs.swap(spark, path, tmp, tag = "upsert")
    }
    spark.read.parquet(path).count()
  }

  /** Partition-scoped MERGE into a Hive-layout lake partitioned by
    * `partCol`: only partitions present in `incoming` are read, merged
    * (same latest-wins semantics as [[intoParquet]]), and swapped —
    * the 100 TB upsert path, where a daily batch touching 3 days of a
    * 5-year lake rewrites 3 partition directories, not the lake.
    *
    * The touched-partition list is collected to the driver: it is
    * bounded by the batch's distinct partition values (days, not rows).
    * Each touched partition directory is swapped independently via
    * Hadoop-FS renames, so an untouched partition is never without its
    * directory; a reader racing the swap of a touched partition sees
    * old-or-new, per partition.
    */
  def intoPartitionedParquet(spark: SparkSession, path: String, incoming: DataFrame,
                             keys: Seq[String], versionCol: String,
                             partCol: String): Long = {
    import graft.ingest.LakeFs
    import org.apache.hadoop.fs.Path
    if (!LakeFs.isDirectory(spark, path)) {
      dedupLatest(incoming, keys, versionCol)
        .write.partitionBy(partCol).mode(SaveMode.Overwrite).parquet(path)
    } else {
      val touched = incoming.select(col(partCol)).distinct().collect()
        .map(_.get(0)).filter(_ != null)
      val existingScoped = spark.read.parquet(path)
        .filter(col(partCol).isin(touched.toIndexedSeq: _*))
      val merged = dedupLatest(
        existingScoped.withColumn("graft_src", lit(0))
          .unionByName(incoming.withColumn("graft_src", lit(1))
            .select(existingScoped.columns.map(col).toIndexedSeq :+ col("graft_src"): _*)),
        keys, versionCol, srcCol = Some("graft_src"))
        .drop("graft_src")
      val tmp = path.stripSuffix("/") + "__upsert_parts_tmp"
      merged.write.partitionBy(partCol).mode(SaveMode.Overwrite).parquet(tmp)
      val fs = LakeFs.fs(spark, path)
      touched.foreach { v =>
        val part = s"$partCol=$v"
        val dst = new Path(path.stripSuffix("/"), part)
        val src = new Path(tmp, part)
        if (fs.exists(dst)) fs.delete(dst, true)
        if (fs.exists(src) && !fs.rename(src, dst))
          throw new java.io.IOException(s"partition swap $src -> $dst failed")
      }
      fs.delete(new Path(tmp), true)
    }
    spark.read.parquet(path).count()
  }

  /** One row per key: highest (srcCol, versionCol) wins — srcCol first
    * so any incoming row beats any existing row regardless of version
    * (MERGE semantics), version orders within a side. A content-hash
    * tiebreak makes even a pathological batch (same key+version,
    * different payloads) resolve deterministically instead of by
    * partition order. */
  private[operators] def dedupLatest(df: DataFrame, keys: Seq[String],
                                     versionCol: String,
                                     srcCol: Option[String] = None): DataFrame = {
    val order = srcCol.map(col(_).desc).toSeq ++
      Seq(col(versionCol).desc) :+
      xxhash64(df.columns.sorted.map(col).toIndexedSeq: _*).asc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }
}
