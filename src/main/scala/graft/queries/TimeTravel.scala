package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** B20 depth (VERDICT r8 item 8): time travel on the manifest-pinned
  * snapshot lake — read-BY-VERSION plus DIFF-BETWEEN-VERSIONS, the
  * audit query every versioned lake (Delta/Iceberg time travel)
  * answers with `VERSION AS OF` + except/merge introspection.
  *
  * Three immutable versions of orders land in one lake: v1 = even
  * keys, v2 = full table (inserts), v3 = full table with keys
  * ≡ 3 (mod 10) repriced (+1.00 — an update). Each version's manifest
  * is pinned BEFORE the next version writes. The row re-reads every
  * version through its pinned manifest and computes the v1→v2 and
  * v2→v3 diffs as full-outer joins on the key, classifying rows as
  * inserted / deleted / changed / unchanged.
  *
  * ORACLE-CHECKED end to end: the expected diff counts are pure
  * functions of the orders table, so DuckDB derives them directly —
  * if pinning, manifest isolation, or the version reads corrupt
  * anything, the counts diverge. Diff cost at scale: one shuffle on
  * the join key per version pair (or zero with both sides bucketed by
  * key, the layout a real lake table would pin).
  */
object TimeTravel {

  val timeTravelDiff: Q = Q(
    "b20_time_travel_diff",
    """SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS from_version, CAST(2 AS BIGINT) AS to_version,
      |         CAST(coalesce(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_inserted,
      |         CAST(0 AS BIGINT) AS n_deleted,
      |         CAST(0 AS BIGINT) AS n_changed,
      |         CAST(coalesce(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_unchanged
      |  FROM orders
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT),
      |         CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |         CAST(coalesce(sum(CASE WHEN o_orderkey % 10 = 3
      |                                 AND o_totalprice IS NOT NULL
      |                            THEN 1 ELSE 0 END), 0) AS BIGINT),
      |         CAST(coalesce(sum(CASE WHEN o_orderkey % 10 <> 3
      |                                 OR o_totalprice IS NULL
      |                            THEN 1 ELSE 0 END), 0) AS BIGINT)
      |  FROM orders)
      |ORDER BY from_version""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_b20_tt_").toString
    val fs = graft.ingest.LakeFs.fs(s, root)
    val base = T.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def writeVersion(df: DataFrame, v: Int): Unit = {
      val dir = s"$root/files/v$v"
      df.coalesce(2).write.mode("overwrite").parquet(dir)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"manifest-v$v.json"),
        files.mkString("[\"", "\",\"", "\"]").getBytes("UTF-8"))
      ()
    }
    def readPinned(v: Int): DataFrame = {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, s"manifest-v$v.json")), "UTF-8")
      val files = txt.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      if (files.isEmpty) base.limit(0)
      else s.read.schema(base.schema).parquet(files.toIndexedSeq: _*)
    }
    writeVersion(base.filter(col("o_orderkey") % 2 === 0), 1)
    writeVersion(base, 2)
    writeVersion(base.withColumn("o_totalprice",
      when(col("o_orderkey") % 10 === 3, col("o_totalprice") + 1.0d)
        .otherwise(col("o_totalprice"))), 3)
    def diff(fromV: Int, toV: Int): DataFrame = {
      val a = readPinned(fromV).select(col("o_orderkey").as("k"),
        col("o_totalprice").as("tp_a"), lit(1).as("in_a"))
      val b = readPinned(toV).select(col("o_orderkey").as("k"),
        col("o_totalprice").as("tp_b"), lit(1).as("in_b"))
      // presence is keyed on a marker column, NOT the value column: a
      // row whose PRICE is legitimately NULL must not read as an
      // insert/delete, and value comparison is null-safe (<=>) so
      // NULL→NULL counts as unchanged (null-sweep r9)
      a.join(b, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(when(col("in_a").isNull, 1L)), lit(0L)).as("n_inserted"),
          coalesce(sum(when(col("in_b").isNull, 1L)), lit(0L)).as("n_deleted"),
          coalesce(sum(when(col("in_a").isNotNull && col("in_b").isNotNull
            && !(col("tp_a") <=> col("tp_b")), 1L)), lit(0L)).as("n_changed"),
          coalesce(sum(when(col("in_a").isNotNull && col("in_b").isNotNull
            && (col("tp_a") <=> col("tp_b")), 1L)), lit(0L)).as("n_unchanged"))
        .select(lit(fromV.toLong).as("from_version"), lit(toV.toLong).as("to_version"),
          col("n_inserted"), col("n_deleted"), col("n_changed"), col("n_unchanged"))
    }
    diff(1, 2).unionByName(diff(2, 3))
      .select(col("from_version"), col("to_version"), col("n_inserted"),
        col("n_deleted"), col("n_changed"), col("n_unchanged"))
      .orderBy(col("from_version"))
  }

  def all: Seq[Q] = Seq(timeTravelDiff)
}
