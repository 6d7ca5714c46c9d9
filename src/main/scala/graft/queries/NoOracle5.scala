package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 capability rows, continued: parquet BLOOM FILTER
  * row-group skipping — the point-lookup scan saver min/max zone maps
  * (b23) cannot give on shuffled data.
  */
object NoOracle5 {

  /** B34 — parquet bloom filters measured: the same point-lookup
    * IN-list over the same rows, on a lake written WITH a column bloom
    * filter (`parquet.bloom.filter.enabled#col`) vs without. The data
    * is written SHUFFLED so min/max stats are useless (every row group
    * spans the keyspace — b23's zone maps cannot prune), and the
    * filter targets a handful of keys: row groups whose bloom answers
    * "definitely absent" are skipped by the reader, and the scans'
    * numOutputRows show it. Identical aggregates on both layouts. At
    * 100 TB this is THE needle-in-haystack primitive: point lookups
    * on high-cardinality non-sort columns (order ids, user ids) skip
    * row groups without any layout change. Multiple row groups per
    * file are forced via a small parquet.block.size.
    */
  val parquetBloom: Q = Q.noOracle("b34_parquet_bloom") { (s, d) =>
    import s.implicits._
    val run = java.nio.file.Files.createTempDirectory("graft_pqbloom").toString
    val o = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val shuffled = o.repartition(4) // destroys key locality → min/max useless
    // dictionary encoding is disabled on the key in BOTH layouts:
    // parquet DICTIONARY-page filtering prunes point lookups exactly
    // (measured — it hid the bloom entirely), and at real scale a
    // high-cardinality key falls back from dictionary anyway; with it
    // off, `plain` has only useless min/max on shuffled data and the
    // bloom is the sole sub-stats filter
    shuffled.write.mode("overwrite")
      .option("parquet.enable.dictionary#o_orderkey", "false")
      .option("parquet.bloom.filter.enabled#o_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_orderkey", "100000")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$run/bloom")
    shuffled.write.mode("overwrite")
      .option("parquet.enable.dictionary#o_orderkey", "false")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$run/plain")
    // data-derived INTERIOR probe keys (percentile_disc picks ACTUAL
    // keys): global min/max would sit at the edge of exactly one
    // file's [min,max] and let plain stats prune to the same files as
    // the bloom (measured — the differential vanished); interior keys
    // are inside EVERY shuffled file's stats range, so only the bloom
    // can prune them
    // n_total rides the same aggregation job as the probe-key
    // percentiles (r16, guide §1.2 — it was a separate full count()
    // at the end of the row)
    val mm = o.agg(
      expr("CAST(percentile_disc(0.33) WITHIN GROUP (ORDER BY o_orderkey) AS BIGINT)"),
      expr("CAST(percentile_disc(0.67) WITHIN GROUP (ORDER BY o_orderkey) AS BIGINT)"),
      max(col("o_orderkey")), count(lit(1))).collect().head
    val keys: Seq[Long] =
      if (mm.isNullAt(0)) Seq(1L)
      else Seq(mm.getLong(0), mm.getLong(1), mm.getLong(2) + 7, mm.getLong(2) + 13)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scanRows(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => scanRows(a.executedPlan)
      case qe: QueryStageExec       => scanRows(qe.plan)
      case f: FileSourceScanExec    => f.metrics("numOutputRows").value
      case other                    => other.children.map(scanRows).sum
    }
    def probe(layout: String): (Long, Long, Long) = {
      val df = s.read.parquet(s"$run/$layout")
        .filter(col("o_orderkey").isin(keys: _*))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("ks"))
      val r = df.collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        scanRows(df.queryExecution.executedPlan))
    }
    val (nB, kB, readB) = probe("bloom")
    val (nP, kP, readP) = probe("plain")
    Seq((mm.getLong(3), nB, readB, readP,
      nB == nP && kB == kP,
      // bloom must at least halve the decoded rows (measured 4×)
      nB == nP && kB == kP && (readB * 2 <= readP || (nB == 0 && readB == 0))))
      .toDF("n_total", "n_match", "rows_read_bloom", "rows_read_plain",
        "results_equal", "ok")
  }

  /** B35 — streaming progress metrics across the b13-style restart:
    * the StreamingQueryListener per-batch progress stream folded to a
    * summary row per run (input rows and state-store rows checked
    * against their data-determined expectations; machine-dependent
    * durations surfaced as flags). See
    * [[graft.streaming.StreamOps.progressMetrics]].
    */
  val streamProgress: Q = Q.noOracle("b35_stream_progress") { (s, d) =>
    graft.streaming.StreamOps.progressMetrics(T.events(s, d))
  }

  /** B36 — exactly-once under duplicate-batch replay: commits/0 is
    * deleted from the checkpoint after a committed Upsert-sink run (the
    * on-disk state a crash between sink write and commit record
    * leaves), the restart re-executes batch 0 with identical data, and
    * the lake audit must be byte-identical before/after — then the
    * stream continues with new data on top. `batch0_runs = 2` is the
    * replayed-batch flag. See
    * [[graft.streaming.StreamOps.replayedBatchConvergence]].
    */
  val streamReplay: Q = Q.noOracle("b36_stream_replay") { (s, d) =>
    graft.streaming.StreamOps.replayedBatchConvergence(T.events(s, d))
  }

  val streamMidwriteCrash: Q = Q.noOracle("b37_stream_midwrite_crash") { (s, d) =>
    graft.streaming.StreamOps.midWriteCrashRecovery(T.events(s, d))
  }

  def all: Seq[Q] = Seq(parquetBloom, streamProgress, streamReplay, streamMidwriteCrash)
}
