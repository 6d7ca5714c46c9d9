package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event row for the stateful operators. */
case class GEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                  event_type: String, value: Double)

/** Running per-user state maintained by flatMapGroupsWithState. */
case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming operators (SURVEY.md §2B B7–B9). Each transform
  * takes an unbounded DataFrame (readStream / MemoryStream) with an
  * event-time column and returns the aggregated stream; the SEMANTICS of
  * every window here are pinned against DuckDB by the batch twins in
  * graft.queries.StreamingBatch — ScalaTest asserts streaming == batch
  * on the same rows.
  *
  * Watermarks bound state: at 100 TB/day the state store only holds
  * windows newer than (max event time − watermark), everything older is
  * finalized and evicted.
  */
object StreamOps {

  /** Scale-adaptive STATE-PARTITION sizing for the streaming harness
    * rows (r16, guide §2.2/§6): a stateful micro-batch creates one
    * state-store instance per `spark.sql.shuffle.partitions` and pays
    * one delta-file write + commit per instance per batch — a
    * per-batch cost proportional to the PARTITION COUNT, not the data.
    * The harness rows feed O(10)–O(thousands) driver-side rows by
    * construction (their slices are corpus-capped — the b13 sizing
    * argument), so inheriting the batch session's partition count
    * (sized for corpus-proportional shuffles) multiplies checkpoint
    * I/O by ~32× for state that fits in one partition: measured at
    * sf0.1, b24 5.29 s → 2.45 s and b9_stream_dedup 4.31 s → 2.29 s
    * median-of-3 from this sizing alone. A real 100 TB stream sizes
    * state partitions to state volume the same way — the formula
    * below derives from feed size (≈2k state rows per partition,
    * capped at the session's parallelism) and hard-codes nothing
    * about this box. The conf is restored in `finally`; the partition
    * count is pinned per checkpoint at first start, so both runs of a
    * restart row see the same value by construction.
    */
  def withStatePartitions[A](s: org.apache.spark.sql.SparkSession,
                             feedRows: Long)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    val n = math.max(1L,
      math.min(s.sparkContext.defaultParallelism.toLong, feedRows / 2048L + 1L))
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** B7: tumbling 1-hour counts per event_type with a watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** B7: sliding 1-hour/15-min counts with a watermark. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** B8: native session windows, 30-minute gap, per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))

  /** B9: exactly-once re-upload semantics — drop duplicate event_ids
    * arriving within the watermark (the streaming twin of the
    * reference's idempotent import).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** B9 (arbitrary state): per-user running count + value total kept in
    * the state store across micro-batches via flatMapGroupsWithState —
    * the custom-state surface for logic window aggregation can't
    * express. Update mode: one refreshed row per user per batch.
    */
  def runningUserAggs(events: Dataset[GEvent]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[GEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          val rows = batch.toSeq
          val next = UserAgg(uid, prev.n_events + rows.size,
            prev.total_value + rows.map(_.value).sum)
          state.update(next)
          Iterator(next)
      }
  }

  /** B9 on the Spark 4.x arbitrary-state API: same per-user running
    * aggregate as [[runningUserAggs]], expressed as a
    * [[StatefulProcessor]] driven through `transformWithState` — the
    * successor to flatMapGroupsWithState (typed named-state handles,
    * timers, TTL; requires the RocksDB state store provider, which is
    * also the provider a 100 TB deployment wants: state lives off-heap
    * and spills to disk instead of filling executor heaps). Both
    * variants stay side by side while the legacy API remains supported;
    * StreamOpsSpec pins them to identical cross-batch results.
    */
  def runningUserAggsTws(events: Dataset[GEvent]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningUserAggProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** transformWithState processor keeping one UserAgg per user in a
    * named ValueState cell (no TTL: the aggregate is a forever-running
    * total, same as the flatMapGroupsWithState twin).
    */
  private class RunningUserAggProcessor
      extends StatefulProcessor[Long, GEvent, UserAgg] {
    @transient private var agg: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[GEvent],
                                 timers: TimerValues): Iterator[UserAgg] = {
      val prev = if (agg.exists()) agg.get() else UserAgg(key, 0L, 0.0)
      val batch = rows.toSeq
      val next = UserAgg(key, prev.n_events + batch.size,
        prev.total_value + batch.map(_.value).sum)
      agg.update(next)
      Iterator(next)
    }
  }

  /** Streaming MERGE sink (the CDC pattern): each micro-batch is
    * upserted into a keyed parquet lake through foreachBatch +
    * graft.operators.Upsert — new keys insert, existing keys take the
    * batch's row (latest version wins within the batch). foreachBatch
    * is the bridge between exactly-once streaming semantics and a
    * batch-only sink: the checkpoint replays an unacknowledged batch,
    * and the upsert is idempotent per (key, version), so replays
    * converge instead of duplicating.
    */
  def upsertSink(df: DataFrame, path: String, keys: Seq[String],
                 versionCol: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // merge, not intoParquet: the sink discards the count, so don't
        // pay a per-micro-batch read-back of the whole lake for it
        graft.operators.Upsert.merge(
          batch.sparkSession, path, batch.toDF(), keys, versionCol)
      }

  /** Stream-stream inner join with watermarks: each purchase matched to
    * clicks by the same user within the preceding 30 minutes. Both
    * sides watermarked so join state is evicted once the range can no
    * longer match — unbounded-state joins don't survive at scale.
    */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    p.join(c, expr(
      """p_user = c_user AND
         c_ts <= p_ts AND c_ts >= p_ts - interval 30 minutes"""))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** B13: checkpoint-restart state recovery — the operational property
    * every long-running 100 TB pipeline depends on: a streaming
    * aggregation is STOPPED mid-stream and a NEW query object restarted
    * from the same checkpointLocation must resume with its state-store
    * contents (and committed source offsets) intact, so post-restart
    * output still reflects pre-restart rows. The demo feeds the first
    * half of a bounded event slice, stops the query, feeds the second
    * half, restarts from the checkpoint, and compares the recovered
    * stream counts against the batch ground truth over BOTH halves —
    * `recovered` is only true if run 2 merged run 1's state rather than
    * recounting from its own input. Temp dirs and sink names carry a
    * per-invocation token (the b5 idempotency lesson): concurrent or
    * repeated runs never share state.
    */
  def checkpointRestartCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    // a deterministic ~2% slice keeps the demo honest (real grouped
    // state, several event types) without dominating Verify/Bench time
    val slice = events.select(col("event_id"), col("event_type"))
      .filter(col("event_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = slice.partition(_._1 % 100 == 0)
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_b13_ckpt_$token").toString
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val counts = mem.toDS().toDF("event_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_stream"))
    def runOnce(sinkName: String): Unit = {
      val q = counts.writeStream.format("memory").queryName(sinkName)
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
    withStatePartitions(s, slice.length.toLong) {
      mem.addData(h1.toIndexedSeq)
      runOnce(s"b13_${token}_run1")
      // the restart: new query object, same checkpoint, only NEW data added
      mem.addData(h2.toIndexedSeq)
      runOnce(s"b13_${token}_run2")
    }
    val stream = s.table(s"b13_${token}_run2")
    val batch = slice.toIndexedSeq.toDF("event_id", "event_type")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_batch"))
    // batch is the ground truth and must drive the row set: a left join
    // from batch (with n_stream coalesced to 0) makes TOTAL state loss
    // visible as recovered=false rows instead of silently vanishing from
    // an inner join's output.
    batch.join(stream, Seq("event_type"), "left")
      .select(col("event_type"), coalesce(col("n_stream"), lit(0L)).as("n_stream"),
        col("n_batch"),
        (coalesce(col("n_stream"), lit(0L)) === col("n_batch")).as("recovered"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** B35: streaming runtime OBSERVABILITY — the per-batch progress
    * stream (StreamingQueryListener events) across a checkpoint
    * restart, the metrics leg a 100 TB streaming operator actually
    * watches (input rows, batch duration, state-store rows). Same
    * two-run restart harness as [[checkpointRestartCounts]]; each
    * run's QueryProgressEvents are captured by a listener and folded
    * to one deterministic summary row (durations and rates are
    * machine-dependent, so they surface as VALIDITY FLAGS, while row
    * and state counts — functions of the data alone — surface as
    * values). Listener delivery is async; the fold waits on the
    * run's QueryTerminatedEvent, which Spark guarantees to post after
    * stop(), so the drain is race-free.
    */
  def progressMetrics(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val slice = events.select(col("event_id"), col("event_type"))
      .filter(col("event_id") % 50 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = slice.partition(_._1 % 100 == 0)
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_b35_ckpt_$token").toString
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val counts = mem.toDS().toDF("event_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_stream"))
    val progresses =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
        scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.streaming.StreamingQueryProgress]]()
    val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        progresses.computeIfAbsent(e.progress.runId,
          _ => scala.collection.mutable.ArrayBuffer.empty) += e.progress
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        terminated.add(e.runId); ()
      }
    }
    s.streams.addListener(listener)
    try {
      def runOnce(sinkName: String): java.util.UUID = {
        val q = counts.writeStream.format("memory").queryName(sinkName)
          .outputMode("complete").option("checkpointLocation", ckpt).start()
        try { q.processAllAvailable() } finally { q.stop() }
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!terminated.contains(q.runId) && System.nanoTime() < deadline)
          Thread.sleep(20)
        q.runId
      }
      val (run1, run2) = withStatePartitions(s, slice.length.toLong) {
        mem.addData(h1.toIndexedSeq)
        val r1 = runOnce(s"b35_${token}_run1")
        mem.addData(h2.toIndexedSeq)
        val r2 = runOnce(s"b35_${token}_run2")
        (r1, r2)
      }
      def fold(phase: String, runId: java.util.UUID, expRows: Long, expState: Long) = {
        val ps = Option(progresses.get(runId)).map(_.toSeq).getOrElse(Seq.empty)
        val stateMax = ps.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
          .foldLeft(0L)(math.max)
        (phase,
          ps.nonEmpty,
          ps.map(_.numInputRows).sum,
          expRows,
          stateMax,
          expState,
          ps.forall(p => p.batchDuration >= 0 &&
            Option(p.durationMs).forall(m => !m.isEmpty)),
          ps.map(_.numInputRows).sum == expRows && stateMax == expState)
      }
      val types1 = h1.map(_._2).distinct.length.toLong
      val typesAll = slice.map(_._2).distinct.length.toLong
      Seq(
        fold("run1", run1, h1.length.toLong, types1),
        fold("run2_restart", run2, h2.length.toLong, typesAll))
        .toDF("phase", "has_progress", "input_rows", "input_rows_expected",
          "state_rows", "state_rows_expected", "durations_ok", "as_declared")
        .orderBy(col("phase").asc_nulls_first)
    } finally s.streams.removeListener(listener)
  }

  /** B36: exactly-once evidence under DUPLICATE-BATCH REPLAY — the
    * failure Structured Streaming's commit protocol actually leaves
    * open: a crash BETWEEN a sink's write and the commit-log record
    * makes the engine re-execute the already-written micro-batch on
    * restart, so any foreachBatch sink sees the same (batchId, data)
    * twice and "exactly-once" holds only if the sink is idempotent.
    * The harness forces that exact window: run an Upsert-sink stream
    * over batch 1, stop, DELETE the checkpoint's commits/0 entry while
    * keeping offsets/0 (a checkpoint rollback — the on-disk state a
    * mid-commit crash leaves), restart, and let Spark re-execute batch
    * 0 with identical data against the already-merged lake. The row
    * reports the lake's (n, xxhash64-XOR) audit before and after the
    * replay — convergence means byte-identical state — plus a third
    * leg proving the replay then CONTINUES normally (new data batch
    * merges on top). `batch0_runs = 2` is the replayed-batch flag: it
    * certifies the duplicate delivery actually happened rather than
    * the engine silently skipping the batch. Keyed merge (latest-wins
    * by version) is what makes the sink idempotent; a blind-append
    * sink under the same harness would double every batch-1 row.
    */
  def replayedBatchConvergence(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val slice = events
      .select(col("event_id"), col("event_type"),
        // tuple-encoded collect: primitive slots can't carry NULL (the
        // null-injected corpus), so value/ts default — harness payload,
        // not a semantic aggregate
        coalesce(col("value"), lit(0.0)).as("value"),
        coalesce(unix_micros(col("ts")), lit(0L)).as("ts_us"))
      .filter(col("event_id") % 50 === 0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    val (h1, h2) = slice.partition(_._1 % 100 == 0)
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_b36_ckpt_$token").toString
    val lake = java.nio.file.Files.createTempDirectory(s"graft_b36_lake_$token").toString + "/lake"
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double, Long)]
    val batchRuns = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val upserts = mem.toDS()
      .toDF("event_id", "event_type", "value", "ts_us")
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batchRuns.merge(id, 1, (a: Integer, b: Integer) => a + b)
        graft.operators.Upsert.merge(
          batch.sparkSession, lake, batch.toDF(), Seq("event_id"), "ts_us")
      }
    def runOnce(): Unit = {
      val q = upserts.start()
      try { q.processAllAvailable() } finally { q.stop() }
    }
    // state partitions sized to the feed — also right-sizes the
    // foreachBatch Upsert.merge's shuffle (and thus the lake's file
    // count: guide §6 small-files) for the O(thousands)-row harness
    val (audit1, audit2, audit3) = withStatePartitions(s, slice.length.toLong) {
      mem.addData(h1.toIndexedSeq)
      runOnce()
      val a1 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
      // checkpoint rollback: offsets/0 stays, commits/0 goes — the state
      // a crash between sink write and commit record leaves behind
      val removed = new java.io.File(s"$ckpt/commits/0").delete()
      require(removed, s"commit log entry missing at $ckpt/commits/0")
      // the local FS keeps a checksum sidecar next to the entry; the
      // re-commit's rename refuses to overwrite it if left behind
      new java.io.File(s"$ckpt/commits/.0.crc").delete()
      runOnce() // re-executes batch 0 with identical data
      val a2 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
      mem.addData(h2.toIndexedSeq)
      runOnce() // and the stream continues normally past the replay
      val a3 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
      (a1, a2, a3)
    }
    val expectedFinal = slice.length.toLong // event_id is unique per row
    Seq(
      ("run1_committed", audit1.nRows, audit1.checksum,
        audit1.nRows == h1.length.toLong),
      ("replay_converged", audit2.nRows, audit2.checksum, audit2 == audit1),
      ("resumed_after_replay", audit3.nRows, audit3.checksum,
        audit3.nRows == expectedFinal),
      ("batch0_runs", batchRuns.getOrDefault(0L, 0).toLong, 0L,
        batchRuns.getOrDefault(0L, 0) == 2))
      .toDF("stage", "n_rows", "checksum", "as_declared")
      .orderBy(col("stage").asc_nulls_first)
  }

  /** Fault armed/disarmed across the [[midWriteCrashRecovery]] run.
    * Static JVM state is the local-mode stand-in for a real task death
    * (same device as b36's batchRuns map); on a cluster the fault would
    * be a killed executor, which this row's window — a writer dying
    * MID-batch, sink files partially written — models exactly.
    */
  private val midWriteFault = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** B37 (VERDICT r10 item 8): the LAST exactly-once window b36 left
    * open. b36 proved duplicate-batch REPLAY converges (crash between
    * sink write and commit record); this row crashes the writer
    * *mid*-write — a task throws while the upsert's staged rewrite is
    * in flight, after sibling tasks have already written their part
    * files — and demonstrates the sink-side guarantee: the lake path's
    * audit is BYTE-IDENTICAL before and after the failed attempt,
    * because Upsert.merge materializes into `path__upsert_tmp` and the
    * lake only ever advances by the post-write atomic swap. Partial
    * files exist (in the staging dir), but no reader of the lake path
    * can observe them; the restarted query replays the batch from the
    * checkpoint (same offsets), the staged Overwrite clears the debris,
    * and the final audit equals the clean-run expectation with
    * attempt_count 2.
    */
  def midWriteCrashRecovery(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val slice = events
      .select(col("event_id"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"),
        coalesce(unix_micros(col("ts")), lit(0L)).as("ts_us"))
      .filter(col("event_id") % 50 === 0)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val (h1, h2) = slice.partition(_._1 % 100 == 0)
    // empty corpus (EmptyCorpusSpec): no victim row exists, the fault
    // can never fire, and the crash/attempt stages hold vacuously
    val degenerate = h2.isEmpty
    val faultId = if (degenerate) -1L else h2.map(_._1).min // deterministic victim row
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_b37_ckpt_$token").toString
    val lake = java.nio.file.Files.createTempDirectory(s"graft_b37_lake_$token").toString + "/lake"
    // the fault rides INSIDE the staged write's scan: identity on value,
    // throws for the victim row while armed — so the write job dies with
    // other tasks' part files already staged (a UDF, sanctioned here: it
    // IS the fault injector, not a compute path)
    val faultFn = udf { (id: Long, v: Double) =>
      if (midWriteFault.get && id == faultId)
        throw new RuntimeException(s"b37 injected mid-write fault at event_id=$id")
      v
    }
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double, Long)]
    val attempts = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val upserts = mem.toDS()
      .toDF("event_id", "event_type", "value", "ts_us")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        attempts.merge(id, 1, (a: Integer, b: Integer) => a + b)
        val df = batch.toDF()
          .withColumn("value", faultFn(col("event_id"), col("value")))
        graft.operators.Upsert.merge(
          batch.sparkSession, lake, df, Seq("event_id"), "ts_us")
      }
    // returns true iff the run failed with the injected fault
    def runOnce(): Boolean = {
      val q = upserts.start()
      try { q.processAllAvailable(); false }
      catch { case e: Throwable =>
        val injected = Iterator.iterate[Throwable](e)(_.getCause)
          .takeWhile(_ != null).take(16)
          .exists(c => Option(c.getMessage).exists(_.contains("b37 injected")))
        require(injected, s"unexpected failure (not the injected fault): $e")
        true
      } finally q.stop()
    }
    val (audit1, crashed, audit2, audit3) =
      withStatePartitions(s, slice.length.toLong) {
        midWriteFault.set(false)
        mem.addData(h1.toIndexedSeq)
        require(!runOnce(), "seed batch must commit cleanly")
        val a1 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
        midWriteFault.set(true) // arm: next batch dies mid-staged-write
        mem.addData(h2.toIndexedSeq)
        val cr = runOnce()
        val a2 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
        midWriteFault.set(false) // writer "restarts" healthy
        require(!runOnce(), "replay after disarm must commit cleanly")
        val a3 = graft.ingest.LoadAudit.audit(s.read.parquet(lake))
        (a1, cr, a2, a3)
      }
    Seq(
      ("seed_committed", audit1.nRows, audit1.checksum,
        audit1.nRows == h1.length.toLong),
      ("crash_confirmed_midwrite", if (crashed) 1L else 0L, 0L,
        crashed || degenerate),
      ("lake_unchanged_after_crash", audit2.nRows, audit2.checksum,
        audit2 == audit1),
      ("replay_completed", audit3.nRows, audit3.checksum,
        audit3.nRows == slice.length.toLong),
      ("fault_batch_attempts", attempts.getOrDefault(1L, 0).toLong, 0L,
        attempts.getOrDefault(1L, 0) >= (if (degenerate) 1 else 2)))
      .toDF("stage", "n_rows", "checksum", "as_declared")
      .orderBy(col("stage").asc_nulls_first)
  }
}
