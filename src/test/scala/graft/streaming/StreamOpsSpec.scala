package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.StreamingBatch

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

/** B7–B9: streaming results must equal their oracle-checked batch twins
  * on the same rows, and watermarks must drop too-late rows.
  */
class StreamOpsSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    Ev(1, t("2024-01-01 00:05:00"), 1, "click", 1.0, "{}"),
    Ev(2, t("2024-01-01 00:50:00"), 1, "view", 1.0, "{}"),
    Ev(3, t("2024-01-01 01:10:00"), 2, "click", 1.0, "{}"),
    Ev(4, t("2024-01-01 01:20:00"), 1, "click", 1.0, "{}"),  // out of order vs 3
    Ev(5, t("2024-01-01 02:40:00"), 2, "view", 1.0, "{}"),
    Ev(6, t("2024-01-01 02:41:00"), 2, "view", 1.0, "{}"))

  private def runStream(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        feed: Seq[Seq[Ev]], queryName: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = build(mem.toDF())
      .writeStream.format("memory").queryName(queryName)
      .outputMode("complete").start()
    try {
      feed.foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(queryName)
  }

  test("streaming tumbling counts == batch twin on the same rows") {
    import spark.implicits._
    val got = runStream(StreamOps.tumblingCounts(_), Seq(rows.take(3), rows.drop(3)), "tumb")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // batch twin semantics: date_trunc hour × type (StreamingBatch row
    // verified against DuckDB) applied to the same in-memory rows
    val want = rows.toDF()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n")
      .orderBy("start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming session windows match gaps-and-islands batch semantics") {
    import spark.implicits._
    val got = runStream(StreamOps.sessionCounts(_), Seq(rows), "sess")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    // user 1: 00:05 | 00:50..01:20 (40-min span, gaps < 30m) → 2 sessions
    // user 2: 01:10 | 02:40,02:41 → 2 sessions
    assert(got.toSeq == Seq(
      (1L, t("2024-01-01 00:05:00"), 1L),
      (1L, t("2024-01-01 00:50:00"), 2L),
      (2L, t("2024-01-01 01:10:00"), 1L),
      (2L, t("2024-01-01 02:40:00"), 2L)))
  }

  test("watermark drops a too-late row in update mode") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late")
      .outputMode("update").start()
    try {
      mem.addData(Ev(1, t("2024-01-01 05:00:00"), 1, "click", 1.0, "{}"))
      q.processAllAvailable() // watermark advances to 04:50
      mem.addData(Ev(2, t("2024-01-01 01:00:00"), 1, "click", 1.0, "{}")) // 4h late
      q.processAllAvailable()
      mem.addData(Ev(3, t("2024-01-01 05:01:00"), 1, "view", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val hours = spark.table("late").select("window_start").collect()
      .map(_.getTimestamp(0)).toSet
    assert(hours.contains(t("2024-01-01 05:00:00")))
    assert(!hours.contains(t("2024-01-01 01:00:00")), "late row must be dropped")
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(rows.head, rows.head.copy(value = 9.9), rows(1))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState keeps per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[GEvent]
    val q = StreamOps.runningUserAggs(mem.toDS())
      .writeStream.format("memory").queryName("state")
      .outputMode("update").start()
    try {
      mem.addData(GEvent(1, t("2024-01-01 00:00:00"), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(
        GEvent(2, t("2024-01-01 00:01:00"), 1, "view", 3.0),
        GEvent(3, t("2024-01-01 00:02:00"), 2, "click", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    // update mode: the LAST row per user carries the accumulated state
    val last = spark.table("state")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(last.toSeq == Seq((1L, 2L, 5.0), (2L, 1L, 5.0)))
  }

  test("transformWithState keeps per-user totals across micro-batches (matches fMGWS twin)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[GEvent]
      val q = StreamOps.runningUserAggsTws(mem.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode("update").start()
      try {
        mem.addData(GEvent(1, t("2024-01-01 00:00:00"), 1, "click", 2.0))
        q.processAllAvailable()
        mem.addData(
          GEvent(2, t("2024-01-01 00:01:00"), 1, "view", 3.0),
          GEvent(3, t("2024-01-01 00:02:00"), 2, "click", 5.0))
        q.processAllAvailable()
      } finally q.stop()
      // cross-batch state: same assertion as the flatMapGroupsWithState twin
      val last = spark.table("tws")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(last.toSeq == Seq((1L, 2L, 5.0), (2L, 1L, 5.0)))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming upsert sink merges micro-batches into the lake (CDC pattern)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString + "/t"
    val mem = MemoryStream[(Long, String, Int)]
    val q = StreamOps.upsertSink(
        mem.toDF().toDF("id", "payload", "version"), dir, Seq("id"), "version")
      .start()
    try {
      mem.addData((1L, "a", 1), (2L, "b", 1))
      q.processAllAvailable()
      // second batch: update id=2, insert id=3
      mem.addData((2L, "b2", 2), (3L, "c", 1))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
  }

  test("stream-stream join matches purchases to clicks within 30 minutes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps.clickToPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(10, t("2024-01-01 01:00:00"), 1, "click", 1.0, "{}"),
        Ev(11, t("2024-01-01 02:00:00"), 1, "click", 1.0, "{}"),
        Ev(12, t("2024-01-01 01:05:00"), 2, "click", 1.0, "{}"))
      purchases.addData(
        Ev(20, t("2024-01-01 01:10:00"), 1, "purchase", 9.0, "{}"), // ← click 10
        Ev(21, t("2024-01-01 03:00:00"), 1, "purchase", 9.0, "{}"), // no click in range
        Ev(22, t("2024-01-01 01:20:00"), 2, "purchase", 9.0, "{}")) // ← click 12
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssjoin")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((20L, 10L), (22L, 12L)))
  }

  test("b7_stream_join range-frame rewrite ≡ stream-operator batch plan (two SFs)") {
    // r13: the declared batch row computes the interval join with a
    // per-user range-frame window (output-proportional; the SMJ batch
    // plan of the stream operator enumerates |clicks_u|×|purchases_u|
    // candidates per user — 3.6e9 for skew-sf1's hot user vs 2.5e6 true
    // pairs). Pin exact pair-set equality against the stream operator
    // run in batch mode on two SFs.
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = graft.Tables.events(spark, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val want = StreamOps.clickToPurchaseJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .select(col("purchase_id"), col("click_id"), col("user_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val got = graft.SparkEntry.queries("b7_stream_join")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got.nonEmpty, s"$d: no pairs — fixture degenerate")
      assert(got == want, s"$d: range-frame rewrite diverges from the join form")
    }
  }

  test("native session_window runtime: out-of-order feed matches batch operator; exact gap MERGES") {
    import spark.implicits._
    // stream_session_native's oracle pins `>` (an event exactly gap
    // after the last MERGES); assert the same boundary holds in the
    // actual streaming runtime, fed out of order (VERDICT r5 item 6).
    val sess = Seq(
      Ev(1, t("2024-01-01 00:00:00"), 1, "click", 1.0, "{}"),
      Ev(2, t("2024-01-01 00:30:00"), 1, "view", 1.0, "{}"),  // exactly gap → merge
      Ev(3, t("2024-01-01 01:00:01"), 1, "click", 1.0, "{}"), // 30:01 → NEW session
      Ev(4, t("2024-01-01 00:10:00"), 2, "click", 1.0, "{}"))
    // batch 1 delivers the LATER events first; batch 2 back-fills
    // earlier ones within the watermark delay — intra- and inter-batch
    // disorder
    val got = runStream(StreamOps.sessionCounts(_, watermark = "2 hours"),
        Seq(Seq(sess(2), sess(1)), Seq(sess(0), sess(3))), "sessNative")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    // the SAME native operator in batch mode is the oracle-checked twin
    val want = StreamOps.sessionCounts(sess.toDF(), watermark = "2 hours")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq, "streaming != batch session_window")
    assert(got.toSeq == Seq(
      (1L, t("2024-01-01 00:00:00"), 2L),   // 00:00 + exact-gap 00:30 merged
      (1L, t("2024-01-01 01:00:01"), 1L),
      (2L, t("2024-01-01 00:10:00"), 1L)))
  }

  test("runtime watermark lateness boundary: live-window late rows kept, closed-window rows dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // stream_late_events' batch accounting drops an event iff it is
    // STRICTLY more than 30 min behind the watermark; the runtime
    // equivalent for a 1-hour tumbling aggregate: a late row is lost
    // iff its WINDOW has closed (window end <= watermark), while a row
    // arriving 29+ min late into a still-open window must be merged.
    val mem = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(mem.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("lateBound")
      .outputMode("update").start()
    try {
      mem.addData(Ev(1, t("2024-01-01 05:00:00"), 1, "click", 1.0, "{}"))
      q.processAllAvailable() // watermark → 04:30
      mem.addData(
        Ev(2, t("2024-01-01 03:59:00"), 1, "click", 1.0, "{}"), // window [03:00,04:00) closed → dropped
        Ev(3, t("2024-01-01 04:01:00"), 1, "click", 1.0, "{}"), // 29 min late, window [04:00,05:00) open → kept
        Ev(4, t("2024-01-01 04:30:00"), 1, "click", 1.0, "{}")) // at the watermark, window open → kept
      q.processAllAvailable()
    } finally q.stop()
    val byWindow = spark.table("lateBound")
      .groupBy("window_start").agg(max("n").as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(!byWindow.contains(t("2024-01-01 03:00:00")),
      "row for a watermark-closed window must be dropped")
    assert(byWindow(t("2024-01-01 04:00:00")) == 2L,
      "late rows within a still-open window must be merged")
    assert(byWindow(t("2024-01-01 05:00:00")) == 1L)
  }

  test("sliding counts: each event lands in 4 windows") {
    import spark.implicits._
    val got = runStream(StreamOps.slidingCounts(_), Seq(rows.take(1)), "slide")
    assert(got.count() == 4)
    assert(got.agg(sum("n")).collect().head.getLong(0) == 4)
  }

  test("checkpoint restart recovers aggregation state across query objects") {
    val got = StreamOps.checkpointRestartCounts(graft.Tables.events(spark, sf()))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty, "slice produced no event types")
    // every type's post-restart count equals the both-halves ground
    // truth — only possible if run 2 restored run 1's state store
    got.foreach { case (t, nStream, nBatch, recovered) =>
      assert(recovered && nStream == nBatch, s"$t: stream=$nStream batch=$nBatch")
    }
    // the restart must actually have been exercised: both halves of the
    // slice are nonempty, so a state-less run 2 would undercount
    val ids = graft.Tables.events(spark, sf())
      .select(col("event_id")).collect().map(_.getLong(0)).filter(_ % 50 == 0)
    assert(ids.exists(_ % 100 == 0) && ids.exists(_ % 100 != 0),
      "slice halves degenerate — restart not exercised")
  }

  test("duplicate-batch replay: Upsert sink converges, batch 0 runs twice") {
    val got = StreamOps.replayedBatchConvergence(graft.Tables.events(spark, sf()))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // the replay actually happened — foreachBatch saw (0, data) twice
    assert(got("batch0_runs") == ((2L, 0L, true)), s"$got")
    // and converged: identical lake audit before/after the re-execution
    assert(got("replay_converged")._3, s"lake diverged under replay: $got")
    assert(got("replay_converged")._1 == got("run1_committed")._1 &&
      got("replay_converged")._2 == got("run1_committed")._2)
    // then the stream kept going: second half merged on top
    assert(got("resumed_after_replay")._3, s"stream did not resume: $got")
    assert(got("resumed_after_replay")._1 > got("run1_committed")._1)
  }
}
