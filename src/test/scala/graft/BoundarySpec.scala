package graft

import org.apache.spark.sql.functions._

/** Boundary-semantics pins: crafted event tables fed through the REAL
  * declared query functions (the fns read `$dir/events.parquet`, so a
  * crafted dir exercises the exact production code path). The DuckDB
  * oracle proves Spark and DuckDB AGREE; these tests pin that the
  * agreed semantics are the INTENDED ones at the exact boundaries —
  * an off-by-one both engines shared would pass the oracle but fail
  * here.
  */
class BoundarySpec extends SparkSpec {

  import spark.implicits._

  /** Write a crafted events table; ts arrives as INT64 nanos exactly
    * like the driver fixture (Tables.events normalizes via div 1000).
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_boundary").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val H = 3600000000000L // 1 hour in nanos

  /** Write a crafted documents table (schema matches the driver fixture). */
  private def documentsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_boundary_docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("join_asof_tolerance: a click EXACTLY 1 h old is kept; 1 µs older is nulled") {
    val d = eventsDir(Seq(
      (1L, 0L, 7L, "click", 0.0),
      (2L, H, 7L, "purchase", 0.0),          // age exactly 1 h → kept
      (3L, H + 1000L, 7L, "purchase", 0.0))) // 1 µs past tolerance → NULL
    val got = graft.queries.Joins.joinAsofTolerance.fn(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got === Map(2L -> Some(1L), 3L -> None))
  }

  test("ts_rolling_1h: an event EXACTLY 1 h back is inside the frame; 1 µs further is not") {
    val d = eventsDir(Seq(
      (1L, 0L, 1L, "cpu", 1.0),
      (2L, H, 1L, "cpu", 1.0),            // window [t2 − 1 h, t2] includes e1
      (3L, 2 * H + 1000L, 1L, "cpu", 1.0))) // e2 is 1 h + 1 µs back → excluded
    val got = graft.queries.TimeSeriesOps.tsRolling1h.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("session windows: the exact-30-min gap splits in the islands idiom, MERGES natively") {
    // measured divergence this spec exists to pin: Spark's native
    // session_window merges an event arriving EXACTLY gap after the
    // last (new session only at gap > 30 min), while the portable
    // gaps-and-islands row declares >= — each row's oracle matches its
    // own semantics; they differ only on this measure-zero boundary
    val G = 1800000000000L // 30 min in nanos
    val d = eventsDir(Seq(
      (1L, 0L, 5L, "view", 0.0),
      (2L, G - 1000L, 5L, "view", 0.0), // 30 min − 1 µs after e1 → same session (both)
      (3L, 2 * G - 1000L, 5L, "view", 0.0), // exactly 30 min after e2 → islands split, native merges
      (4L, 3 * G, 5L, "view", 0.0)))    // 30 min + 1 µs after e3 → new session (both)
    val islands = graft.queries.StreamingBatch.streamSessionBatch.fn(spark, d)
      .collect().map(_.getLong(2))
    assert(islands.toSeq.sorted === Seq(1L, 1L, 2L),
      s"islands sessions: ${islands.toSeq}")
    val native = graft.queries.StreamingBatch.streamSessionNative.fn(spark, d)
      .collect().map(_.getLong(3))
    assert(native.toSeq.sorted === Seq(1L, 3L),
      s"native sessions: ${native.toSeq}")
  }

  test("scd2_asof_lookup: a probe EXACTLY at valid_from sees the NEW state") {
    // bounds [0, 4 h] put probe 1 exactly at 1 h; the state flips to
    // 'beta' by an event at exactly 1 h — inclusive boundary → 'beta'
    val d = eventsDir(Seq(
      (1L, 0L, 2L, "alpha", 0.0),
      (2L, H, 2L, "beta", 0.0),
      (3L, 4L * H, 2L, "alpha", 0.0)))
    val got = graft.queries.TimeSeriesOps.scd2AsofLookup.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(3)).toMap
    assert(got((2L, 1)) === "beta", "probe at the exact interval start is inclusive")
    assert(got((2L, 2)) === "beta")
    assert(got((2L, 3)) === "beta")
  }

  test("dedup_incremental: Jaccard EXACTLY 0.5 is flagged; below is not") {
    // corpus doc 1 vs batch doc 250: shingle sets {abc,bcd,cde} vs
    // {abc,bcd,cdf} → i=2, u=4 → J = 2/4 = 0.5 exactly (0.5 is exact in
    // binary, so the >= threshold fires identically in both engines);
    // batch doc 251 shares 1 of 5 shingles → J = 0.2 → not flagged
    val d = documentsDir(Seq(
      (1L, "a b c d e", "en", "src0"),
      (250L, "a b c d f", "en", "src0"),
      (251L, "a b x y z", "en", "src0")))
    val got = graft.queries.LlmOpsPipeline.dedupIncremental.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((250L, 1L, 0.5)),
      s"exact-threshold pair must be flagged, sub-threshold must not: ${got.toSeq}")
  }

  test("k_anonymity: a QI group of EXACTLY k=5 is safe; 4 is at risk") {
    val five = (1L to 5L).map(i => (i, "doc", "en", "src0"))
    val four = (11L to 14L).map(i => (i, "doc", "de", "src1"))
    val d = documentsDir(five ++ four)
    val got = graft.queries.CorpusOps.kAnonymity.fn(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("en") === ((1L, 0L, 0L)), "a group of exactly k is NOT risky")
    assert(got("de") === ((1L, 1L, 4L)), "a group of k-1 is risky")
  }

  test("text_entropy: uniform text scores exactly 0; a 50/50 split scores exactly 1") {
    val d = documentsDir(Seq(
      (1L, "aaaa", "en", "src0"), // one symbol → H = 0 exactly
      (2L, "ab", "en", "src0"),   // two equiprobable symbols → H = 1 exactly
      (3L, "abcd", "en", "src0"))) // four equiprobable → H = 2 exactly
    val got = graft.queries.CorpusOps.textEntropy.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
  }

  test("event_attribution: a touch EXACTLY 24 h old is attributed; 1 µs older is direct") {
    val D = 24L * H
    val d = eventsDir(Seq(
      (1L, 0L, 7L, "click", 0.0),
      (2L, D, 7L, "purchase", 10.0),        // touch age exactly 24 h → attributed
      (3L, 0L, 8L, "view", 0.0),
      (4L, D + 1000L, 8L, "purchase", 5.0), // 1 µs past the window → direct
      // latest-touch tiebreak: two touches, the LATER one wins
      (5L, 0L, 9L, "view", 0.0),
      (6L, 1000L, 9L, "click", 0.0),
      (7L, 2000L, 9L, "purchase", 1.0)))
    val got = graft.queries.LlmOpsAnalytics.eventAttribution.fn(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      "click" -> ((2L, 11.0)),  // user 7 (exact-24h click) + user 9 (latest touch)
      "direct" -> ((1L, 5.0)))) // user 8's touch fell 1 µs out of window
  }

  test("stream_tumbling_batch: an event EXACTLY on the hour lands in the NEW bucket") {
    val d = eventsDir(Seq(
      (1L, H - 1000L, 3L, "view", 0.0), // 1 µs before the hour → bucket 0
      (2L, H, 3L, "view", 0.0)))        // exactly on the hour → bucket 1
    val got = graft.queries.StreamingBatch.streamTumblingBatch.fn(spark, d)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(2)))
    assert(got.length === 2 && got.forall(_._2 == 1L),
      s"hour-boundary event must open its own bucket: ${got.toSeq}")
  }

  private val M5 = 300000000000L // 5 minutes in nanos

  test("max_concurrency: an interval opening EXACTLY at another's close is NOT concurrent") {
    // half-open [t, t+5m): the close at t+5m sorts before the open at
    // t+5m (delta −1 < +1), so back-to-back intervals never overlap
    val d = eventsDir(Seq(
      (1L, 0L, 1L, "cpu", 0.0),
      (2L, M5, 1L, "cpu", 0.0),          // opens exactly at e1's close → peak stays 1
      (3L, 2 * M5 - 1000L, 1L, "cpu", 0.0))) // 1 µs before e2's close → peak 2
    val got = graft.queries.SegmentOps.maxConcurrency.fn(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("cpu" -> 2L),
      s"back-to-back must not count as concurrent, 1 µs overlap must: $got")
  }

  test("equi_depth_hist: a value EXACTLY on a cutpoint lands in the LOWER bucket") {
    // values 0..10: quantile_cont(i/10) over 11 points is exactly i, so
    // every cutpoint coincides with a data value — the strict `>` puts
    // each boundary value in the bucket BELOW its cut
    val d = eventsDir((0 to 10).map(i => (i.toLong + 1, i * H, 1L, "cpu", i.toDouble)))
    val got = graft.queries.SegmentOps.equiDepthHist.fn(spark, d).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    val expected = (0 to 10).map(v => (1 to 9).count(c => v > c))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expected, s"got $got expected $expected")
    assert(got(0) == 2L, "0 and 1 both sit at-or-below the first cut")
  }

  test("transition_matrix: same-microsecond events order by event_id") {
    val d = eventsDir(Seq(
      (1L, 0L, 9L, "view", 0.0),
      (2L, 0L, 9L, "click", 0.0),    // same µs as e1 → ordered by event_id
      (3L, H, 9L, "purchase", 0.0)))
    val got = graft.queries.SegmentOps.transitionMatrix.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("view", "click") -> 1L, ("click", "purchase") -> 1L),
      s"tie must break by event_id: $got")
  }

  /** Crafted orders table (only the columns the queries project). */
  private def ordersDir(rows: Seq[(Long, Long, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_boundary_ord").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_date_str")
      .withColumn("o_orderdate", to_timestamp($"o_date_str"))
      .drop("o_date_str")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("rfm_segment: ALL-tied customers collapse into one cell (strict >, not ntile)") {
    // four identical customers: every quintile cutpoint equals the
    // metric, strict > scores all of them (r,f,m) = (5,1,1) — ntile
    // would arbitrarily split the tie 1/2/3/4 across buckets
    val d = ordersDir(Seq(
      (1L, 101L, 100.0, "2024-01-01 00:00:00"),
      (2L, 102L, 100.0, "2024-01-01 00:00:00"),
      (3L, 103L, 100.0, "2024-01-01 00:00:00"),
      (4L, 104L, 100.0, "2024-01-01 00:00:00")))
    val got = graft.queries.SegmentOps.rfmSegment.fn(spark, d).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
    assert(got.toSeq === Seq(((5, 1, 1), 4L)),
      s"tied metrics must land in ONE cell: ${got.toSeq}")
  }

  test("dedup_containment is directional: substring doc flags, container does not") {
    val contained = "alpha beta gamma delta epsilon zeta eta theta"       // 8 tokens
    val container = contained + " iota kappa lambda mu"                    // 12 tokens
    val d = documentsDir(Seq(
      (1L, contained, "en", "s"),
      (2L, container, "en", "s"),
      (3L, "totally different words with no shared shingles at all", "en", "s")))
    val got = graft.queries.LlmOpsExt.dedupContainment.fn(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
    // A's 6 shingles all appear in B (C=1.0); B→A is 6/10 = 0.6 < 0.8;
    // doc 3 shares nothing
    assert(got.toSeq === Seq(((1L, 2L), (1.0, 6L))),
      s"only the contained→container direction may flag: ${got.toSeq}")
  }

  test("dedup_containment df-cap: a pair sharing ONLY stop-shingles (df>32) stays silent") {
    // doc 1 is one shingle ("aa bb cc") that 33 other docs also carry →
    // df = 35 > 32 → stop-shingle. Unguarded containment would flag
    // doc 1 inside every carrier at C = 1.0; the guard leaves doc 1
    // with zero informative shingles, so it must vanish. The rare-tail
    // control pair (2 ⊂ 3) must still flag at 1.0.
    val carriers = (10L to 42L).map(i =>
      (i, s"aa bb cc x$i y$i z$i", "en", "s"))
    val d = documentsDir(Seq(
      (1L, "aa bb cc", "en", "s"),
      (2L, "pp qq rr ss", "en", "s"),
      (3L, "pp qq rr ss tt uu", "en", "s")) ++ carriers)
    val got = graft.queries.LlmOpsExt.dedupContainment.fn(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
    assert(got.toSeq === Seq(((2L, 3L), (1.0, 2L))),
      s"stop-shingle-only pairs must not flag: ${got.toSeq}")
  }

  test("dedup_ngram_jaccard df-cap: a pair similar ONLY through stop-shingles (df>32) stays silent") {
    // docs 1 and 2 share one shingle ("aa bb cc") that 33 other docs
    // also carry → df = 35 > 32 → stop-shingle. Unguarded Jaccard would
    // flag (1,2); the guard removes the shingle from intersection AND
    // union, leaving them with no shared kept shingle. The rare-tail
    // control pair (3,4) shares 2 of 3 kept shingles (J = 2/4 = 0.5)
    // and must still flag.
    val carriers = (10L to 42L).map(i =>
      (i, s"aa bb cc x$i y$i z$i", "en", "s"))
    val d = documentsDir(Seq(
      (1L, "aa bb cc dd ee ff", "en", "s"),
      (2L, "aa bb cc gg hh ii", "en", "s"),
      (3L, "pp qq rr ss tt", "en", "s"),
      (4L, "pp qq rr ss uu", "en", "s")) ++ carriers)
    val got = graft.queries.LlmOpsExt.dedupNgramJaccard.fn(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.toSeq === Seq(((3L, 4L), 0.5)),
      s"stop-shingle-only pairs must not flag: ${got.toSeq}")
  }

  test("ts_backlog: an order shipping the day it was placed nets to zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_boundary_bl").toString
    Seq((1L, 50L, 10.0, "2024-01-03 10:00:00"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "s")
      .withColumn("o_orderdate", to_timestamp($"s")).drop("s")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq((1L, "2024-01-03 18:00:00"), (1L, "2024-01-05 09:00:00"))
      .toDF("l_orderkey", "s")
      .withColumn("l_shipdate", to_timestamp($"s")).drop("s")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    // lifetime = Jan 3 → Jan 5 (LAST shipment closes the order)
    val got = graft.queries.TimeSeriesOps.tsBacklog.fn(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1))
    assert(got.toSeq === Seq("2024-01-03" -> 1L, "2024-01-05" -> 0L),
      s"open on placement day, closed by the LAST shipment: ${got.toSeq}")
  }
}
