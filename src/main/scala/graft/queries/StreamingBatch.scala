package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 11 — batch-checkable projections of the streaming
  * window semantics. The streaming runtime twins (watermarks, state
  * store) live in graft.streaming and are asserted equal to these in
  * ScalaTest (§2B B7–B9); these rows pin the window SEMANTICS against
  * DuckDB.
  */
object StreamingBatch {

  /** 1-hour tumbling window × event_type. Epoch-aligned in both engines,
    * so `window(ts, '1 hour').start` == `date_trunc('hour', ts)`.
    */
  val streamTumblingBatch: Q = Q(
    "stream_tumbling_batch",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      |       event_type, count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start NULLS FIRST, event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start").asc_nulls_first, col("event_type").asc_nulls_first)
  }

  /** 1-hour window sliding every 15 min — each event lands in exactly 4
    * windows. Oracle: explode offsets 0..3 from the event's 15-min
    * bucket (identical epoch alignment).
    */
  val streamSlidingBatch: Q = Q(
    "stream_sliding_batch",
    """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
      |                      - CAST(k AS BIGINT) * 900000000) AS window_start,
      |       count(*) AS n
      |FROM events, unnest([0, 1, 2, 3]) AS u(k)
      |GROUP BY 1
      |ORDER BY window_start NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
      .orderBy(col("window_start").asc_nulls_first)
  }

  /** Per-user session windows with a 30-minute gap — gaps-and-islands.
    * This row DECLARES that a gap of exactly 30 min starts a new
    * session (>=). Boundary note (measured, BoundarySpec): Spark's
    * native session_window instead MERGES the exact-gap event — see
    * stream_session_native, whose oracle uses strict >. The two
    * formulations differ only on that measure-zero boundary.
    */
  val streamSessionBatch: Q = Q(
    "stream_session_batch",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |              OR lag(ts) OVER w IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_id, ts,
      |         -- CAST: duckdb sum(int) is HUGEINT (-> float64 in the driver's
      |         -- pandas hasher); Spark's is BIGINT. Align on BIGINT.
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts) AS session_start, max(ts) AS session_end
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id NULLS FIRST, session_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .withColumn("new_session",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) >= 1800000000L
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id").asc_nulls_first, col("session_id").asc_nulls_first)
  }

  /** Watermark late-data accounting, batch twin: how many events would
    * a 30-min watermark drop? Source partition = user_id % 8 (the
    * kafka-partition shape — Spark tracks per-partition watermarks
    * before min-combining them). Arrival order within a partition is a
    * DETERMINISTIC md5 permutation of event_id: the corpus' event_id
    * correlates with event time (in-order delivery ⇒ zero late events,
    * a vacuous query), so the md5 shuffle models out-of-order delivery
    * reproducibly in both engines. An event is late iff its ts is
    * > 30 min behind the max event-time already seen in its partition
    * (frame ends at 1 PRECEDING: the watermark an event is judged
    * against excludes the event itself). Partitioned running max —
    * scales with partition count, no global sort.
    */
  val streamLateEvents: Q = Q(
    "stream_late_events",
    """WITH arr AS (
      |  SELECT user_id % 8 AS part, ts,
      |         max(ts) OVER (
      |           PARTITION BY user_id % 8
      |           ORDER BY substring(md5(CAST(event_id AS VARCHAR)), 1, 8), event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_ts
      |  FROM events)
      |SELECT part, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(*) FILTER (
      |         WHERE epoch_us(ts) < epoch_us(wm_ts) - 1800000000) AS BIGINT)
      |         AS n_late
      |FROM arr GROUP BY part
      |ORDER BY part NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("part"))
      .orderBy(substring(md5(col("event_id").cast("string")), 1, 8), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    T.events(s, d)
      .select((col("user_id") % 8).as("part"), col("event_id"), col("ts"))
      .withColumn("wm_ts", max(col("ts")).over(w))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_events"),
        count(when(
          unix_micros(col("ts")) < unix_micros(col("wm_ts")) - 1800000000L, 1))
          .as("n_late"))
      .orderBy(col("part").asc_nulls_first)
  }

  /** Spark's NATIVE session_window operator in batch — a different
    * physical plan (UpdatingSessions + merging aggregate) from
    * stream_session_batch's gaps-and-islands windows. Boundary pin
    * (BoundarySpec, crafted exact-gap corpus): the native operator
    * MERGES an event arriving exactly gap after the last one — a new
    * session opens only at gap STRICTLY greater than 30 min — so this
    * oracle uses `>` where stream_session_batch's portable idiom
    * declares `>=`. The two rows agree everywhere except that
    * measure-zero boundary (µs-resolution telemetry never lands on
    * it), and each row's oracle matches ITS semantics exactly.
    */
  val streamSessionNative: Q = Q(
    "stream_session_native",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |              OR lag(ts) OVER w IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM flagged
      |)
      |SELECT user_id,
      |       CAST(min(ts) AS TIMESTAMP) AS session_start,
      |       CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
      |       count(*) AS n_events
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id").asc_nulls_first, col("session_start").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(streamTumblingBatch, streamSlidingBatch, streamSessionBatch,
    streamLateEvents, streamSessionNative)
}
