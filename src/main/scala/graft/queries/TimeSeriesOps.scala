package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Time-series reshaping over the events stream: downsample to an
  * hourly grid per series, fill gaps (empty buckets), and interpolate
  * with last-observation-carried-forward — the standard prep before
  * charting/forecasting. Scale: the grid is (n_series × n_hours) rows
  * built by a generator from a 1-row bounds aggregate (no driver
  * action); the LOCF window partitions by series, so state never
  * crosses a series boundary.
  */
object TimeSeriesOps {

  val tsGapfillLocf: Q = Q(
    "ts_gapfill_locf",
    """WITH b AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(h) AS lo, max(h) AS hi FROM b
      |), grid AS (
      |  SELECT t.event_type, CAST(u.h AS TIMESTAMP) AS h
      |  FROM (SELECT DISTINCT event_type FROM events) t,
      |       bounds, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS u(h)
      |)
      |SELECT grid.event_type, grid.h, coalesce(b.n, 0) AS n,
      |       last_value(b.v IGNORE NULLS)
      |         OVER (PARTITION BY grid.event_type ORDER BY grid.h
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
      |FROM grid LEFT JOIN b ON grid.event_type = b.event_type AND grid.h = b.h
      |ORDER BY grid.event_type NULLS FIRST, grid.h NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d)
    val b = e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
    val bounds = b.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(grid("event_type")).orderBy(grid("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b,
        grid("event_type") === b("event_type") && grid("h") === b("h"), "left")
      .select(grid("event_type"), grid("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
      .orderBy(col("event_type").asc_nulls_first, col("h").asc_nulls_first)
  }

  /** Hourly OHLC (open/high/low/close) candles per series — the other
    * standard downsample. Open/close via row_number over (ts, event_id)
    * (ties on ts broken by the unique event id — D4); high/low are
    * comparisons, so everything is exact on doubles, no summation.
    */
  val tsOhlc: Q = Q(
    "ts_ohlc",
    """WITH ranked AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, value,
      |         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |                            ORDER BY ts, event_id) AS rn_open,
      |         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
      |                            ORDER BY ts DESC, event_id DESC) AS rn_close
      |  FROM events
      |)
      |SELECT event_type, h,
      |       CAST(max(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE) AS open,
      |       CAST(max(value) AS DOUBLE) AS high,
      |       CAST(min(value) AS DOUBLE) AS low,
      |       CAST(max(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close,
      |       count(*) AS n_ticks
      |FROM ranked
      |GROUP BY event_type, h
      |ORDER BY event_type NULLS FIRST, h NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val part = Seq(col("event_type"), date_trunc("hour", col("ts")))
    val wOpen = Window.partitionBy(part: _*)
      .orderBy(col("ts").asc, col("event_id").asc)
    val wClose = Window.partitionBy(part: _*)
      .orderBy(col("ts").desc, col("event_id").desc)
    T.events(s, d)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"),
        row_number().over(wOpen).as("rn_open"),
        row_number().over(wClose).as("rn_close"))
      .groupBy(col("event_type"), col("h"))
      .agg(
        max(when(col("rn_open") === 1, col("value"))).cast("double").as("open"),
        max(col("value")).cast("double").as("high"),
        min(col("value")).cast("double").as("low"),
        max(when(col("rn_close") === 1, col("value"))).cast("double").as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy(col("event_type").asc_nulls_first, col("h").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(tsGapfillLocf, tsOhlc)
}
