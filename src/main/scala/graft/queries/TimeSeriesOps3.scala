package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 tenth wave: Bollinger-style volatility bands and the
  * hour-of-day × day-of-week load heatmap — the two remaining
  * telemetry staples beside ts_ema / ts_seasonal_hour / ts_weekend_lift.
  */
object TimeSeriesOps3 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Bollinger-style volatility bands on hourly event counts per
    * event type: trailing 24-bucket mean ± 2σ plus the deviation
    * score (x − mean)/σ — the adaptive-threshold alerting primitive
    * (a fixed threshold misfires on daily rhythm; a rolling band
    * follows it). Frame sufficient statistics are EXACT integer sums
    * (Σy, Σy², n ≤ 24 per frame); mean/σ/score are final mirrored
    * formulas rounded 6 dp — no float comparison decides any row's
    * membership. Full 24-bucket frames only (rn ≥ 24). Scale: the
    * window runs per-series over the CALENDAR-BOUNDED hourly
    * aggregate.
    */
  val tsBollinger: Q = Q(
    "ts_bollinger",
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hr, y,
      |         CAST(sum(y) OVER fr AS BIGINT) AS s1,
      |         CAST(sum(y * y) OVER fr AS BIGINT) AS s2,
      |         CAST(count(*) OVER fr AS BIGINT) AS n,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) AS BIGINT)
      |           AS rn
      |  FROM h
      |  WINDOW fr AS (PARTITION BY event_type ORDER BY hr
      |                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
      |b AS (
      |  SELECT event_type, hr, y,
      |         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
      |         sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2
      |                   - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
      |                   AS DOUBLE)
      |              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
      |  FROM w
      |  WHERE rn >= 24
      |    AND CAST(n AS DECIMAL(38,0)) * s2
      |        - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0)) > 0)
      |SELECT event_type, hr, y,
      |       round(m, 6) AS mid,
      |       round(m - 2.0 * sd, 6) AS lo,
      |       round(m + 2.0 * sd, 6) AS hi,
      |       round((CAST(y AS DOUBLE) - m) / sd, 6) AS score
      |FROM b
      |ORDER BY event_type NULLS FIRST, hr NULLS FIRST""".stripMargin
  ) { (s, d) =>
    def d38(c: Column) = c.cast("decimal(38,0)")
    val h = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val fr = ord.rowsBetween(-23, Window.currentRow)
    val w = h.select(col("event_type"), col("hr"), col("y"),
      sum(col("y")).over(fr).cast("long").as("s1"),
      sum(col("y") * col("y")).over(fr).cast("long").as("s2"),
      count(lit(1)).over(fr).cast("long").as("n"),
      row_number().over(ord).cast("long").as("rn"))
    // zero-variance frames excluded by an EXACT integer predicate
    // (n·Σy² − (Σy)² = 0), never a float sd == 0 comparison
    val vnum = d38(col("n")) * col("s2") - d38(col("s1")) * d38(col("s1"))
    val b = w.filter(col("rn") >= 24 && vnum > 0)
      .select(col("event_type"), col("hr"), col("y"),
        (dbl(col("s1")) / dbl(col("n"))).as("m"),
        sqrt(vnum.cast("double") / (dbl(col("n")) * dbl(col("n") - 1))).as("sd"))
    b.select(col("event_type"), col("hr"), col("y"),
      round(col("m"), 6).as("mid"),
      round(col("m") - lit(2.0) * col("sd"), 6).as("lo"),
      round(col("m") + lit(2.0) * col("sd"), 6).as("hi"),
      round((dbl(col("y")) - col("m")) / col("sd"), 6).as("score"))
      .orderBy(col("event_type").asc_nulls_first, col("hr").asc_nulls_first)
  }

  /** Hour-of-day × day-of-week load heatmap: event counts and the
    * share of total per (dow, hour) cell — the capacity-planning view
    * that separates "Monday 9am" from "Sunday 3am". Day-of-week from
    * pure epoch-integer arithmetic (ts_weekend_lift device), hour
    * from the epoch-hour index mod 24 — zero date-locale surface.
    * One partial-aggregable pass; output bounded at 7·24 cells.
    */
  val tsHeatmapHourDow: Q = Q(
    "ts_heatmap_hour_dow",
    """WITH e AS (
      |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hx FROM events),
      |c AS (
      |  SELECT (hx // 24) % 7 AS dow, hx % 24 AS hod,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM e GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
      |SELECT dow, hod, n,
      |       round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
      |FROM c CROSS JOIN tot
      |ORDER BY dow, hod""".stripMargin
  ) { (s, d) =>
    val c = T.events(s, d)
      .select(expr("unix_micros(ts) div 3600000000").as("hx"))
      .select(((col("hx") / 24).cast("long") % 7).as("dow"),
        (col("hx") % 24).as("hod"))
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).cast("long").as("t"))
    c.crossJoin(broadcast(tot))
      .select(col("dow"), col("hod"), col("n"),
        round(dbl(col("n")) / dbl(col("t")), 6).as("share"))
      .orderBy(col("dow"), col("hod"))
  }

  val all: Seq[Q] = Seq(tsBollinger, tsHeatmapHourDow)
}
