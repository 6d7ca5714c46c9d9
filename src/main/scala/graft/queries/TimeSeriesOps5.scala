package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 ninth wave (time-series/stats side):
  * seasonality-adjusted anomaly detection and partial correlation —
  * "anomalous FOR THIS HOUR-OF-DAY" and "correlated AFTER controlling
  * for the confounder", the two questions raw z-scores and pairwise
  * correlations silently get wrong.
  */
object TimeSeriesOps5 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Seasonal-adjusted MAD anomalies on the hourly series: gapfill the
    * calendar-bounded hour spine with zeros, subtract the hour-of-day
    * seasonal mean as a SCALED residual (no division), then flag hours
    * with |r − median(r)| > 3·MAD(r). The spine need NOT span whole
    * days (ADVICE r8): each hour-of-day has its own sample count
    * n_hod ∈ {m, m+1}, so the residual is put on one common integer
    * scale P = lcm(m, m+1 when present): r = y·P − S_hod·(P/n_hod) —
    * exactly P/n_hod · (the per-hod mean-removed residual), integer-
    * exact and cross-hod comparable for ANY contiguous spine.
    * EVERYTHING is exact integer arithmetic: percentile_disc picks
    * actual residuals, the 3·MAD threshold is an integer compare, and
    * the top-20 cut orders by (deviation DESC, hour ASC) — a total
    * order. This catches the "normal at 3am, anomalous at noon" events
    * ts_anomaly_zscore's unadjusted score misses. Scale: windows/
    * aggregates over the CALENDAR-BOUNDED spine (|hours| rows at any
    * corpus scale).
    */
  val tsSeasonalAnomaly: Q = Q(
    "ts_seasonal_anomaly",
    """WITH hr AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |bounds AS (SELECT min(hx) AS lo, max(hx) AS hi FROM hr),
      |spine AS (
      |  SELECT CAST(u.hx AS BIGINT) AS hx
      |  FROM bounds, unnest(generate_series(lo, hi)) AS u(hx)),
      |dense AS (
      |  SELECT s.hx, s.hx % 24 AS hod, coalesce(hr.y, 0) AS y
      |  FROM spine s LEFT JOIN hr ON s.hx = hr.hx),
      |nh AS (SELECT hod, CAST(count(*) AS BIGINT) AS n_hod FROM dense GROUP BY 1),
      |p AS (
      |  SELECT CASE WHEN min(n_hod) = max(n_hod) THEN min(n_hod)
      |              ELSE min(n_hod) * max(n_hod) END AS p
      |  FROM nh),
      |seas AS (SELECT hod, CAST(sum(y) AS BIGINT) AS sh FROM dense GROUP BY 1),
      |resid AS (
      |  SELECT d.hx, d.hod, d.y, d.y * p.p - seas.sh * (p.p // nh.n_hod) AS r
      |  FROM dense d JOIN seas ON d.hod = seas.hod
      |  JOIN nh ON d.hod = nh.hod CROSS JOIN p),
      |md AS (
      |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY r) AS BIGINT) AS med
      |  FROM resid),
      |dev AS (
      |  SELECT hx, hod, y, r, abs(r - md.med) AS dv
      |  FROM resid CROSS JOIN md),
      |mad AS (
      |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dv) AS BIGINT) AS mad
      |  FROM dev)
      |SELECT CAST(hx * 3600000000 AS BIGINT) AS hour_us,
      |       CAST(hod AS BIGINT) AS hod, y, r AS r_scaled, dv AS deviation, mad.mad
      |FROM dev CROSS JOIN mad
      |WHERE dv > 3 * mad.mad
      |ORDER BY deviation DESC, hour_us ASC
      |LIMIT 20""".stripMargin
  ) { (s, d) =>
    val hr = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hx"))
      .agg(count(lit(1)).as("y"))
    val bounds = hr.agg(min(col("hx")).as("lo"), max(col("hx")).as("hi"))
    // 1-row bounds cross + sequence explode — the ts_gapfill_locf idiom
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"))).as("hx"))
    val dense = spine.join(hr, Seq("hx"), "left")
      .select(col("hx"), (col("hx") % 24).as("hod"),
        coalesce(col("y"), lit(0L)).as("y"))
    val nh = dense.groupBy(col("hod")).agg(count(lit(1)).cast("long").as("n_hod"))
    val p = nh.agg(expr(
      "CASE WHEN min(n_hod) = max(n_hod) THEN min(n_hod) " +
        "ELSE min(n_hod) * max(n_hod) END").as("p"))
    val seas = dense.groupBy(col("hod")).agg(sum(col("y")).cast("long").as("sh"))
    val resid = dense.join(broadcast(seas), "hod").join(broadcast(nh), "hod")
      .crossJoin(broadcast(p))
      .select(col("hx"), col("hod"), col("y"),
        expr("y * p - sh * (p div n_hod)").as("r"))
    val md = resid.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY r) AS BIGINT)").as("med"))
    val dev = resid.crossJoin(broadcast(md))
      .select(col("hx"), col("hod"), col("y"), col("r"),
        abs(col("r") - col("med")).as("dv"))
    val mad = dev.agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dv) AS BIGINT)").as("mad"))
    dev.crossJoin(broadcast(mad))
      .filter(col("dv") > lit(3) * col("mad"))
      .select((col("hx") * 3600000000L).cast("long").as("hour_us"),
        col("hod").cast("long").as("hod"), col("y"), col("r").as("r_scaled"),
        col("dv").as("deviation"), col("mad"))
      .orderBy(col("deviation").desc, col("hour_us").asc)
      .limit(20)
  }

  /** Partial correlation of daily purchases with views CONTROLLING
    * for clicks (and vice versa): r_yx·z = (r_yx − r_yz·r_xz) /
    * √((1−r_yz²)(1−r_xz²)) — does the association survive holding the
    * confounder fixed? stats_ols2 answers with regression
    * coefficients; this is the correlation-scale version analysts
    * actually quote. All pairwise sufficient statistics are exact
    * BIGINT over the CALENDAR-BOUNDED daily aggregate; the three
    * pairwise r's and both partials are one token-mirrored double
    * formula, rounded 6 dp.
    */
  val statsPartialCorr: Q = Q(
    "stats_partial_corr",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS z,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(z) AS BIGINT) AS sz,
      |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |         CAST(sum(z * z) AS BIGINT) AS szz,
      |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
      |         CAST(sum(y * z) AS BIGINT) AS syz
      |  FROM dly),
      |r AS (
      |  SELECT n,
      |         CAST(n * sxy - sx * sy AS DOUBLE)
      |           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                  * CAST(n * syy - sy * sy AS DOUBLE)) AS ryx,
      |         CAST(n * syz - sy * sz AS DOUBLE)
      |           / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
      |                  * CAST(n * szz - sz * sz AS DOUBLE)) AS ryz,
      |         CAST(n * sxz - sx * sz AS DOUBLE)
      |           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                  * CAST(n * szz - sz * sz AS DOUBLE)) AS rxz
      |  FROM s)
      |SELECT n, round(ryx, 6) AS r_yx, round(ryz, 6) AS r_yz, round(rxz, 6) AS r_xz,
      |       round((ryx - ryz * rxz) / sqrt((1.0 - ryz * ryz) * (1.0 - rxz * rxz)), 6)
      |         AS partial_yx_given_z,
      |       round((ryz - ryx * rxz) / sqrt((1.0 - ryx * ryx) * (1.0 - rxz * rxz)), 6)
      |         AS partial_yz_given_x
      |FROM r""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(
        sum(when(col("event_type") === "view", 1).otherwise(0)).cast("long").as("x"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long").as("z"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("y"))
    val su = dly.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("long").as("sx"), sum(col("y")).cast("long").as("sy"),
      sum(col("z")).cast("long").as("sz"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("y") * col("y")).cast("long").as("syy"),
      sum(col("z") * col("z")).cast("long").as("szz"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("z")).cast("long").as("sxz"),
      sum(col("y") * col("z")).cast("long").as("syz"))
    def pear(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column): Column =
      dbl(col("n") * sab - sa * sb) /
        sqrt(dbl(col("n") * saa - sa * sa) * dbl(col("n") * sbb - sb * sb))
    val r = su.select(col("n"),
      pear(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")).as("ryx"),
      pear(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")).as("ryz"),
      pear(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")).as("rxz"))
    r.select(col("n"),
      round(col("ryx"), 6).as("r_yx"), round(col("ryz"), 6).as("r_yz"),
      round(col("rxz"), 6).as("r_xz"),
      round((col("ryx") - col("ryz") * col("rxz"))
        / sqrt((lit(1.0) - col("ryz") * col("ryz"))
          * (lit(1.0) - col("rxz") * col("rxz"))), 6).as("partial_yx_given_z"),
      round((col("ryz") - col("ryx") * col("rxz"))
        / sqrt((lit(1.0) - col("ryx") * col("ryx"))
          * (lit(1.0) - col("rxz") * col("rxz"))), 6).as("partial_yz_given_x"))
  }

  def all: Seq[Q] = Seq(tsSeasonalAnomaly, statsPartialCorr)
}
