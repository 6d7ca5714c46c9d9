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

  /** SCD Type-2 interval history as a pure query (the declared twin of
    * graft.operators.Scd2): per-user change-point detection over the
    * event stream — a generation opens when event_type differs from the
    * previous row (gaps-and-islands: null-safe lag compare, running sum
    * of change flags), closes at the next generation's valid_from
    * (NULL = still open). Users < 10 keep the output bounded and
    * deterministic; (ts, event_id) is the total order (D4).
    */
  val scd2Intervals: Q = Q(
    "scd2_intervals",
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 10
      |), marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM e
      |), gens AS (
      |  SELECT user_id, ts, event_type,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS gen
      |  FROM marked
      |), intervals AS (
      |  SELECT user_id, gen, min(event_type) AS event_type, min(ts) AS valid_from,
      |         count(*) AS n_events
      |  FROM gens GROUP BY 1, 2
      |)
      |SELECT user_id, event_type, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY gen) AS valid_to,
      |       n_events
      |FROM intervals
      |ORDER BY user_id NULLS FIRST, valid_from NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val wOrder = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val marked = T.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(!(lag(col("event_type"), 1).over(wOrder) <=> col("event_type")), 1)
          .otherwise(0))
    val gens = marked
      .withColumn("gen", sum(col("chg"))
        .over(wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = gens.groupBy(col("user_id"), col("gen"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    val wGen = Window.partitionBy(col("user_id")).orderBy(col("gen").asc)
    intervals
      .select(col("user_id"), col("event_type"), col("valid_from"),
        lead(col("valid_from"), 1).over(wGen).as("valid_to"), col("n_events"))
      .orderBy(col("user_id").asc_nulls_first, col("valid_from").asc_nulls_first)
  }

  /** Linear interpolation on the hourly grid — the numeric sibling of
    * LOCF gap-fill: each empty bucket gets prev + (next − prev)·frac,
    * where frac is the bucket's fractional position in the gap. Buckets
    * before the first / after the last observation stay NULL.
    * Determinism: bucket values are decimal-exact sums cast once to
    * double; the interpolation itself is +,−,×,÷ on those doubles (all
    * IEEE exactly-rounded, identical tree both engines). Scale: the two
    * windows partition by series — per-series state, no global sort.
    */
  val tsResampleInterp: Q = Q(
    "ts_resample_interp",
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
      |), joined AS (
      |  SELECT grid.event_type, grid.h, coalesce(b.n, 0) AS n, b.v
      |  FROM grid LEFT JOIN b ON grid.event_type = b.event_type AND grid.h = b.h
      |), ctx AS (
      |  SELECT event_type, h, n, v,
      |         last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
      |         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |           OVER (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_h,
      |         first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
      |         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |           OVER (PARTITION BY event_type ORDER BY h
      |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_h
      |  FROM joined
      |)
      |SELECT event_type, h, n,
      |       CASE WHEN v IS NOT NULL THEN v
      |            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
      |              prev_v + (next_v - prev_v) *
      |                (CAST(CAST(epoch(h) AS BIGINT) - CAST(epoch(prev_h) AS BIGINT) AS DOUBLE) /
      |                 CAST(CAST(epoch(next_h) AS BIGINT) - CAST(epoch(prev_h) AS BIGINT) AS DOUBLE))
      |            ELSE NULL END AS v_interp
      |FROM ctx
      |ORDER BY event_type NULLS FIRST, h NULLS FIRST""".stripMargin
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
    val joined = grid.join(b,
        grid("event_type") === b("event_type") && grid("h") === b("h"), "left")
      .select(grid("event_type"), grid("h"),
        coalesce(col("n"), lit(0L)).as("n"), col("v"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val obsH = when(col("v").isNotNull, col("h"))
    val ctx = joined.select(col("event_type"), col("h"), col("n"), col("v"),
      last(col("v"), ignoreNulls = true).over(wPrev).as("prev_v"),
      last(obsH, ignoreNulls = true).over(wPrev).as("prev_h"),
      first(col("v"), ignoreNulls = true).over(wNext).as("next_v"),
      first(obsH, ignoreNulls = true).over(wNext).as("next_h"))
    val frac =
      (unix_timestamp(col("h")) - unix_timestamp(col("prev_h"))).cast("double") /
        (unix_timestamp(col("next_h")) - unix_timestamp(col("prev_h"))).cast("double")
    ctx.select(col("event_type"), col("h"), col("n"),
        when(col("v").isNotNull, col("v"))
          .when(col("prev_v").isNotNull && col("next_v").isNotNull,
            col("prev_v") + (col("next_v") - col("prev_v")) * frac)
          .as("v_interp"))
      .orderBy(col("event_type").asc_nulls_first, col("h").asc_nulls_first)
  }

  /** Rolling z-score anomaly detection: per series, each point is scored
    * against the mean/stddev of the 20 points strictly before it (so the
    * point never contaminates its own baseline); |z| > 2 with ≥ 10
    * history points flags an anomaly. Determinism: the frame sums run on
    * pinned decimals (value and value² both cast to exact decimal, so
    * window-segment-tree vs recompute summation order cannot diverge);
    * mean/variance/sqrt are then IEEE-exact double ops. Scale: one
    * window partitioned by series — per-series sort, no global shuffle.
    */
  val tsAnomalyZscore: Q = Q(
    "ts_anomaly_zscore",
    """WITH scored AS (
      |  SELECT event_id, event_type, ts, value,
      |         count(*) OVER w AS n_hist,
      |         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
      |         CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
      |                       AS DECIMAL(24,10))) OVER w AS DOUBLE) AS s2
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
      |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
      |), z AS (
      |  SELECT event_id, event_type, ts, value, n_hist,
      |         s1 / n_hist AS mean,
      |         sqrt(greatest(s2 / n_hist - (s1 / n_hist) * (s1 / n_hist), 1e-12)) AS std
      |  FROM scored WHERE n_hist >= 10
      |)
      |SELECT event_id, event_type, ts, CAST(value AS DOUBLE) AS value,
      |       round(mean, 6) AS mean, round((value - mean) / std, 6) AS zscore
      |FROM z
      |WHERE abs((value - mean) / std) > 2
      |ORDER BY event_type NULLS FIRST, event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-20, -1)
    val vDec = col("value").cast("decimal(18,6)")
    val scored = T.events(s, d).select(
      col("event_id"), col("event_type"), col("ts"), col("value"),
      count(lit(1)).over(w).as("n_hist"),
      sum(vDec).over(w).cast("double").as("s1"),
      sum((vDec * vDec).cast("decimal(24,10)")).over(w).cast("double").as("s2"))
    val mean = col("s1") / col("n_hist")
    val std = sqrt(greatest(col("s2") / col("n_hist") - mean * mean, lit(1e-12)))
    val z = (col("value") - mean) / std
    scored.filter(col("n_hist") >= 10)
      .filter(abs(z) > 2)
      .select(col("event_id"), col("event_type"), col("ts"),
        col("value").cast("double").as("value"),
        round(mean, 6).as("mean"), round(z, 6).as("zscore"))
      .orderBy(col("event_type").asc_nulls_first, col("event_id").asc_nulls_first)
  }

  /** Point-in-time (AS OF) lookup against the SCD2 interval table —
    * the read half of slowly-changing-dimension history: what was each
    * user's state at probe times t₁..t₃ (quartiles of the data's time
    * range, derived in exact integer micros)? Scalable idiom: probes
    * are UNIONED into the per-user timeline and answered by one
    * ordered-window `last(ignoreNulls)` pass — an as-of lookup with no
    * range join, one shuffle on user_id. The only cross is the 1-row
    * bounds aggregate broadcast into the probe generator (allowlisted,
    * same pattern as ts_gapfill_locf). Interval starts sort before
    * probes at the exact boundary (valid_from is inclusive), and gen
    * breaks valid_from ties deterministically in both engines
    * (coalesced, so no null-ordering divergence).
    */
  val scd2AsofLookup: Q = Q(
    "scd2_asof_lookup",
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 10
      |), marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM e
      |), gens AS (
      |  SELECT user_id, ts, event_type,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS gen
      |  FROM marked
      |), intervals AS (
      |  SELECT user_id, gen, min(event_type) AS event_type,
      |         min(ts) AS valid_from
      |  FROM gens GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM e
      |), probes AS (
      |  SELECT u.user_id, k.probe_k,
      |         make_timestamp(mn + (CAST(probe_k AS BIGINT) * (mx - mn)) // 4)
      |           AS probe_ts
      |  FROM (SELECT DISTINCT user_id FROM intervals) u, bounds,
      |       unnest([1, 2, 3]) AS k(probe_k)
      |), tl AS (
      |  SELECT user_id, valid_from AS t, 0 AS is_probe, event_type,
      |         CAST(NULL AS INT) AS probe_k, CAST(gen AS BIGINT) AS gen
      |  FROM intervals
      |  UNION ALL
      |  SELECT user_id, probe_ts AS t, 1 AS is_probe,
      |         CAST(NULL AS VARCHAR) AS event_type, probe_k,
      |         CAST(NULL AS BIGINT) AS gen
      |  FROM probes
      |), w AS (
      |  SELECT user_id, t, is_probe, probe_k,
      |         last_value(event_type IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY t, is_probe, coalesce(gen, 9223372036854775807)
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
      |  FROM tl
      |)
      |SELECT user_id, probe_k, CAST(t AS TIMESTAMP) AS probe_ts, state
      |FROM w WHERE is_probe = 1
      |ORDER BY user_id NULLS FIRST, probe_k""".stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wOrder = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gens = ev
      .withColumn("chg",
        when(!(lag(col("event_type"), 1).over(wOrder) <=> col("event_type")), 1)
          .otherwise(0))
      .withColumn("gen", sum(col("chg"))
        .over(wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = gens.groupBy(col("user_id"), col("gen"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"))
    val bounds = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx"))
    val probes = intervals.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(array(lit(1), lit(2), lit(3))).as("probe_k"),
        col("mn"), col("mx"))
      .select(col("user_id"), col("probe_k"),
        timestamp_micros(
          expr("mn + (CAST(probe_k AS BIGINT) * (mx - mn)) div 4")).as("probe_ts"))
    val tl = intervals
      .select(col("user_id"), col("valid_from").as("t"),
        lit(0).as("is_probe"), col("event_type"),
        lit(null).cast("int").as("probe_k"), col("gen").cast("long").as("gen"))
      .unionByName(probes
        .select(col("user_id"), col("probe_ts").as("t"),
          lit(1).as("is_probe"), lit(null).cast("string").as("event_type"),
          col("probe_k"), lit(null).cast("long").as("gen")))
    val wT = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("is_probe").asc,
        coalesce(col("gen"), lit(Long.MaxValue)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tl
      .withColumn("state", last(col("event_type"), ignoreNulls = true).over(wT))
      .filter(col("is_probe") === 1)
      .select(col("user_id"), col("probe_k"), col("t").as("probe_ts"), col("state"))
      .orderBy(col("user_id").asc_nulls_first, col("probe_k").asc)
  }

  /** Robust anomaly detection via median absolute deviation — the
    * outlier-resistant sibling of ts_anomaly_zscore (a mean/stddev
    * baseline is itself dragged by the outliers it's hunting; medians
    * aren't). score = |v − med| / (1.4826·MAD), flag at > 3. Two
    * aggregate-once-join-back passes (median, then MAD of deviations) —
    * never a per-row subquery; the per-series joins are co-partitioned
    * equi-joins on event_type (no forced broadcast — series cardinality
    * grows with real telemetry). Medians are exact (quantile_cont ↔
    * percentile); every double on the flag path is computed identically
    * in both engines, so the flagged SET matches exactly.
    */
  val tsAnomalyMad: Q = Q(
    "ts_anomaly_mad",
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)
      |), mad AS (
      |  SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
      |)
      |SELECT d.event_id, d.event_type, d.value,
      |       round(d.adev / (1.4826 * m.mad), 6) AS score
      |FROM dev d JOIN mad m USING (event_type)
      |WHERE m.mad > 0 AND d.adev > 3 * 1.4826 * m.mad
      |ORDER BY d.event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d).select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type").as("mk"))
      .agg(median(col("value")).as("med"))
    val dev = ev.join(med, col("event_type") === col("mk"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type").as("dk"))
      .agg(median(col("adev")).as("mad"))
    dev.join(mad, col("event_type") === col("dk"))
      .filter(col("mad") > 0 && col("adev") > lit(3) * lit(1.4826) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("adev") / (lit(1.4826) * col("mad")), 6).as("score"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** Time-based RANGE frame: rolling 1-hour event count + decimal sum
    * per series — the sliding-lookback shape (rate limiting, rolling
    * QPS, trailing revenue) that ROWS frames can't express when event
    * spacing is irregular. Both engines order the frame by exact epoch
    * micros, so peer groups (exact-ts ties) and the 1-hour bound are
    * identical; the windowed sum is decimal (order-independent, D2).
    * One shuffle on event_type; at real telemetry cardinality the
    * per-series windows parallelize.
    */
  val tsRolling1h: Q = Q(
    "ts_rolling_1h",
    """SELECT event_id, event_type,
      |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    T.events(s, d)
      .select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("n_1h"),
        sum(T.dec4(col("value"))).over(w).cast("double").as("sum_1h"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** Hour-of-day seasonal profile — the seasonality sibling of the
    * z-score/MAD anomaly pair: per (series, hour-of-day UTC), the mean
    * value and its deviation from the series' overall mean. This is
    * the baseline a seasonal anomaly detector subtracts before
    * thresholding. Two aggregation levels, the second a window over
    * the ≤ 24-row-per-series aggregate; sums are decimal (exact,
    * order-independent), each output is ONE decimal→double cast + one
    * division — bit-identical cross-engine.
    */
  val tsSeasonalHour: Q = Q(
    "ts_seasonal_hour",
    """WITH hr AS (
      |  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hod,
      |         CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(value AS DECIMAL(18,4))) AS s
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, hod, n,
      |       round(CAST(s AS DOUBLE) / n, 6) AS hour_avg,
      |       round(CAST(s AS DOUBLE) / n
      |             - CAST(sum(s) OVER (PARTITION BY event_type) AS DOUBLE)
      |               / sum(n) OVER (PARTITION BY event_type), 6) AS dev
      |FROM hr
      |ORDER BY event_type NULLS FIRST, hod""".stripMargin
  ) { (s, d) =>
    val hr = T.events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"), sum(T.dec4(col("value"))).as("s"))
    val w = Window.partitionBy(col("event_type"))
    val hourAvg = col("s").cast("double") / col("n")
    val seriesAvg = sum(col("s")).over(w).cast("double") / sum(col("n")).over(w)
    hr.select(col("event_type"), col("hod"), col("n"),
        round(hourAvg, 6).as("hour_avg"),
        round(hourAvg - seriesAvg, 6).as("dev"))
      .orderBy(col("event_type").asc_nulls_first, col("hod"))
  }

  /** Truncated exponential moving average (α=0.3, kernel cut at 5
    * points) over the per-series HOURLY mean — the smoothing pass a
    * telemetry dashboard runs before thresholding. The untruncated
    * recursive EMA is not portably hash-exact (the closed form needs
    * p^-t intermediates that overflow double precision past ~40 rows),
    * so the declared semantic is the standard span-truncated kernel:
    * weights 1, p, p², p³, p⁴ (p = 0.7) over the last 5 hourly points,
    * renormalized over the lags that EXIST (series starts shorten the
    * kernel instead of biasing toward 0). All weights are literal
    * constants (no pow()), the hourly mean is one decimal-sum→double
    * division, and the num/den additions are written in the same
    * left-associated order in both engines — bit-identical doubles,
    * round(…,6) at the edge. Scale: one partial-aggregable hourly
    * rollup, then 4 lags over the |series|×|hours| AGGREGATE.
    */
  val tsEma: Q = Q(
    "ts_ema",
    // hour_avg is an EXACT integer-rational round: the decimal sum in
    // 1e-6 units, divided by n with integer round-half-up
    // ((2s+n) div 2n — positive domain), so both engines derive the
    // identical 6-decimal value. The former double division hit a real
    // round-half tie at sf1 (16066.3/320 = 50.2071875: Spark's
    // HALF_UP on the binary double vs DuckDB's *1e6+0.5 floor disagree
    // at exactly .5e-6) — found by the round-11 skew sweep.
    """WITH hr AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
      |         CAST(count(*) AS BIGINT) AS n,
      |         ((2 * CAST(sum(CAST(value AS DECIMAL(18,4))) * 1000000 AS BIGINT)
      |           + count(*)) // (2 * count(*))) / 1000000.0 AS x
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, hour_ts, n, x,
      |         lag(x, 1) OVER w AS l1, lag(x, 2) OVER w AS l2,
      |         lag(x, 3) OVER w AS l3, lag(x, 4) OVER w AS l4
      |  FROM hr
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts))
      |SELECT event_type, CAST(hour_ts AS TIMESTAMP) AS hour_ts, n,
      |       round(x, 6) AS hour_avg,
      |       round((x + coalesce(0.7 * l1, 0.0) + coalesce(0.49 * l2, 0.0)
      |              + coalesce(0.343 * l3, 0.0) + coalesce(0.2401 * l4, 0.0))
      |             / (1.0 + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.7 END
      |                    + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.49 END
      |                    + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.343 END
      |                    + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.2401 END), 6)
      |         AS ema
      |FROM lagged
      |ORDER BY event_type NULLS FIRST, hour_ts""".stripMargin
  ) { (s, d) =>
    val hr = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        // exact integer round-half-up of (sum_micros / n) — see the
        // oracle comment; Spark `div` truncates and DuckDB `//` floors,
        // identical on this positive domain
        expr("""((2 * CAST(sum(CAST(value AS DECIMAL(18,4))) * 1000000 AS BIGINT)
                 + count(1)) div (2 * count(1))) / 1000000.0""").as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
    val lagged = hr
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l2", lag(col("x"), 2).over(w))
      .withColumn("l3", lag(col("x"), 3).over(w))
      .withColumn("l4", lag(col("x"), 4).over(w))
    val num = col("x") +
      coalesce(lit(0.7) * col("l1"), lit(0.0)) +
      coalesce(lit(0.49) * col("l2"), lit(0.0)) +
      coalesce(lit(0.343) * col("l3"), lit(0.0)) +
      coalesce(lit(0.2401) * col("l4"), lit(0.0))
    val den = lit(1.0) +
      when(col("l1").isNull, 0.0).otherwise(0.7) +
      when(col("l2").isNull, 0.0).otherwise(0.49) +
      when(col("l3").isNull, 0.0).otherwise(0.343) +
      when(col("l4").isNull, 0.0).otherwise(0.2401)
    lagged.select(col("event_type"), col("hour_ts"), col("n"),
        round(col("x"), 6).as("hour_avg"),
        round(num / den, 6).as("ema"))
      .orderBy(col("event_type").asc_nulls_first, col("hour_ts"))
  }

  /** Reset-aware counter rate — the perfmon/Prometheus shape at the
    * heart of the reference's monitoring domain: agents export
    * monotonically increasing counters that occasionally RESET (process
    * restart), so the naive lag-delta goes negative exactly there. Per
    * (series, hour): sum of per-event increases, where a decrease
    * signals a reset and contributes the post-reset absolute value
    * (the standard `rate()` reset rule), and the first event of a
    * series contributes 0 (unknown baseline). The synthetic corpus's
    * `value` is not a real counter, so a deterministic one is DERIVED
    * in-query: per-series running sum of an id-derived step
    * (event_id % 7 + 1), restarting from that step whenever
    * user_id % 97 == 0 (the reset marker) — segment number = running
    * count of resets, counter = running step sum within the segment.
    * Strictly integer arithmetic, identical cross-engine; total order
    * inside every window via (ts, event_id).
    */
  val tsCounterRate: Q = Q(
    "ts_counter_rate",
    """WITH seg AS (
      |  SELECT event_type, ts, event_id, event_id % 7 + 1 AS step,
      |         CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY event_type ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS segment
      |  FROM events),
      |cnt AS (
      |  SELECT event_type, ts, event_id,
      |         CAST(sum(step)
      |              OVER (PARTITION BY event_type, segment
      |                    ORDER BY ts, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS counter
      |  FROM seg),
      |delta AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
      |         CASE WHEN lag(counter) OVER w IS NULL THEN 0
      |              WHEN counter >= lag(counter) OVER w
      |                THEN counter - lag(counter) OVER w
      |              ELSE counter END AS inc
      |  FROM cnt
      |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
      |SELECT event_type, CAST(hour_ts AS TIMESTAMP) AS hour_ts,
      |       CAST(count(*) AS BIGINT) AS n_samples,
      |       CAST(sum(inc) AS BIGINT) AS total_increase
      |FROM delta
      |GROUP BY 1, 2
      |ORDER BY event_type NULLS FIRST, hour_ts""".stripMargin
  ) { (s, d) =>
    val wRun = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = T.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("event_id") % 7 + 1).as("step"),
        sum(when(col("user_id") % 97 === 0, 1).otherwise(0))
          .over(wRun).cast("long").as("segment"))
    val wSeg = Window.partitionBy(col("event_type"), col("segment"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cnt = seg.select(col("event_type"), col("ts"), col("event_id"),
      sum(col("step")).over(wSeg).cast("long").as("counter"))
    val wLag = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("counter"), 1).over(wLag)
    val delta = cnt.select(col("event_type"),
      date_trunc("hour", col("ts")).as("hour_ts"),
      when(prev.isNull, lit(0L))
        .when(col("counter") >= prev, col("counter") - prev)
        .otherwise(col("counter")).as("inc"))
    delta.groupBy(col("event_type"), col("hour_ts"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("inc")).cast("long").as("total_increase"))
      .orderBy(col("event_type").asc_nulls_first, col("hour_ts"))
  }

  /** Daily open-order backlog: each order opens at o_orderdate and
    * closes when its last lineitem ships; the running sum of daily
    * net (+opened − closed) is the backlog curve — the warehouse-ops
    * "how far behind are we" series. All integer arithmetic; the
    * running window orders the per-DAY net aggregate (cardinality =
    * calendar span, time-bounded at any corpus volume — the
    * ts_resample grid argument), never the order stream. The
    * order-lifetime join is co-partitioned on the order key and
    * partial-aggregable into the per-day nets.
    */
  val tsBacklog: Q = Q(
    "ts_backlog",
    """WITH life AS (
      |  SELECT o_orderkey, CAST(min(o_orderdate) AS DATE) AS d0,
      |         CAST(max(l_shipdate) AS DATE) AS d1
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1),
      |pts AS (
      |  SELECT d0 AS day, 1 AS delta FROM life
      |  UNION ALL
      |  SELECT d1 AS day, -1 AS delta FROM life),
      |daily AS (
      |  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM pts GROUP BY 1)
      |SELECT day,
      |       CAST(sum(net) OVER (ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS open_orders
      |FROM daily ORDER BY day NULLS FIRST""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val life = T.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      .join(T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(to_date(min(col("o_orderdate"))).as("d0"),
        to_date(max(col("l_shipdate"))).as("d1"))
    // one pass: each lifetime explodes into its (open, close) endpoint
    // pair map-side — the UNION ALL form re-runs the orders⋈lineitem
    // join for each endpoint side
    val pts = life.select(explode(array(
        struct(col("d0").as("day"), lit(1).as("delta")),
        struct(col("d1").as("day"), lit(-1).as("delta")))).as("p"))
      .select(col("p.day").as("day"), col("p.delta").as("delta"))
    val daily = pts.groupBy(col("day")).agg(sum(col("delta")).cast("long").as("net"))
    daily
      .withColumn("open_orders",
        sum(col("net")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select(col("day"), col("open_orders"))
      .orderBy(col("day").asc_nulls_first)
  }

  val all: Seq[Q] =
    Seq(tsGapfillLocf, tsOhlc, scd2Intervals, tsResampleInterp, tsAnomalyZscore,
      scd2AsofLookup, tsAnomalyMad, tsRolling1h, tsSeasonalHour, tsEma,
      tsCounterRate, tsBacklog)
}
