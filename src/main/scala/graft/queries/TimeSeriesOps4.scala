package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 second wave: Holt linear-trend smoothing (the
  * recursive forecaster ts_ema's truncated kernel cannot express),
  * lagged cross-correlation between two event streams (does one series
  * LEAD the other?), and interval-union coverage (how much of a
  * supplier's summed open-line time is distinct calendar time?).
  */
object TimeSeriesOps4 {

  private def dbl(c: Column): Column = c.cast("double")
  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** Holt's linear-trend double exponential smoothing over the daily
    * event counts (α = 0.5, β = 0.25 — both exact binary fractions):
    * level_t = α·y_t + (1−α)(level_{t−1}+trend_{t−1}),
    * trend_t = β(level_t−level_{t−1}) + (1−β)trend_{t−1}, initialized
    * level₁ = y₁, trend₁ = y₂−y₁. This is a GENUINE sequential
    * recursion — no window/kernel rewrite exists — so the Spark side
    * folds the CALENDAR-BOUNDED daily series with the `aggregate`
    * higher-order function over one collected array (≤|days| ≈ 366
    * elements per year of calendar regardless of corpus size: the
    * corpus-scale work is the partial-aggregable daily rollup; the
    * recursion runs on the bounded aggregate), and the oracle runs the
    * SAME recursion as a recursive CTE. Both execute the identical
    * expression tree sequentially over integer-valued doubles —
    * bit-identical IEEE results, rounded 6 dp at the edge. Output:
    * final state + 1/7-day-ahead forecasts ŷ_{n+h} = level + h·trend.
    */
  val tsHolt: Q = Q(
    "ts_holt",
    """WITH RECURSIVE dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT CAST(row_number() OVER (ORDER BY dx) AS BIGINT) AS i,
      |         CAST(y AS DOUBLE) AS y
      |  FROM dly),
      |r AS (
      |  SELECT CAST(1 AS BIGINT) AS i,
      |         (SELECT y FROM idx WHERE i = 1) AS lvl,
      |         (SELECT y FROM idx WHERE i = 2) - (SELECT y FROM idx WHERE i = 1) AS trd
      |  UNION ALL
      |  SELECT r.i + 1,
      |         0.5 * d.y + 0.5 * (r.lvl + r.trd),
      |         0.25 * (0.5 * d.y + 0.5 * (r.lvl + r.trd) - r.lvl) + 0.75 * r.trd
      |  FROM r JOIN idx d ON d.i = r.i + 1)
      |SELECT i AS n, round(lvl, 6) AS level, round(trd, 6) AS trend,
      |       round(lvl + trd, 6) AS fc_1, round(lvl + 7 * trd, 6) AS fc_7
      |FROM r WHERE i = (SELECT max(i) FROM r)
      |  AND (SELECT count(*) FROM idx) >= 2""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(count(lit(1)).as("y"))
    dly
      .agg(expr(
        // sort by day, take the count as double: the fold input array
        "transform(array_sort(collect_list(struct(dx, y))), e -> CAST(e.y AS DOUBLE))")
        .as("ys"))
      // empty-corpus survival: under ANSI mode get(ys, 0) on an empty array
      // throws INVALID_ARRAY_INDEX (a 2-point series is the semantic
      // minimum anyway); get() below is the OOB-null accessor
      .filter(size(col("ys")) >= 2)
      .select(expr(
        """aggregate(
          |  slice(ys, 3, greatest(size(ys) - 2, 0)),
          |  named_struct('i', CAST(2 AS BIGINT),
          |               'lvl', 0.5D * get(ys, 1) + 0.5D * (get(ys, 0) + (get(ys, 1) - get(ys, 0))),
          |               'trd', 0.25D * (0.5D * get(ys, 1) + 0.5D * (get(ys, 0) + (get(ys, 1) - get(ys, 0))) - get(ys, 0))
          |                      + 0.75D * (get(ys, 1) - get(ys, 0))),
          |  (acc, y) -> named_struct(
          |     'i', acc.i + CAST(1 AS BIGINT),
          |     'lvl', 0.5D * y + 0.5D * (acc.lvl + acc.trd),
          |     'trd', 0.25D * (0.5D * y + 0.5D * (acc.lvl + acc.trd) - acc.lvl)
          |            + 0.75D * acc.trd)) AS st""".stripMargin).as("st"))
      .select(col("st.i").as("n"),
        round(col("st.lvl"), 6).as("level"), round(col("st.trd"), 6).as("trend"),
        round(col("st.lvl") + col("st.trd"), 6).as("fc_1"),
        round(col("st.lvl") + lit(7) * col("st.trd"), 6).as("fc_7"))
  }

  /** Lagged cross-correlation (lags −3..+3 hours) between the error
    * and purchase event streams — "do error bursts LEAD conversion
    * dips?" is a leading-indicator question ts_acf's self-correlation
    * cannot answer; lag 0 is the contemporaneous check, the sign of
    * the peak lag says which series leads. Machinery is EXACTLY
    * ts_acf's: Pearson per lag from exact BIGINT sufficient statistics
    * over the calendar-bounded hourly aggregate, DECIMAL(38,0)
    * numerators, the lag shift an equi-join on epoch-micros — no
    * window, no gapfill (declared semantics: hours where both streams
    * observed). 7-row lag table broadcast-crossed.
    */
  val tsCcf: Q = Q(
    "ts_ccf",
    """WITH ha AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS us,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE event_type = 'error' GROUP BY 1),
      |hb AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS us,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-3, 4)),
      |p AS (
      |  SELECT l.lag, a.n AS x, b.n AS y
      |  FROM l CROSS JOIN ha a
      |  JOIN hb b ON b.us = a.us + l.lag * 3600000000),
      |agg AS (
      |  SELECT lag, CAST(count(*) AS BIGINT) AS m,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM p GROUP BY 1),
      |vv AS (
      |  SELECT lag, m, sx, sy, sxy,
      |         CAST(m AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS vx,
      |         CAST(m AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS vy
      |  FROM agg)
      |SELECT lag, m,
      |       round(CAST(CAST(m AS DECIMAL(38,0)) * sxy
      |                  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
      |             / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) AS ccf
      |FROM vv WHERE vx > 0 AND vy > 0
      |ORDER BY lag""".stripMargin
  ) { (s, d) =>
    def hourly(tpe: String) = T.events(s, d)
      .filter(col("event_type") === tpe)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("hr")).as("us"), col("n"))
    val l = s.range(-3, 4).select(col("id").as("lag"))
    val a = hourly("error").select(col("us").as("usa"), col("n").as("x"))
    val b = hourly("purchase").select(col("us").as("usb"), col("n").as("y"))
    val p = a.crossJoin(broadcast(l))
      .join(b, col("usb") === col("usa") + col("lag") * lit(3600000000L))
      .select(col("lag"), col("x"), col("y"))
    val agg = p.groupBy(col("lag")).agg(
      count(lit(1)).as("m"),
      sum(col("x")).cast("long").as("sx"), sum(col("y")).cast("long").as("sy"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("y") * col("y")).cast("long").as("syy"))
    val vv = agg.select(col("lag"), col("m"), col("sx"), col("sy"), col("sxy"),
      (d38(col("m")) * col("sxx") - d38(col("sx")) * col("sx")).as("vx"),
      (d38(col("m")) * col("syy") - d38(col("sy")) * col("sy")).as("vy"))
    vv.filter(col("vx") > 0 && col("vy") > 0)
      .select(col("lag"), col("m"),
        round((d38(col("m")) * col("sxy") - d38(col("sx")) * col("sy")).cast("double")
          / sqrt(dbl(col("vx")) * dbl(col("vy"))), 6).as("ccf"))
      .orderBy(col("lag"))
  }

  /** Interval-union coverage per nation: each lineitem contributes an
    * OPEN-FULFILLMENT interval [o_orderdate, l_shipdate] to its
    * supplier; overlapping intervals per supplier are merged into
    * islands (the classic interval-merge: a new island starts where
    * start > running max of prior ends) and the nation-level report
    * compares COVERED calendar days (union length) against RAW summed
    * days — the utilization/parallelism factor of the supplier's
    * pipeline. Everything is exact integer day arithmetic; the only
    * double is the final ratio. Scale: the merge windows partition by
    * SUPPLIER (high cardinality — parallel, never one global sort);
    * output is |nations|-bounded.
    */
  val intervalCoverage: Q = Q(
    "interval_coverage",
    """WITH iv AS (
      |  SELECT l_suppkey AS sk,
      |         CAST(epoch_us(date_trunc('day', o_orderdate)) // 86400000000 AS BIGINT) AS st,
      |         CAST(epoch_us(date_trunc('day', l_shipdate)) // 86400000000 AS BIGINT) AS en,
      |         l_orderkey AS ok, l_linenumber AS ln
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |mx AS (
      |  SELECT sk, st, en, ok, ln,
      |         max(en) OVER (PARTITION BY sk ORDER BY st, en, ok, ln
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv),
      |isl AS (
      |  SELECT sk, st, en,
      |         CAST(sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY sk ORDER BY st, en, ok, ln
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS isle
      |  FROM mx),
      |per_isl AS (
      |  SELECT sk, isle,
      |         max(en) - min(st) + 1 AS cov,
      |         CAST(count(*) AS BIGINT) AS n_iv,
      |         sum(en - st + 1) AS raw
      |  FROM isl GROUP BY sk, isle),
      |per_supp AS (
      |  SELECT sk, CAST(sum(cov) AS BIGINT) AS covered,
      |         CAST(sum(raw) AS BIGINT) AS raw,
      |         CAST(sum(n_iv) AS BIGINT) AS n_iv
      |  FROM per_isl GROUP BY sk)
      |SELECT n_name,
      |       CAST(count(*) AS BIGINT) AS n_suppliers,
      |       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |       CAST(sum(raw) AS BIGINT) AS raw_days,
      |       CAST(sum(covered) AS BIGINT) AS covered_days,
      |       round(CAST(sum(raw) AS DOUBLE) / CAST(sum(covered) AS DOUBLE), 6)
      |         AS overlap_factor
      |FROM per_supp
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val iv = T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("l_shipdate"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("sk"),
        expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000").as("st"),
        expr("unix_micros(date_trunc('day', l_shipdate)) div 86400000000").as("en"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val wPrev = Window.partitionBy(col("sk"))
      .orderBy(col("st"), col("en"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mx = iv.withColumn("pmax", max(col("en")).over(wPrev))
    val wCum = Window.partitionBy(col("sk"))
      .orderBy(col("st"), col("en"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isl = mx.withColumn("isle",
      sum(when(col("pmax").isNull || col("st") > col("pmax"), 1).otherwise(0))
        .over(wCum).cast("long"))
    val perIsl = isl.groupBy(col("sk"), col("isle"))
      .agg((max(col("en")) - min(col("st")) + 1).as("cov"),
        count(lit(1)).as("n_iv"),
        sum(col("en") - col("st") + 1).as("raw"))
    val perSupp = perIsl.groupBy(col("sk"))
      .agg(sum(col("cov")).cast("long").as("covered"),
        sum(col("raw")).cast("long").as("raw"),
        sum(col("n_iv")).cast("long").as("n_iv"))
    perSupp
      .join(broadcast(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("sk") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).cast("long").as("n_suppliers"),
        sum(col("n_iv")).cast("long").as("n_intervals"),
        sum(col("raw")).cast("long").as("raw_days"),
        sum(col("covered")).cast("long").as("covered_days"),
        round(sum(col("raw")).cast("double") / sum(col("covered")).cast("double"), 6)
          .as("overlap_factor"))
      .orderBy(col("n_name").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(tsHolt, tsCcf, intervalCoverage)
}
