package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8d rank/robust/downsampling wave: Mann–Whitney rank-sum,
  * Theil–Sen robust trend, and LTTB-style series downsampling — the
  * rank-based companions to stats_ks's ECDF test, agg_linreg's OLS
  * slope, and ts_ema's smoothers.
  *
  * Determinism discipline: ranks are kept in HALVES (2·rank is an
  * integer) so every rank sum is an exact BIGINT; products beyond long
  * headroom run in DECIMAL(38,0) (welch precedent); triangle areas in
  * the downsampler are compared by exact integer cross-multiplication
  * (no float area ever computed); the only floats are final formulas
  * mirrored token-for-token. The KS two-phase binned-prefix idiom
  * carries the global rank cumulative at scale.
  */
object RankOps {

  private def dbl(c: Column): Column = c.cast("double")

  /** Mann–Whitney U (rank-sum) test between the BUILDING and MACHINERY
    * order-value samples, tie-corrected normal approximation — the
    * rank-based "is one distribution stochastically larger?" companion
    * to stats_ks's max-gap test. Average ranks stay exact: for a tied
    * value with P smaller pooled points and t ties, 2·rank = 2P+t+1 is
    * an INTEGER, so the rank sum R0 is carried as exact BIGINT 2·R0.
    * The prefix P comes from the same two-phase binned cumulative as
    * stats_ks (no global window over corpus-sized data in Spark; the
    * oracle uses DuckDB's plain global window). The tie term Σ(t³−t)
    * and z denominator run in doubles from exact integers,
    * token-mirrored.
    */
  val statsMannWhitney: Q = Q(
    "stats_mann_whitney",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |    AND o_totalprice IS NOT NULL),
      |v AS (
      |  SELECT cents,
      |         CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |         CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |  FROM o GROUP BY 1),
      |r AS (
      |  SELECT cents, c0, c1, c0 + c1 AS ct,
      |         CAST(sum(c0 + c1) OVER (ORDER BY cents) AS BIGINT) - (c0 + c1) AS p
      |  FROM v),
      |agg AS (
      |  SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
      |         CAST(sum(c0 * (2 * p + ct + 1)) AS BIGINT) AS r0_2,
      |         CAST(sum(CASE WHEN ct > 1 THEN ct * ct * ct - ct ELSE 0 END) AS BIGINT) AS tie3
      |  FROM r),
      |u AS (
      |  SELECT n0, n1, n0 + n1 AS n, tie3,
      |         r0_2 - n0 * (n0 + 1) AS u0_2
      |  FROM agg)
      |SELECT n0, n1, CAST(u0_2 AS DOUBLE) / 2.0 AS u0,
      |  round((CAST(u0_2 - n0 * n1 AS DOUBLE) / 2.0)
      |        / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
      |               * (CAST(n + 1 AS DOUBLE)
      |                  - CAST(tie3 AS DOUBLE)
      |                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))), 6) AS z
      |FROM u""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("seg").isin("BUILDING", "MACHINERY"))
      // ranks are over OBSERVED values; NULL is not a sample (null-sweep r9)
      .filter(col("o_totalprice").isNotNull)
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val v = o.groupBy(col("cents")).agg(
      sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("c0"),
      sum(when(col("seg") === "MACHINERY", 1L).otherwise(0L)).as("c1"))
      .withColumn("ct", col("c0") + col("c1"))
      .withColumn("bin", expr("cents div 1000000"))
    // two-phase exclusive prefix of pooled counts (the stats_ks idiom)
    val binPre = v.groupBy(col("bin")).agg(sum(col("ct")).as("bt"))
      .select(col("bin"),
        (sum(col("bt")).over(Window.orderBy(col("bin"))) - col("bt")).as("pb"))
    val wb = Window.partitionBy(col("bin")).orderBy(col("cents"))
    val r = v.join(broadcast(binPre), "bin")
      .withColumn("p", col("pb") + sum(col("ct")).over(wb) - col("ct"))
    val agg = r.agg(
      sum(col("c0")).cast("long").as("n0"),
      sum(col("c1")).cast("long").as("n1"),
      sum(col("c0") * (lit(2) * col("p") + col("ct") + 1)).cast("long").as("r0_2"),
      sum(when(col("ct") > 1, col("ct") * col("ct") * col("ct") - col("ct"))
        .otherwise(0L)).cast("long").as("tie3"))
    val u = agg.select(col("n0"), col("n1"), (col("n0") + col("n1")).as("n"),
      col("tie3"), (col("r0_2") - col("n0") * (col("n0") + 1)).as("u0_2"))
    u.select(col("n0"), col("n1"),
      (dbl(col("u0_2")) / lit(2.0)).as("u0"),
      round((dbl(col("u0_2") - col("n0") * col("n1")) / lit(2.0))
        / sqrt(dbl(col("n0")) * dbl(col("n1")) / lit(12.0)
          * (dbl(col("n") + 1)
            - dbl(col("tie3")) / (dbl(col("n")) * dbl(col("n") - 1)))), 6).as("z"))
  }

  /** Theil–Sen robust trend: the MEDIAN of all pairwise slopes of the
    * daily event-count series — the outlier-proof alternative to
    * agg_linreg's OLS slope (one corrupted day cannot move it). Days
    * are exact integer epoch-day indexes; each slope is one division
    * of exact integers (identical IEEE cross-engine); percentile_disc
    * picks an ACTUAL slope element, so the median is deterministic.
    * Scale: the pairwise expansion runs over the CALENDAR-BOUNDED daily
    * aggregate (~n_days²/2 pairs regardless of corpus size) — the
    * corpus-scale work is the one partial-aggregable daily count.
    */
  val tsTheilSen: Q = Q(
    "ts_theil_sen",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.dx - a.dx AS DOUBLE) AS slope
      |  FROM dly a JOIN dly b ON a.dx < b.dx)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM dly) AS n_days,
      |       CAST(count(*) AS BIGINT) AS n_pairs,
      |       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope), 6) AS slope_med
      |FROM p""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(expr("unix_micros(day) div 86400000000").as("dx"), col("y"))
    val a = dly.select(col("dx").as("xa"), col("y").as("ya"))
    val b = dly.select(col("dx").as("xb"), col("y").as("yb"))
    val p = a.join(b, col("xa") < col("xb"))
      .select((dbl(col("yb") - col("ya")) / dbl(col("xb") - col("xa"))).as("slope"))
    val nDays = dly.agg(count(lit(1)).as("n_days"))
    p.crossJoin(broadcast(nDays))
      .groupBy(col("n_days"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)"), 6).as("slope_med"))
      .select(col("n_days"), col("n_pairs"), col("slope_med"))
  }

  /** LTTB-style series downsampling of the hourly event-count series:
    * 60-point time buckets, keep the point forming the LARGEST triangle
    * with the neighboring buckets' centroids — the visual-fidelity
    * downsampler dashboards run before plotting (largest-triangle-
    * three-buckets with centroid anchors, the parallel variant: the
    * classic sequential LTTB anchors on the previously SELECTED point,
    * which serializes; centroid anchors make every bucket independent).
    * Areas are compared by EXACT integer cross-multiplication — the
    * triangle area with rational centroid vertices is scaled by
    * cp²·cn > 0, preserving the argmax with zero float arithmetic;
    * (area DESC, x ASC) is a total order. Interior buckets only (both
    * neighbors must exist). Scale: bucket sums are partial-aggregable;
    * the per-bucket argmax window is partitioned by bucket — parallel
    * at any scale; anchors join on the tiny bucket aggregate.
    */
  val tsDownsampleLttb: Q = Q(
    "ts_downsample_lttb",
    """WITH h AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS us,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |t0 AS (SELECT min(us) AS us0 FROM h),
      |hx AS (
      |  SELECT CAST((us - us0) // 3600000000 AS BIGINT) AS x, y
      |  FROM h CROSS JOIN t0),
      |bs AS (
      |  SELECT x // 60 AS k, CAST(count(*) AS BIGINT) AS c,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      |  FROM hx GROUP BY 1),
      |cand AS (
      |  SELECT hx.x // 60 AS k, hx.x AS x, hx.y AS y,
      |         abs((p.sx * nx.c - nx.sx * p.c) * (hx.y * p.c - p.sy)
      |             - (p.sx - hx.x * p.c) * (nx.sy * p.c - p.sy * nx.c)) AS area2
      |  FROM hx
      |  JOIN bs p ON p.k = hx.x // 60 - 1
      |  JOIN bs nx ON nx.k = hx.x // 60 + 1),
      |rk AS (
      |  SELECT k, x, y,
      |         row_number() OVER (PARTITION BY k
      |                            ORDER BY area2 DESC, x ASC) AS rn
      |  FROM cand)
      |SELECT k, x AS x_hour, y AS y_count FROM rk WHERE rn = 1
      |ORDER BY k""".stripMargin
  ) { (s, d) =>
    val h = T.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("y"))
      .select(unix_micros(col("hr")).as("us"), col("y"))
    val t0 = h.agg(min(col("us")).as("us0"))
    val hx = h.crossJoin(broadcast(t0))
      .select(expr("(us - us0) div 3600000000").as("x"), col("y"))
      .withColumn("k", expr("x div 60"))
    val bs = hx.groupBy(col("k")).agg(
      count(lit(1)).as("c"),
      sum(col("x")).cast("long").as("sx"),
      sum(col("y")).cast("long").as("sy"))
    val prev = bs.select((col("k") + 1).as("k"), col("c").as("cp"),
      col("sx").as("sxp"), col("sy").as("syp"))
    val nxt = bs.select((col("k") - 1).as("k"), col("c").as("cn"),
      col("sx").as("sxn"), col("sy").as("syn"))
    val cand = hx.join(broadcast(prev), "k").join(broadcast(nxt), "k")
      .withColumn("area2",
        abs((col("sxp") * col("cn") - col("sxn") * col("cp"))
          * (col("y") * col("cp") - col("syp"))
          - (col("sxp") - col("x") * col("cp"))
          * (col("syn") * col("cp") - col("syp") * col("cn"))))
    val w = Window.partitionBy(col("k")).orderBy(col("area2").desc, col("x").asc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("x").as("x_hour"), col("y").as("y_count"))
      .orderBy(col("k"))
  }

  /** Spearman rank correlation (tie-corrected) between lineitem
    * quantity and extended price — the monotone-association measure
    * agg_corr's Pearson can't see through outliers. Both variables are
    * ranked with average ranks kept EXACT as integers (2·rank = 2P+t+1,
    * the stats_mann_whitney device), ranks join back to rows by value
    * (the 50-value quantity map broadcasts; the price map is an
    * equi-join shuffle), and ρ is Pearson over the integer 2·rank pairs
    * with every sufficient statistic summed in DECIMAL(38,0) —
    * (2r)² ≈ 4n² per row overflows BIGINT at sf1, the welch headroom
    * argument. The price-rank prefix uses the two-phase binned
    * cumulative; the only floats are the final formula, token-mirrored.
    */
  val statsSpearman: Q = Q(
    "stats_spearman",
    """WITH l AS (
      |  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qv,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pv
      |  FROM lineitem),
      |qr AS (
      |  SELECT qv, 2 * (CAST(sum(ct) OVER (ORDER BY qv) AS BIGINT) - ct) + ct + 1 AS r2
      |  FROM (SELECT qv, CAST(count(*) AS BIGINT) AS ct FROM l GROUP BY 1) qg),
      |pr AS (
      |  SELECT pv, 2 * (CAST(sum(ct) OVER (ORDER BY pv) AS BIGINT) - ct) + ct + 1 AS r2
      |  FROM (SELECT pv, CAST(count(*) AS BIGINT) AS ct FROM l GROUP BY 1) pg),
      |j AS (
      |  SELECT qr.r2 AS x, pr.r2 AS y
      |  FROM l JOIN qr ON l.qv = qr.qv JOIN pr ON l.pv = pr.pv),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
      |         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
      |         CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      |  FROM j)
      |SELECT n,
      |  round(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |        / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
      |               * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6)
      |    AS rho
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val l = T.lineitem(s, d).select(
      (T.dec2(col("l_quantity")) * 100).cast("long").as("qv"),
      (T.dec2(col("l_extendedprice")) * 100).cast("long").as("pv"))
    // generic two-phase 2·avg-rank map for a value column (stats_ks /
    // mann_whitney idiom): rank2(v) = 2·P(v) + t(v) + 1, exact integer
    def rank2(vals: org.apache.spark.sql.DataFrame, vc: String): org.apache.spark.sql.DataFrame = {
      val v = vals.groupBy(col(vc)).agg(count(lit(1)).as("ct"))
        .withColumn("bin", expr(s"$vc div 1000000"))
      val binPre = v.groupBy(col("bin")).agg(sum(col("ct")).as("bt"))
        .select(col("bin"),
          (sum(col("bt")).over(Window.orderBy(col("bin"))) - col("bt")).as("pb"))
      val wb = Window.partitionBy(col("bin")).orderBy(col(vc))
      v.join(broadcast(binPre), "bin")
        .select(col(vc),
          (lit(2) * (col("pb") + sum(col("ct")).over(wb) - col("ct"))
            + col("ct") + 1).as("r2"))
    }
    val qr = rank2(l.select(col("qv")), "qv").withColumnRenamed("r2", "x")
    val pr = rank2(l.select(col("pv")), "pv").withColumnRenamed("r2", "y")
    val j = l.join(broadcast(qr), "qv").join(pr, "pv").select(col("x"), col("y"))
    def d38x(c: Column) = c.cast("decimal(38,0)")
    val agg = j.agg(
      count(lit(1)).as("n"),
      sum(d38x(col("x"))).cast("decimal(38,0)").as("sx"),
      sum(d38x(col("y"))).cast("decimal(38,0)").as("sy"),
      sum(d38x(col("x")) * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(d38x(col("x")) * col("x")).cast("decimal(38,0)").as("sxx"),
      sum(d38x(col("y")) * col("y")).cast("decimal(38,0)").as("syy"))
    agg.select(col("n"),
      round((d38x(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
        / sqrt((d38x(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
          * (d38x(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")), 6)
        .as("rho"))
  }

  /** B10 depth: MERGEABLE HLL SKETCHES — the associative distinct-count
    * structure that makes 100 TB COUNT(DISTINCT) a map-side-combine:
    * per-nation sketches of the customer keys are built independently,
    * union-merged, and the estimate must EQUAL the single-pass global
    * sketch (HLL register-max is order-independent and associative —
    * the property the row proves), with relative error vs the exact
    * distinct inside the lgConfigK=12 bound (±1.6% theoretical,
    * asserted at 5%). Built on Spark's Apache DataSketches bindings.
    */
  val hllMerge: Q = Q.noOracle("b10_hll_merge") { (s, d) =>
    val cust = T.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val perNation = cust.groupBy(col("c_nationkey"))
      .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"))
    val merged = perNation
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    val direct = cust.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 12))").as("est_direct"),
      countDistinct(col("c_custkey")).as("n_exact"))
    val r = merged.crossJoin(broadcast(direct))
    r.select(col("n_exact"),
      col("est_merged").cast("long").as("est_merged"),
      col("est_direct").cast("long").as("est_direct"),
      (col("est_merged") === col("est_direct")).as("merge_assoc_ok"),
      (abs(col("est_merged").cast("double") - col("n_exact").cast("double"))
        <= col("n_exact").cast("double") * lit(0.05)).as("rel_err_ok"))
  }

  /** Top-3 orders per market segment through the CUSTOM TopKPerKey
    * operator (graft.plans — custom LogicalPlan + SparkStrategy +
    * physical partial/final Exec pair registered via
    * experimental.extraStrategies): the SURVEY §4 tier-(c) exercise.
    * Same answer as `row_number() OVER (...) <= 3` — the oracle IS that
    * window query — but the plan keeps an O(K) buffer per key with a
    * map-side partial, shuffles ≤ K rows per key per partition, and
    * never sorts a whole partition (TopKPerKeySpec pins the plan
    * shape: two Execs around one Exchange, no SortExec beneath them).
    * Total order (cents DESC, o_orderkey ASC) — exact integers.
    */
  val topkPerKey: Q = Q(
    "topk_per_key",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg, o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |r AS (
      |  SELECT seg, o_orderkey, cents,
      |         row_number() OVER (PARTITION BY seg
      |                            ORDER BY cents DESC, o_orderkey ASC) AS rn
      |  FROM o)
      |SELECT seg, o_orderkey, CAST(cents AS DOUBLE) / 100.0 AS val
      |FROM r WHERE rn <= 3
      |ORDER BY seg NULLS FIRST, val DESC, o_orderkey ASC""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("o_orderkey"),
        (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    graft.plans.TopKPerKey(o, Seq("seg"), "cents", "o_orderkey", 3)
      .select(col("seg"), col("o_orderkey"),
        (dbl(col("cents")) / lit(100.0)).as("val"))
      .orderBy(col("seg").asc_nulls_first, col("val").desc, col("o_orderkey").asc)
  }

  /** Forecast-evaluation metrics for the naive seasonal baseline
    * ŷ_t = y_{t−24h} on the hourly event-count series: WAPE
    * (Σ|y−ŷ|/Σy), MAE and mean bias — the backtest scoreboard every
    * forecasting pipeline runs, and the benchmark any model must beat.
    * ALL metrics are ratios of exact BIGINT sums (|y−ŷ| and y−ŷ of
    * integer counts) — no corpus float sum anywhere; one division
    * each, token-mirrored, 6-dp round. The lag join is an equi-join on
    * epoch-micros (+24·3600s) over the calendar-bounded hourly
    * aggregate (the ts_acf shape, fixed lag).
    */
  val tsForecastEval: Q = Q(
    "ts_forecast_eval",
    """WITH h AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) AS us,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT a.n AS yhat, b.n AS y
      |  FROM h a JOIN h b ON b.us = a.us + 86400000000),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |         CAST(sum(abs(y - yhat)) AS BIGINT) AS sad,
      |         CAST(sum(y - yhat) AS BIGINT) AS sdiff,
      |         CAST(sum(y) AS BIGINT) AS sy
      |  FROM p)
      |SELECT m,
      |       round(CAST(sad AS DOUBLE) / CAST(sy AS DOUBLE), 6) AS wape,
      |       round(CAST(sad AS DOUBLE) / CAST(m AS DOUBLE), 6) AS mae,
      |       round(CAST(sdiff AS DOUBLE) / CAST(m AS DOUBLE), 6) AS bias
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val h = T.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("hr")).as("us"), col("n"))
    val a = h.select(col("us").as("usa"), col("n").as("yhat"))
    val p = a.join(h.select(col("us").as("usb"), col("n").as("y")),
      col("usb") === col("usa") + lit(86400000000L))
    val agg = p.agg(
      count(lit(1)).as("m"),
      sum(abs(col("y") - col("yhat"))).cast("long").as("sad"),
      sum(col("y") - col("yhat")).cast("long").as("sdiff"),
      sum(col("y")).cast("long").as("sy"))
    agg.select(col("m"),
      round(dbl(col("sad")) / dbl(col("sy")), 6).as("wape"),
      round(dbl(col("sad")) / dbl(col("m")), 6).as("mae"),
      round(dbl(col("sdiff")) / dbl(col("m")), 6).as("bias"))
  }

  val all: Seq[Q] = Seq(statsMannWhitney, tsTheilSen, tsDownsampleLttb,
    statsSpearman, hllMerge, topkPerKey, tsForecastEval)
}
