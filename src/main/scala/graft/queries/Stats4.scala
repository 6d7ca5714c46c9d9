package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 inference/structure wave: one-way ANOVA, Brown–Forsythe
  * robust variance-equality, Jensen–Shannon divergence, single
  * mean-shift changepoint, and degree assortativity — the hypothesis-
  * testing and structure-detection surface completing the r7/r8 stats
  * waves (welch_t tests two means; anova tests k means; levene/BF
  * tests k variances; JS measures distribution distance where KS
  * measures max ECDF gap; the changepoint localizes WHERE the mean
  * moved; assortativity says whether hubs trade with hubs).
  *
  * Determinism discipline (SURVEY §2 D-rules): every sufficient
  * statistic is an exact integer (BIGINT counts/cents, DECIMAL(38,0)
  * squares); floats appear only in final formulas mirrored
  * token-for-token, each term exact-input IEEE; bounded float sums
  * (≤5 group terms, ≤5 priority terms) carry ~1e-16 relative
  * accumulation noise against a 6-dp round on O(1)–O(1e4) ratios —
  * the chi2/mutual_info headroom argument. Cutpoints/medians use
  * percentile_disc (ACTUAL data values, integer comparisons).
  */
object Stats4 {

  private def dbl(c: Column): Column = c.cast("double")
  private def d38(c: Column): Column = c.cast("decimal(38,0)")

  /** One-way ANOVA F across the five market segments on order value
    * (exact cents): does ANY segment's mean differ? Per-group
    * sufficient statistics are exact (n BIGINT, Σx BIGINT, Σx²
    * DECIMAL(38,0)); each within-group term (n·Σx²−(Σx)²)/n has an
    * EXACT decimal numerator (welch_t precedent) so the only float
    * work is 5 exact-input divisions, their 5-term sum (headroom
    * argument above — only the F/eta² RATIOS are output, never raw
    * sums of squares), and the final mirrored formulas. Scale: fully
    * partial-aggregable; the ANOVA itself runs on a 5-row aggregate.
    */
  val statsAnova: Q = Q(
    "stats_anova",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |arm AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cents) AS BIGINT) AS s1,
      |         CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      |  FROM o GROUP BY 1),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |         CAST(sum(s1) AS BIGINT) AS g1,
      |         CAST(sum(s2) AS DECIMAL(38,0)) AS g2,
      |         sum(CAST(CAST(n AS DECIMAL(38,0)) * s2
      |                  - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
      |                  AS DOUBLE) / CAST(n AS DOUBLE)) AS ssw
      |  FROM arm),
      |fin AS (
      |  SELECT k, nn, ssw,
      |         CAST(CAST(nn AS DECIMAL(38,0)) * g2
      |              - CAST(g1 AS DECIMAL(38,0)) * CAST(g1 AS DECIMAL(38,0))
      |              AS DOUBLE) / CAST(nn AS DOUBLE) AS sst
      |  FROM g)
      |SELECT nn, k, k - 1 AS dof1, nn - k AS dof2,
      |       round(((sst - ssw) / CAST(k - 1 AS DOUBLE))
      |             / (ssw / CAST(nn - k AS DOUBLE)), 6) AS f,
      |       round((sst - ssw) / sst, 6) AS eta_sq
      |FROM fin""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val arm = o.groupBy(col("seg")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s1"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).cast("decimal(38,0)").as("s2"))
    val g = arm.agg(
      count(lit(1)).as("k"),
      sum(col("n")).cast("long").as("nn"),
      sum(col("s1")).cast("long").as("g1"),
      sum(col("s2")).cast("decimal(38,0)").as("g2"),
      sum((d38(col("n")) * col("s2") - d38(col("s1")) * d38(col("s1"))).cast("double")
        / dbl(col("n"))).as("ssw"))
    val fin = g.select(col("k"), col("nn"), col("ssw"),
      ((d38(col("nn")) * col("g2") - d38(col("g1")) * d38(col("g1"))).cast("double")
        / dbl(col("nn"))).as("sst"))
    fin.select(col("nn"), col("k"),
      (col("k") - 1).as("dof1"), (col("nn") - col("k")).as("dof2"),
      round(((col("sst") - col("ssw")) / dbl(col("k") - 1))
        / (col("ssw") / dbl(col("nn") - col("k"))), 6).as("f"),
      round((col("sst") - col("ssw")) / col("sst"), 6).as("eta_sq"))
  }

  /** Brown–Forsythe robust variance-equality test: one-way ANOVA F on
    * z = |x − median_g| — "do the segments have different SPREAD?",
    * robust to non-normality because the center is the median, not the
    * mean. The per-group median is percentile_disc (an ACTUAL cents
    * value, so every |x − med| is an exact BIGINT); the F machinery is
    * statsAnova's on z. Output keeps the per-group spread profile
    * (n, median, mean absolute deviation) with the global F attached.
    * Scale: medians are a |segments|-row aggregate broadcast back
    * (winsorize idiom); everything else partial-aggregable.
    */
  val statsLeveneBf: Q = Q(
    "stats_levene_bf",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |med AS (
      |  SELECT seg,
      |         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS med
      |  FROM o GROUP BY 1),
      |z AS (
      |  SELECT o.seg, med, abs(cents - med) AS zv
      |  FROM o JOIN med ON o.seg = med.seg),
      |arm AS (
      |  SELECT seg, med, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(zv) AS BIGINT) AS s1,
      |         CAST(sum(CAST(zv * zv AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      |  FROM z GROUP BY 1, 2),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |         CAST(sum(s1) AS BIGINT) AS g1,
      |         CAST(sum(s2) AS DECIMAL(38,0)) AS g2,
      |         sum(CAST(CAST(n AS DECIMAL(38,0)) * s2
      |                  - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
      |                  AS DOUBLE) / CAST(n AS DOUBLE)) AS ssw
      |  FROM arm),
      |fstat AS (
      |  SELECT k, nn,
      |    round(((CAST(CAST(nn AS DECIMAL(38,0)) * g2
      |                 - CAST(g1 AS DECIMAL(38,0)) * CAST(g1 AS DECIMAL(38,0))
      |                 AS DOUBLE) / CAST(nn AS DOUBLE) - ssw)
      |           / CAST(k - 1 AS DOUBLE))
      |          / (ssw / CAST(nn - k AS DOUBLE)), 6) AS f_bf
      |  FROM g)
      |SELECT seg, n, med AS med_cents,
      |       round(CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6) AS mad_mean,
      |       f_bf
      |FROM arm CROSS JOIN fstat
      |ORDER BY seg NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val med = o.groupBy(col("seg")).agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("med"))
    val z = o.join(broadcast(med), "seg")
      .select(col("seg"), col("med"), abs(col("cents") - col("med")).as("zv"))
    val arm = z.groupBy(col("seg"), col("med")).agg(
      count(lit(1)).as("n"),
      sum(col("zv")).cast("long").as("s1"),
      sum((col("zv") * col("zv")).cast("decimal(38,0)")).cast("decimal(38,0)").as("s2"))
    val g = arm.agg(
      count(lit(1)).as("k"),
      sum(col("n")).cast("long").as("nn"),
      sum(col("s1")).cast("long").as("g1"),
      sum(col("s2")).cast("decimal(38,0)").as("g2"),
      sum((d38(col("n")) * col("s2") - d38(col("s1")) * d38(col("s1"))).cast("double")
        / dbl(col("n"))).as("ssw"))
    val fstat = g.select(col("k"), col("nn"),
      round((((d38(col("nn")) * col("g2") - d38(col("g1")) * d38(col("g1"))).cast("double")
        / dbl(col("nn")) - col("ssw")) / dbl(col("k") - 1))
        / (col("ssw") / dbl(col("nn") - col("k"))), 6).as("f_bf"))
    arm.crossJoin(broadcast(fstat))
      .select(col("seg"), col("n"), col("med").as("med_cents"),
        round(dbl(col("s1")) / (dbl(col("n")) * lit(100.0)), 6).as("mad_mean"),
        col("f_bf"))
      .orderBy(col("seg").asc_nulls_first)
  }

  /** Jensen–Shannon divergence between the BUILDING and MACHINERY
    * order-priority distributions — the symmetric, bounded (≤ ln 2)
    * distribution distance that mutual_info/KS don't give: JSD works
    * on categorical distributions and never blows up on a zero cell
    * (KL does). p, q are exact count ratios; each of the ≤5×2 terms
    * is exact-input IEEE (one ln per term, 6-dp-round headroom);
    * js_dist is the sqrt of the ALREADY-ROUNDED jsd (cramers_v
    * device). Scale: counts partial-aggregable; the term table is
    * bounded by the priority domain.
    */
  val statsJensenShannon: Q = Q(
    "stats_jensen_shannon",
    """WITH j AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |n AS (
      |  SELECT CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |  FROM j),
      |c AS (
      |  SELECT pri,
      |         CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |         CAST(sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |  FROM j GROUP BY 1),
      |t AS (
      |  SELECT n0, n1,
      |    CASE WHEN c0 > 0 THEN 0.5 * (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |      * ln((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
      |           / ((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |               + CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 2.0))
      |      ELSE 0.0 END
      |    + CASE WHEN c1 > 0 THEN 0.5 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |      * ln((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
      |           / ((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |               + CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 2.0))
      |      ELSE 0.0 END AS term
      |  FROM c CROSS JOIN n),
      |fin AS (SELECT n0, n1, round(sum(term), 6) AS jsd FROM t GROUP BY n0, n1)
      |SELECT n0, n1, jsd, round(sqrt(jsd), 6) AS js_dist FROM fin""".stripMargin
  ) { (s, d) =>
    val j = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderpriority").as("pri")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("seg").isin("BUILDING", "MACHINERY"))
      .select(col("seg"), col("pri"))
    val n = j.agg(
      sum(when(col("seg") === "BUILDING", 1).otherwise(0)).cast("long").as("n0"),
      sum(when(col("seg") === "MACHINERY", 1).otherwise(0)).cast("long").as("n1"))
    val c = j.groupBy(col("pri")).agg(
      sum(when(col("seg") === "BUILDING", 1).otherwise(0)).cast("long").as("c0"),
      sum(when(col("seg") === "MACHINERY", 1).otherwise(0)).cast("long").as("c1"))
    val p = dbl(col("c0")) / dbl(col("n0"))
    val q = dbl(col("c1")) / dbl(col("n1"))
    val m = (p + q) / lit(2.0)
    val t = c.crossJoin(broadcast(n)).select(col("n0"), col("n1"),
      (when(col("c0") > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0))
        + when(col("c1") > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))).as("term"))
    t.groupBy(col("n0"), col("n1")).agg(round(sum(col("term")), 6).as("jsd"))
      .select(col("n0"), col("n1"), col("jsd"), round(sqrt(col("jsd")), 6).as("js_dist"))
  }

  /** Single mean-shift changepoint on the daily event-count series:
    * the split maximizing the between-segment sum of squares
    * L1²/nL + R1²/nR − S²/N (equivalently minimizing total SSE) — the
    * first step of binary segmentation, localizing WHERE the level
    * moved where ts_cusum only says THAT it drifted. Every candidate
    * gain is built from integer prefix sums (< 2⁵³ through sf10, so
    * each double term is exact-input IEEE and the three-term fixed-
    * order gain is BIT-IDENTICAL cross-engine — the argmax orders by
    * the raw gain with the day as tiebreak, a total order; the OUTPUT
    * carries the gain normalized by total SS, an O(1) ratio that 6-dp
    * rounds safely where the raw SS magnitude would not). Scale:
    * the cumulative window and the n-candidate scan run over the
    * CALENDAR-BOUNDED daily aggregate, never the event stream; the
    * corpus-scale work is one partial-aggregable daily count.
    */
  val tsChangepointMean: Q = Q(
    "ts_changepoint_mean",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS s,
      |               CAST(sum(y * y) AS BIGINT) AS s2 FROM dly),
      |cum AS (
      |  SELECT dx,
      |         CAST(sum(y) OVER (ORDER BY dx
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS l1,
      |         CAST(row_number() OVER (ORDER BY dx) AS BIGINT) AS i
      |  FROM dly),
      |cand AS (
      |  SELECT dx, i AS n_left, nn - i AS n_right, l1, s - l1 AS r1,
      |         CAST(l1 * l1 AS DOUBLE) / CAST(i AS DOUBLE)
      |           + CAST((s - l1) * (s - l1) AS DOUBLE) / CAST(nn - i AS DOUBLE)
      |           - CAST(s * s AS DOUBLE) / CAST(nn AS DOUBLE) AS gain,
      |         CAST(s2 AS DOUBLE)
      |           - CAST(s * s AS DOUBLE) / CAST(nn AS DOUBLE) AS sst
      |  FROM cum CROSS JOIN tot WHERE i < nn)
      |SELECT dx AS split_day, n_left, n_right,
      |       round(CAST(l1 AS DOUBLE) / CAST(n_left AS DOUBLE), 6) AS mean_left,
      |       round(CAST(r1 AS DOUBLE) / CAST(n_right AS DOUBLE), 6) AS mean_right,
      |       round(gain / sst, 6) AS gain_ratio
      |FROM cand ORDER BY gain DESC, split_day ASC LIMIT 1""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(expr("unix_micros(day) div 86400000000").as("dx"), col("y"))
    val tot = dly.agg(count(lit(1)).as("nn"), sum(col("y")).cast("long").as("s"),
      sum(col("y") * col("y")).cast("long").as("s2"))
    val w = Window.orderBy(col("dx")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dly.select(col("dx"),
      sum(col("y")).over(w).cast("long").as("l1"),
      row_number().over(Window.orderBy(col("dx"))).cast("long").as("i"))
    val cand = cum.crossJoin(broadcast(tot)).filter(col("i") < col("nn"))
      .select(col("dx"), col("i").as("n_left"), (col("nn") - col("i")).as("n_right"),
        col("l1"), (col("s") - col("l1")).as("r1"),
        (dbl(col("l1") * col("l1")) / dbl(col("i"))
          + dbl((col("s") - col("l1")) * (col("s") - col("l1"))) / dbl(col("nn") - col("i"))
          - dbl(col("s") * col("s")) / dbl(col("nn"))).as("gain"),
        (dbl(col("s2")) - dbl(col("s") * col("s")) / dbl(col("nn"))).as("sst"))
    cand.select(col("dx").as("split_day"), col("n_left"), col("n_right"),
      round(dbl(col("l1")) / dbl(col("n_left")), 6).as("mean_left"),
      round(dbl(col("r1")) / dbl(col("n_right")), 6).as("mean_right"),
      round(col("gain") / col("sst"), 6).as("gain_ratio"), col("gain"))
      .orderBy(col("gain").desc, col("split_day").asc)
      .limit(1)
      .drop("gain")
  }

  /** Degree assortativity of the nation trade graph: the Pearson
    * correlation of endpoint degrees over all directed edge instances
    * — positive means hubs trade with hubs (assortative mixing),
    * negative means hub-and-spoke. Edges are graph_triangles' mean-
    * thresholded pair aggregate (integer cross-multiply threshold);
    * degrees and ALL Pearson sufficient statistics are exact BIGINT
    * (degrees ≤ |nations|, so no overflow anywhere); one final rounded
    * formula. Scale: the corpus-scale work is the distributed 4-join
    * edge derivation; everything after runs on the |nations|²-bounded
    * aggregate.
    */
  val graphAssortativity: Q = Q(
    "graph_assortativity",
    """WITH de AS (
      |  SELECT sn.n_name AS src, cn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  WHERE sn.n_name <> cn.n_name
      |  GROUP BY 1, 2),
      |pw AS (
      |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
      |         CAST(sum(w) AS BIGINT) AS pwt
      |  FROM de GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |               CAST(sum(pwt) AS BIGINT) AS tw FROM pw),
      |e AS (SELECT a, b FROM pw CROSS JOIN tot WHERE pwt * np > tw),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS dg FROM (
      |    SELECT a AS n FROM e UNION ALL SELECT b FROM e) u GROUP BY 1),
      |dir AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
      |xy AS (
      |  SELECT da.dg AS x, db.dg AS y
      |  FROM dir JOIN deg da ON dir.u = da.n JOIN deg db ON dir.v = db.n),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM xy)
      |SELECT n // 2 AS n_edges,
      |       round(CAST(n * sxy - sx * sy AS DOUBLE)
      |             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS assortativity
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val sn = T.nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = T.nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    val de = T.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    val pw = de.groupBy(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("pwt"))
    val tot = pw.agg(count(lit(1)).as("np"), sum(col("pwt")).cast("long").as("tw"))
    val e = pw.crossJoin(broadcast(tot))
      .filter(col("pwt") * col("np") > col("tw"))
      .select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val dir = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val da = deg.select(col("n").as("na"), col("dg").as("x"))
    val db = deg.select(col("n").as("nb"), col("dg").as("y"))
    val xy = dir.join(broadcast(da), col("u") === col("na"))
      .join(broadcast(db), col("v") === col("nb"))
      .select(col("x"), col("y"))
    val agg = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("long").as("sx"), sum(col("y")).cast("long").as("sy"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"),
      sum(col("y") * col("y")).cast("long").as("syy"))
    agg.select((col("n") / 2).cast("long").as("n_edges"),
      round(dbl(col("n") * col("sxy") - col("sx") * col("sy"))
        / sqrt(dbl(col("n") * col("sxx") - col("sx") * col("sx"))
          * dbl(col("n") * col("syy") - col("sy") * col("sy"))), 6).as("assortativity"))
  }

  val all: Seq[Q] = Seq(statsAnova, statsLeveneBf, statsJensenShannon,
    tsChangepointMean, graphAssortativity)
}
