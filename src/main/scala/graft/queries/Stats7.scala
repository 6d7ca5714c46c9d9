package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 first wave: rank association (Kendall tau-b),
  * paired nonparametric testing (Wilcoxon signed-rank), quantile-space
  * distribution comparison (QQ), and two-regressor OLS — closing the
  * gaps around "are these two daily series monotonically related?",
  * "did the paired metric shift?", "where in the distribution do two
  * cohorts diverge?", and "which driver explains the target, holding
  * the other fixed?".
  *
  * Determinism: every sufficient statistic is an exact integer
  * (BIGINT counts, 2·rank halves, percentile_disc picks actual cents);
  * only final ratios are token-mirrored double formulas rounded 6 dp.
  */
object Stats7 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Kendall tau-b between the daily click and view counts: all-pairs
    * concordance over the CALENDAR-BOUNDED daily aggregate (n_days²
    * pairs regardless of corpus size — the ts_theil_sen shape).
    * C/D/tie pair counts are exact integers from integer sign
    * products; tau-b = (C−D)/√((n0−Tx)(n0−Ty)) is one token-mirrored
    * double expression over those integers, rounded 6 dp. The rank
    * companion to stats_spearman: tau's pair semantics are robust to
    * the tie structure that distorts rho on heavily-tied counts.
    */
  val statsKendallTau: Q = Q(
    "stats_kendall_tau",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |pr AS (
      |  SELECT (b.x - a.x) AS px, (b.y - a.y) AS py
      |  FROM dly a JOIN dly b ON a.dx < b.dx),
      |agg AS (
      |  SELECT CAST((SELECT count(*) FROM dly) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN px * py > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |         CAST(sum(CASE WHEN px * py < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
      |         CAST(sum(CASE WHEN px = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |         CAST(sum(CASE WHEN py = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
      |  FROM pr)
      |SELECT n, c, disc, tx, ty,
      |       round(CAST(c - disc AS DOUBLE)
      |             / sqrt(CAST(n * (n - 1) / 2 - tx AS DOUBLE)
      |                    * CAST(n * (n - 1) / 2 - ty AS DOUBLE)), 6) AS tau_b
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long").as("x"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).cast("long").as("y"))
    val a = dly.select(col("dx").as("adx"), col("x").as("ax"), col("y").as("ay"))
    val b = dly.select(col("dx").as("bdx"), col("x").as("bx"), col("y").as("by"))
    val pr = a.join(b, col("adx") < col("bdx"))
      .select((col("bx") - col("ax")).as("px"), (col("by") - col("ay")).as("py"))
    val nDf = dly.agg(count(lit(1)).cast("long").as("n"))
    val agg = pr.agg(
      sum(when(col("px") * col("py") > 0, 1).otherwise(0)).cast("long").as("c"),
      sum(when(col("px") * col("py") < 0, 1).otherwise(0)).cast("long").as("disc"),
      sum(when(col("px") === 0, 1).otherwise(0)).cast("long").as("tx"),
      sum(when(col("py") === 0, 1).otherwise(0)).cast("long").as("ty"))
      .crossJoin(nDf) // 1-row × 1-row
    val n0 = col("n") * (col("n") - 1) / 2
    agg.select(col("n"), col("c"), col("disc"), col("tx"), col("ty"),
      round(dbl(col("c") - col("disc"))
        / sqrt(dbl(n0 - col("tx")) * dbl(n0 - col("ty"))), 6).as("tau_b"))
  }

  /** Wilcoxon signed-rank test on the paired daily (click, view)
    * counts: does the click−view difference have zero median? Zero
    * diffs excluded (standard practice); |d| ranked with AVERAGE ranks
    * kept exact in HALVES (2·rank = 2P + t + 1 — the mann_whitney
    * device; P from an EXCLUSIVE prefix sum over the ≤|days| distinct
    * |d| values). 2·W⁺, n, and the tie term Σ(t³−t) are exact BIGINT;
    * z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24 − Σ(t³−t)/48) is one
    * token-mirrored double formula. Scale: windows over the
    * CALENDAR-BOUNDED per-|d| aggregate.
    */
  val statsWilcoxon: Q = Q(
    "stats_wilcoxon",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      |           - CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS df
      |  FROM events GROUP BY 1),
      |nz AS (SELECT abs(df) AS ad, CASE WHEN df > 0 THEN 1 ELSE 0 END AS pos
      |       FROM dly WHERE df <> 0),
      |grp AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
      |               CAST(sum(pos) AS BIGINT) AS pos_t
      |        FROM nz GROUP BY ad),
      |rk AS (
      |  SELECT ad, t, pos_t,
      |         CAST(coalesce(sum(t) OVER (ORDER BY ad
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
      |  FROM grp),
      |agg AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n,
      |         CAST(sum(pos_t * (2 * p + t + 1)) AS BIGINT) AS w2,
      |         CAST(sum(t * t * t - t) AS BIGINT) AS tsum
      |  FROM rk)
      |SELECT n, w2, tsum,
      |       round((CAST(w2 AS DOUBLE) / 2.0
      |                - CAST(n * (n + 1) AS DOUBLE) / 4.0)
      |             / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0
      |                    - CAST(tsum AS DOUBLE) / 48.0), 6) AS z
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg((sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long")
        - sum(when(col("event_type") === "view", 1).otherwise(0)).cast("long")).as("df"))
    val nz = dly.filter(col("df") =!= 0)
      .select(abs(col("df")).as("ad"), when(col("df") > 0, 1).otherwise(0).as("pos"))
    val grp = nz.groupBy(col("ad"))
      .agg(count(lit(1)).cast("long").as("t"), sum(col("pos")).cast("long").as("pos_t"))
    // bounded window: ≤ |days| distinct |d| values (calendar-bounded)
    val w = Window.orderBy(col("ad")).rowsBetween(Window.unboundedPreceding, -1)
    val rk = grp.withColumn("p", coalesce(sum(col("t")).over(w), lit(0L)).cast("long"))
    val agg = rk.agg(
      sum(col("t")).cast("long").as("n"),
      sum(col("pos_t") * (lit(2) * col("p") + col("t") + 1)).cast("long").as("w2"),
      sum(col("t") * col("t") * col("t") - col("t")).cast("long").as("tsum"))
    agg.select(col("n"), col("w2"), col("tsum"),
      round((dbl(col("w2")) / 2.0 - dbl(col("n") * (col("n") + 1)) / 4.0)
        / sqrt(dbl(col("n") * (col("n") + 1) * (lit(2) * col("n") + 1)) / 24.0
          - dbl(col("tsum")) / 48.0), 6).as("z"))
  }

  /** QQ comparison of the BUILDING vs MACHINERY order-value
    * distributions: the two segments' decile grids joined quantile-by-
    * quantile — WHERE in the distribution the cohorts diverge (a drift
    * lens dq_drift_psi's fixed bins can miss: PSI sees mass moving
    * between bins, QQ sees the quantile displacement itself).
    * percentile_disc picks ACTUAL cents values (exact integers); the
    * per-decile ratio is one rounded division. Scale: one
    * partial-aggregable pass per segment; output is 9 rows.
    */
  val statsQq: Q = Q(
    "stats_qq",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |qa AS (
      |  SELECT
      |    CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d1,
      |    CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d2,
      |    CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d3,
      |    CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d4,
      |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d5,
      |    CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d6,
      |    CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d7,
      |    CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d8,
      |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d9
      |  FROM o WHERE seg = 'BUILDING'),
      |qb AS (
      |  SELECT
      |    CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d1,
      |    CAST(percentile_disc(0.2) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d2,
      |    CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d3,
      |    CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d4,
      |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d5,
      |    CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d6,
      |    CAST(percentile_disc(0.7) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d7,
      |    CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d8,
      |    CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS d9
      |  FROM o WHERE seg = 'MACHINERY'),
      |st AS (
      |  SELECT CAST(1 AS BIGINT) AS decile, qa.d1 AS cents_a, qb.d1 AS cents_b FROM qa, qb
      |  UNION ALL SELECT 2, qa.d2, qb.d2 FROM qa, qb
      |  UNION ALL SELECT 3, qa.d3, qb.d3 FROM qa, qb
      |  UNION ALL SELECT 4, qa.d4, qb.d4 FROM qa, qb
      |  UNION ALL SELECT 5, qa.d5, qb.d5 FROM qa, qb
      |  UNION ALL SELECT 6, qa.d6, qb.d6 FROM qa, qb
      |  UNION ALL SELECT 7, qa.d7, qb.d7 FROM qa, qb
      |  UNION ALL SELECT 8, qa.d8, qb.d8 FROM qa, qb
      |  UNION ALL SELECT 9, qa.d9, qb.d9 FROM qa, qb)
      |SELECT decile, cents_a, cents_b,
      |       round(CAST(cents_a AS DOUBLE) / CAST(cents_b AS DOUBLE), 6) AS qq_ratio
      |FROM st ORDER BY decile""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    def grid(seg: String, suffix: String) = {
      val aggs = (1 to 9).map { k =>
        expr(s"CAST(percentile_disc(0.$k) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as(s"d$k$suffix")
      }
      o.filter(col("seg") === seg).agg(aggs.head, aggs.tail: _*)
    }
    val joined = grid("BUILDING", "a").crossJoin(grid("MACHINERY", "b")) // 1-row × 1-row
    val stackArgs = (1 to 9).map(k => s"CAST($k AS BIGINT), d${k}a, d${k}b").mkString(", ")
    joined
      .select(expr(s"stack(9, $stackArgs) AS (decile, cents_a, cents_b)"))
      .select(col("decile"), col("cents_a"), col("cents_b"),
        round(dbl(col("cents_a")) / dbl(col("cents_b")), 6).as("qq_ratio"))
      .orderBy(col("decile"))
  }

  /** Two-regressor OLS: daily purchases ~ views + clicks (normal
    * equations via Cramer's rule on the centered 2×2 system) — does
    * either upstream event drive conversions once the other is held
    * fixed? agg_linreg's multivariate completion. ALL sufficient
    * statistics (n, Σx, Σx², Σxy — 9 sums) are exact BIGINT over the
    * CALENDAR-BOUNDED daily aggregate (< 2⁵³ through sf10); centered
    * moments S·· are exact integer expressions; only the final β/R²
    * ratios are token-mirrored double formulas, rounded 6 dp.
    */
  val statsOls2: Q = Q(
    "stats_ols2",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x2,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x1 * x1) AS BIGINT) AS sx11,
      |         CAST(sum(x2 * x2) AS BIGINT) AS sx22,
      |         CAST(sum(x1 * x2) AS BIGINT) AS sx12,
      |         CAST(sum(x1 * y) AS BIGINT) AS sx1y,
      |         CAST(sum(x2 * y) AS BIGINT) AS sx2y,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM dly),
      |m AS (
      |  SELECT n, sx1, sx2, sy,
      |         CAST(n * sx11 - sx1 * sx1 AS DOUBLE) AS s11,
      |         CAST(n * sx22 - sx2 * sx2 AS DOUBLE) AS s22,
      |         CAST(n * sx12 - sx1 * sx2 AS DOUBLE) AS s12,
      |         CAST(n * sx1y - sx1 * sy AS DOUBLE) AS s1y,
      |         CAST(n * sx2y - sx2 * sy AS DOUBLE) AS s2y,
      |         CAST(n * syy - sy * sy AS DOUBLE) AS syc
      |  FROM s),
      |b AS (
      |  SELECT n, sx1, sx2, sy, s1y, s2y, syc,
      |         (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
      |         (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
      |  FROM m)
      |SELECT n,
      |       round((CAST(sy AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE)
      |              - b2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS b0,
      |       round(b1, 6) AS b1, round(b2, 6) AS b2,
      |       round((b1 * s1y + b2 * s2y) / syc, 6) AS r2
      |FROM b""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(
        sum(when(col("event_type") === "view", 1).otherwise(0)).cast("long").as("x1"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long").as("x2"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("long").as("y"))
    val suf = dly.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x1")).cast("long").as("sx1"), sum(col("x2")).cast("long").as("sx2"),
      sum(col("y")).cast("long").as("sy"),
      sum(col("x1") * col("x1")).cast("long").as("sx11"),
      sum(col("x2") * col("x2")).cast("long").as("sx22"),
      sum(col("x1") * col("x2")).cast("long").as("sx12"),
      sum(col("x1") * col("y")).cast("long").as("sx1y"),
      sum(col("x2") * col("y")).cast("long").as("sx2y"),
      sum(col("y") * col("y")).cast("long").as("syy"))
    val m = suf.select(col("n"), col("sx1"), col("sx2"), col("sy"),
      dbl(col("n") * col("sx11") - col("sx1") * col("sx1")).as("s11"),
      dbl(col("n") * col("sx22") - col("sx2") * col("sx2")).as("s22"),
      dbl(col("n") * col("sx12") - col("sx1") * col("sx2")).as("s12"),
      dbl(col("n") * col("sx1y") - col("sx1") * col("sy")).as("s1y"),
      dbl(col("n") * col("sx2y") - col("sx2") * col("sy")).as("s2y"),
      dbl(col("n") * col("syy") - col("sy") * col("sy")).as("syc"))
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val b = m.select(col("n"), col("sx1"), col("sx2"), col("sy"),
      col("s1y"), col("s2y"), col("syc"),
      ((col("s22") * col("s1y") - col("s12") * col("s2y")) / det).as("b1"),
      ((col("s11") * col("s2y") - col("s12") * col("s1y")) / det).as("b2"))
    b.select(col("n"),
      round((dbl(col("sy")) - col("b1") * dbl(col("sx1"))
        - col("b2") * dbl(col("sx2"))) / dbl(col("n")), 6).as("b0"),
      round(col("b1"), 6).as("b1"), round(col("b2"), 6).as("b2"),
      round((col("b1") * col("s1y") + col("b2") * col("s2y")) / col("syc"), 6).as("r2"))
  }

  def all: Seq[Q] = Seq(statsKendallTau, statsWilcoxon, statsQq, statsOls2)
}
