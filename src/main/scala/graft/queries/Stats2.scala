package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 robust-statistics / graph wave: chi-squared independence,
  * Welch's unequal-variance t-test, winsorized (outlier-clamped) means,
  * triangle counting on the trade graph, and a rolling-median smoother
  * — the robust/analytic surface between the r7 stats wave (BM25, KM,
  * z-test, MI) and plain aggregation.
  *
  * Determinism discipline (SURVEY §2 D-rules + the r6/r7 lessons):
  * counts and cents are exact integers end-to-end; big sums that exceed
  * long headroom run in DECIMAL(38,0) (supplier_herfindahl precedent);
  * floats appear only in FINAL formulas mirrored token-for-token in the
  * oracle; bounded-cardinality float sums (≤25 cells) carry ~1e-16
  * accumulation noise against a round at 1e-6 (mutual_info precedent);
  * cutpoints use percentile_disc — an ACTUAL data value, exact in
  * integer cents, so clamp membership is an integer comparison, never a
  * float threshold (the interpolated-cutpoint trap rfm_segment rounds
  * around does not exist here).
  */
object Stats2 {

  /** Chi-squared test of independence between customer market segment
    * and order priority over the ≤5×5 contingency table, plus Cramér's
    * V effect size. Per-cell term ((nxy·n − nx·ny)²/(nx·ny·n)): the
    * products stay < 2⁵³ through sf10 so each double term is exact-input
    * IEEE arithmetic, bit-identical cross-engine; the ≤25-term sum is
    * rounded at 6 dp (mutual_info headroom argument). Cramér's V is one
    * sqrt of the ALREADY-ROUNDED chi2 — deterministic by construction.
    * Scale: partial-aggregable counts; the cell table is bounded by the
    * attribute domains, never the corpus.
    */
  val statsChi2: Q = Q(
    "stats_chi2",
    """WITH j AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
      |xy AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS nxy FROM j GROUP BY 1, 2),
      |x AS (SELECT seg, CAST(count(*) AS BIGINT) AS nx FROM j GROUP BY 1),
      |y AS (SELECT pri, CAST(count(*) AS BIGINT) AS ny FROM j GROUP BY 1),
      |dims AS (
      |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS nr,
      |         (SELECT CAST(count(*) AS BIGINT) FROM y) AS nc),
      |chi AS (
      |  SELECT n, nr, nc,
      |    round(sum(
      |      (CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
      |       - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
      |      * (CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
      |         - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
      |      / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) * CAST(n AS DOUBLE))), 6)
      |      AS chi2
      |  FROM xy JOIN x USING (seg) JOIN y USING (pri)
      |  CROSS JOIN tot CROSS JOIN dims
      |  GROUP BY n, nr, nc)
      |SELECT n, (nr - 1) * (nc - 1) AS dof, chi2,
      |       round(sqrt(chi2 / (CAST(n AS DOUBLE)
      |                          * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 6)
      |         AS cramers_v
      |FROM chi""".stripMargin
  ) { (s, d) =>
    val j = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderpriority").as("pri")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("pri"))
    val tot = j.agg(count(lit(1)).as("n"))
    val xy = j.groupBy(col("seg"), col("pri")).agg(count(lit(1)).as("nxy"))
    val x = j.groupBy(col("seg")).agg(count(lit(1)).as("nx"))
    val y = j.groupBy(col("pri")).agg(count(lit(1)).as("ny"))
    val dims = x.agg(count(lit(1)).as("nr"))
      .crossJoin(y.agg(count(lit(1)).as("nc")))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val dev = dbl(col("nxy")) * dbl(col("n")) - dbl(col("nx")) * dbl(col("ny"))
    val chi = xy.join(x, "seg").join(y, "pri")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(round(sum(dev * dev / (dbl(col("nx")) * dbl(col("ny")) * dbl(col("n")))), 6)
        .as("chi2"))
    chi.select(col("n"), ((col("nr") - 1) * (col("nc") - 1)).as("dof"), col("chi2"),
      round(sqrt(col("chi2") / (dbl(col("n"))
        * dbl(least(col("nr") - 1, col("nc") - 1)))), 6).as("cramers_v"))
  }

  /** Welch's unequal-variance t-test on order value (exact cents)
    * between the BUILDING and MACHINERY segments — the continuous-means
    * companion to ab_test_z's proportions. Per-arm sufficient statistics
    * are exact: n (BIGINT), Σcents (BIGINT), Σcents² (DECIMAL(38,0) —
    * cents² ≈ 3.6e15/row exceeds long headroom when summed). The
    * variance numerator n·Σx² − (Σx)² is computed EXACTLY in
    * DECIMAL(38,0) (≈3.8e27 at sf1, inside 38 digits) so the only
    * floats are the final casts and the t/dof formulas, mirrored
    * token-for-token. Fully partial-aggregable; the pivot runs over a
    * 2-row aggregate.
    */
  val statsWelchT: Q = Q(
    "stats_welch_t",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |arm AS (
      |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(cents) AS BIGINT) AS s1,
      |         CAST(sum(CAST(cents * cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      |  FROM o GROUP BY 1),
      |w AS (
      |  SELECT max(CASE WHEN seg = 'BUILDING' THEN n END) AS n0,
      |         max(CASE WHEN seg = 'BUILDING' THEN s1 END) AS s10,
      |         max(CASE WHEN seg = 'BUILDING' THEN s2 END) AS s20,
      |         max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n1,
      |         max(CASE WHEN seg = 'MACHINERY' THEN s1 END) AS s11,
      |         max(CASE WHEN seg = 'MACHINERY' THEN s2 END) AS s21
      |  FROM arm),
      |v AS (
      |  SELECT n0, n1,
      |    CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
      |    CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |    CAST(CAST(n0 AS DECIMAL(38,0)) * s20
      |         - CAST(s10 AS DECIMAL(38,0)) * CAST(s10 AS DECIMAL(38,0))
      |         AS DOUBLE)
      |      / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)) AS v0,
      |    CAST(CAST(n1 AS DECIMAL(38,0)) * s21
      |         - CAST(s11 AS DECIMAL(38,0)) * CAST(s11 AS DECIMAL(38,0))
      |         AS DOUBLE)
      |      / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS v1
      |  FROM w)
      |SELECT n0, n1, round(m0 / 100.0, 6) AS mean0, round(m1 / 100.0, 6) AS mean1,
      |  round((m0 - m1) / sqrt(v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)), 6) AS t,
      |  round((v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE))
      |        * (v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE))
      |        / ((v0 / CAST(n0 AS DOUBLE)) * (v0 / CAST(n0 AS DOUBLE))
      |             / CAST(n0 - 1 AS DOUBLE)
      |           + (v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
      |             / CAST(n1 - 1 AS DOUBLE)), 6) AS dof_welch
      |FROM v""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .filter(col("seg").isin("BUILDING", "MACHINERY"))
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val arm = o.groupBy(col("seg")).agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("s1"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).cast("decimal(38,0)").as("s2"))
    val w = arm.agg(
      max(when(col("seg") === "BUILDING", col("n"))).as("n0"),
      max(when(col("seg") === "BUILDING", col("s1"))).as("s10"),
      max(when(col("seg") === "BUILDING", col("s2"))).as("s20"),
      max(when(col("seg") === "MACHINERY", col("n"))).as("n1"),
      max(when(col("seg") === "MACHINERY", col("s1"))).as("s11"),
      max(when(col("seg") === "MACHINERY", col("s2"))).as("s21"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val v = w.select(col("n0"), col("n1"),
      (dbl(col("s10")) / dbl(col("n0"))).as("m0"),
      (dbl(col("s11")) / dbl(col("n1"))).as("m1"),
      ((col("n0").cast("decimal(38,0)") * col("s20")
        - col("s10").cast("decimal(38,0)") * col("s10").cast("decimal(38,0)")).cast("double")
        / (dbl(col("n0")) * dbl(col("n0") - 1))).as("v0"),
      ((col("n1").cast("decimal(38,0)") * col("s21")
        - col("s11").cast("decimal(38,0)") * col("s11").cast("decimal(38,0)")).cast("double")
        / (dbl(col("n1")) * dbl(col("n1") - 1))).as("v1"))
    val se0 = col("v0") / dbl(col("n0"))
    val se1 = col("v1") / dbl(col("n1"))
    v.select(col("n0"), col("n1"),
      round(col("m0") / lit(100.0), 6).as("mean0"),
      round(col("m1") / lit(100.0), 6).as("mean1"),
      round((col("m0") - col("m1")) / sqrt(se0 + se1), 6).as("t"),
      round((se0 + se1) * (se0 + se1)
        / (se0 * se0 / dbl(col("n0") - 1) + se1 * se1 / dbl(col("n1") - 1)), 6)
        .as("dof_welch"))
  }

  /** Winsorized order-value statistics per market segment: clamp at the
    * p05/p95 percentile_disc cutpoints, then compare raw vs winsorized
    * means — the outlier-robust preprocessing gate every metrics
    * pipeline applies before averaging. percentile_disc returns an
    * ACTUAL cents value (SQL-standard smallest-value-with-cume≥q on
    * both engines), so cutpoints are exact integers and every clamp
    * decision is an integer comparison — no interpolated-float
    * threshold to round around. Scale: cutpoints are a |segments|-row
    * aggregate broadcast back (rfm idiom); all sums exact BIGINT cents;
    * one division per mean.
    */
  val winsorizeStats: Q = Q(
    "winsorize_stats",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |cuts AS (
      |  SELECT seg,
      |         CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS lo,
      |         CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS hi
      |  FROM o GROUP BY 1),
      |cl AS (
      |  SELECT o.seg, lo, hi, cents,
      |         CASE WHEN cents < lo THEN lo
      |              WHEN cents > hi THEN hi ELSE cents END AS wcents
      |  FROM o JOIN cuts ON o.seg = cuts.seg)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n, lo, hi,
      |       CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |       CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |       round(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
      |             / (CAST(count(*) AS DOUBLE) * 100.0), 6) AS mean_raw,
      |       round(CAST(CAST(sum(wcents) AS BIGINT) AS DOUBLE)
      |             / (CAST(count(*) AS DOUBLE) * 100.0), 6) AS mean_wins
      |FROM cl GROUP BY seg, lo, hi ORDER BY seg NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val cuts = o.groupBy(col("seg")).agg(
      expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("lo"),
      expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS BIGINT)").as("hi"))
    val cl = o.join(broadcast(cuts), "seg")
      .withColumn("wcents",
        when(col("cents") < col("lo"), col("lo"))
          .when(col("cents") > col("hi"), col("hi"))
          .otherwise(col("cents")))
    cl.groupBy(col("seg"), col("lo"), col("hi"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo"), lit(1)).otherwise(lit(0))).cast("long").as("n_lo"),
        sum(when(col("cents") > col("hi"), lit(1)).otherwise(lit(0))).cast("long").as("n_hi"),
        round(sum(col("cents")).cast("long").cast("double")
          / (count(lit(1)).cast("double") * lit(100.0)), 6).as("mean_raw"),
        round(sum(col("wcents")).cast("long").cast("double")
          / (count(lit(1)).cast("double") * lit(100.0)), 6).as("mean_wins"))
      .select(col("seg"), col("n"), col("lo"), col("hi"), col("n_lo"), col("n_hi"),
        col("mean_raw"), col("mean_wins"))
      .orderBy(col("seg").asc_nulls_first)
  }

  /** Triangle counting + degree on the nation trade graph — local
    * clustering structure beyond dedup_cluster's components and
    * graph_pagerank's centrality. Undirected edges keep unordered
    * nation pairs whose trade volume exceeds the mean pair volume; the
    * threshold is the INTEGER comparison pw·n_pairs > total (scale-free
    * and float-free, the tpch_q22 2×-mean trick at 1×). Triangles come
    * from the classic a<b<c three-way self-join — the edge table is
    * bounded by |nations|² at any corpus scale, so the cubic join is a
    * constant; the corpus-scale work is the fully-distributed 4-join
    * edge derivation (graph_pagerank's shape).
    */
  val graphTriangles: Q = Q(
    "graph_triangles",
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
      |tri AS (
      |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS degree FROM (
      |    SELECT a AS n FROM e UNION ALL SELECT b FROM e) u GROUP BY 1),
      |tcnt AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS triangles FROM (
      |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri) u GROUP BY 1)
      |SELECT deg.n AS nation, degree,
      |       CAST(coalesce(triangles, 0) AS BIGINT) AS triangles
      |FROM deg LEFT JOIN tcnt ON deg.n = tcnt.n
      |ORDER BY nation NULLS FIRST""".stripMargin
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
    val e1 = e.select(col("a").as("t_a"), col("b").as("t_b"))
    val e2 = e.select(col("a").as("u_a"), col("b").as("u_b"))
    val e3 = e.select(col("a").as("v_a"), col("b").as("v_b"))
    val tri = e1.join(e2, col("t_b") === col("u_a"))
      .join(e3, col("v_a") === col("t_a") && col("v_b") === col("u_b"))
      .select(col("t_a").as("a"), col("t_b").as("b"), col("u_b").as("c"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val tcnt = tri.select(col("a").as("n"))
      .unionAll(tri.select(col("b").as("n")))
      .unionAll(tri.select(col("c").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(tcnt, Seq("n"), "left")
      .select(col("n").as("nation"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .orderBy(col("nation").asc_nulls_first)
  }

  /** Rolling median of hourly event counts per event type (trailing
    * 6-bucket ROWS frame) — the robust smoother the telemetry domain
    * pairs with ts_ema's linear kernel: a median survives a single
    * corrupted bucket that drags any mean. Neither engine allows its
    * median aggregate with an explicit frame (Spark:
    * INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame is
    * collected with collect_list↔list and the midpoint computed
    * explicitly — identical integer element picks and one exact
    * half-sum on even frames, deterministic cross-engine. Scale: the
    * window runs per-series over the HOURLY AGGREGATE
    * (calendar-bounded rows per series, frame ≤ 6 elements), never the
    * event stream.
    */
  val windowRollingMedian: Q = Q(
    "window_rolling_median",
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |fr AS (
      |  SELECT event_type, hr, n,
      |         list_sort(list(n) OVER (PARTITION BY event_type ORDER BY hr
      |                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)) AS arr
      |  FROM h)
      |SELECT event_type, hr, n,
      |  CASE WHEN len(arr) % 2 = 1
      |       THEN CAST(arr[(len(arr) + 1) // 2] AS DOUBLE)
      |       ELSE (CAST(arr[len(arr) // 2] AS DOUBLE)
      |             + CAST(arr[len(arr) // 2 + 1] AS DOUBLE)) / 2.0 END AS med
      |FROM fr ORDER BY event_type NULLS FIRST, hr NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val h = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-5, Window.currentRow)
    val k = size(col("arr"))
    h.withColumn("arr", array_sort(collect_list(col("n")).over(w)))
      .withColumn("med",
        when(k % 2 === 1,
          element_at(col("arr"), ((k + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at(col("arr"), (k / 2).cast("int")).cast("double")
            + element_at(col("arr"), (k / 2 + 1).cast("int")).cast("double")) / lit(2.0)))
      .select(col("event_type"), col("hr"), col("n"), col("med"))
      .orderBy(col("event_type").asc_nulls_first, col("hr").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(statsChi2, statsWelchT, winsorizeStats, graphTriangles,
    windowRollingMedian)
}
