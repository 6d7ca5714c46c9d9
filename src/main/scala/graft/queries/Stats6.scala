package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 eleventh wave: Wald–Wolfowitz runs test (randomness),
  * maximum cumulative deficit (drawdown vs the mean rate), and trade
  * reciprocity — closing the inference/structure gaps around "is the
  * series random?", "what was the worst sustained slump?", and "is
  * trade mutual or one-way?".
  */
object Stats6 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Wald–Wolfowitz runs test on the signs of day-over-day changes of
    * the daily event count: too FEW runs means trending, too MANY
    * means oscillation — the nonparametric "is it random?" gate that
    * needs no distribution at all. Zero deltas are excluded (standard
    * practice); the runs count compares each sign to its predecessor
    * in the FILTERED sequence. R, n⁺, n⁻ are exact integers; E[R] and
    * Var[R] are the classical formulas token-mirrored; one rounded z.
    * Scale: both windows run over the CALENDAR-BOUNDED daily
    * aggregate.
    */
  val statsRunsTest: Q = Q(
    "stats_runs_test",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |dl AS (
      |  SELECT dx, y - lag(y) OVER (ORDER BY dx) AS delta
      |  FROM dly),
      |sg AS (
      |  SELECT dx, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS s
      |  FROM dl WHERE delta IS NOT NULL AND delta <> 0),
      |runs AS (
      |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY dx) IS NULL
      |                   OR lag(s) OVER (ORDER BY dx) <> s THEN 1 ELSE 0 END AS brk
      |  FROM sg),
      |agg AS (
      |  SELECT CAST(sum(brk) AS BIGINT) AS r,
      |         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM runs),
      |fin AS (
      |  SELECT r, n1, n2,
      |         2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |           / CAST(n1 + n2 AS DOUBLE) + 1.0 AS er,
      |         (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |            * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |               - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
      |           / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
      |              * CAST(n1 + n2 - 1 AS DOUBLE)) AS vr
      |  FROM agg)
      |SELECT r, n1, n2, round(er, 6) AS expected_runs,
      |       round((CAST(r AS DOUBLE) - er) / sqrt(vr), 6) AS z
      |FROM fin""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(count(lit(1)).as("y"))
    val ow = Window.orderBy(col("dx"))
    val sg = dly.withColumn("delta", col("y") - lag(col("y"), 1).over(ow))
      .filter(col("delta").isNotNull && col("delta") =!= 0)
      .select(col("dx"), when(col("delta") > 0, 1).otherwise(-1).as("s"))
    val runs = sg.withColumn("ls", lag(col("s"), 1).over(Window.orderBy(col("dx"))))
      .select(col("s"), when(col("ls").isNull || col("ls") =!= col("s"), 1)
        .otherwise(0).as("brk"))
    val agg = runs.agg(
      sum(col("brk")).cast("long").as("r"),
      sum(when(col("s") === 1, 1).otherwise(0)).cast("long").as("n1"),
      sum(when(col("s") === -1, 1).otherwise(0)).cast("long").as("n2"))
    val er = lit(2.0) * dbl(col("n1")) * dbl(col("n2")) / dbl(col("n1") + col("n2")) + lit(1.0)
    val vr = (lit(2.0) * dbl(col("n1")) * dbl(col("n2"))
      * (lit(2.0) * dbl(col("n1")) * dbl(col("n2")) - dbl(col("n1")) - dbl(col("n2"))))
      .divide(dbl(col("n1") + col("n2")) * dbl(col("n1") + col("n2"))
        * dbl(col("n1") + col("n2") - 1))
    agg.select(col("r"), col("n1"), col("n2"),
      round(er, 6).as("expected_runs"),
      round((dbl(col("r")) - er) / sqrt(vr), 6).as("z"))
  }

  /** Maximum cumulative deficit vs the mean rate: over the daily
    * series, the deepest sustained below-average stretch — drawdown
    * semantics on the mean-detrended cumulative (a raw count cumsum
    * only goes up, so classic drawdown is always 0; detrending makes
    * "worst slump" well-defined). EVERYTHING is exact integer
    * arithmetic: the detrended cumulative is SCALED by N
    * (c'_t = N·Σy_prefix − t·S — no division), the running peak and
    * the deficit are integer window max/difference, and the argmax
    * orders by (deficit DESC, day ASC) — a total order. Only the
    * final normalization (deficit / S·N, the fraction of total volume)
    * is a rounded double. Scale: windows over the CALENDAR-BOUNDED
    * daily aggregate; magnitudes < 2⁵³ through sf10 (N ≤ 4000 days,
    * S ≤ 3e8 events ⇒ N·S ≤ 1.2e12).
    */
  val tsMaxDeficit: Q = Q(
    "ts_max_deficit",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS s
      |        FROM dly),
      |cum AS (
      |  SELECT dx,
      |         CAST(row_number() OVER (ORDER BY dx) AS BIGINT) AS i,
      |         CAST(sum(y) OVER (ORDER BY dx
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
      |  FROM dly),
      |det AS (
      |  SELECT dx, nn * cy - i * s AS c
      |  FROM cum CROSS JOIN tot),
      |dd AS (
      |  SELECT dx,
      |         max(c) OVER (ORDER BY dx
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS deficit
      |  FROM det)
      |SELECT dx AS trough_day, deficit AS deficit_scaled,
      |       round(CAST(deficit AS DOUBLE)
      |             / (CAST(s AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS deficit_frac
      |FROM dd CROSS JOIN tot
      |ORDER BY deficit DESC, trough_day ASC LIMIT 1""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(count(lit(1)).as("y"))
    val tot = dly.agg(count(lit(1)).as("nn"), sum(col("y")).cast("long").as("s"))
    val ow = Window.orderBy(col("dx"))
    val cum = dly.select(col("dx"),
      row_number().over(ow).cast("long").as("i"),
      sum(col("y")).over(ow.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long").as("cy"))
    val det = cum.crossJoin(broadcast(tot))
      .select(col("dx"), col("nn"), col("s"),
        (col("nn") * col("cy") - col("i") * col("s")).as("c"))
    val dd = det.withColumn("deficit",
      max(col("c")).over(Window.orderBy(col("dx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("c"))
    dd.select(col("dx").as("trough_day"), col("deficit").as("deficit_scaled"),
      round(dbl(col("deficit")) / (dbl(col("s")) * dbl(col("nn"))), 6).as("deficit_frac"))
      .orderBy(col("deficit_scaled").desc, col("trough_day").asc)
      .limit(1)
  }

  /** Trade reciprocity: the share of above-mean DIRECTED trade edges
    * whose reverse edge is also above-mean — mutual vs one-way trade
    * (graph_assortativity asks who connects; this asks whether it
    * flows both ways). Directed threshold is the integer cross-multiply
    * (w·n_edges > total); reciprocity is one self-equi-join on the
    * |nations|²-bounded directed edge list; corpus-scale work is the
    * distributed 4-join edge derivation.
    */
  val graphReciprocity: Q = Q(
    "graph_reciprocity",
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
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS ne, CAST(sum(w) AS BIGINT) AS tw
      |        FROM de),
      |e AS (SELECT src, dst FROM de CROSS JOIN tot WHERE w * ne > tw),
      |r AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_recip
      |  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
      |ne2 AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
      |SELECT n_edges, n_recip,
      |       round(CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE), 6) AS reciprocity
      |FROM ne2 CROSS JOIN r""".stripMargin
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
    val tot = de.agg(count(lit(1)).as("ne"), sum(col("w")).cast("long").as("tw"))
    val e = de.crossJoin(broadcast(tot))
      .filter(col("w") * col("ne") > col("tw"))
      .select(col("src"), col("dst"))
    val b = e.select(col("src").as("bs"), col("dst").as("bd"))
    val r = e.join(broadcast(b), col("src") === col("bd") && col("dst") === col("bs"))
      .agg(count(lit(1)).as("n_recip"))
    val ne2 = e.agg(count(lit(1)).as("n_edges"))
    ne2.crossJoin(broadcast(r))
      .select(col("n_edges"), col("n_recip"),
        round(dbl(col("n_recip")) / dbl(col("n_edges")), 6).as("reciprocity"))
  }

  val all: Seq[Q] = Seq(statsRunsTest, tsMaxDeficit, graphReciprocity)
}
