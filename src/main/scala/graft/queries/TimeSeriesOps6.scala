package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 twelfth wave: Kleinberg-style two-state burst
  * detection — the principled "when was the stream IN A BURST"
  * labeler (ts_peak_detect finds point maxima; ts_bollinger adaptive
  * thresholds; the burst automaton labels sustained EPISODES with
  * hysteresis from an explicit cost model).
  */
object TimeSeriesOps6 {

  /** Two-state (base/burst) minimum-cost state assignment over the
    * zero-gapfilled hourly series — Kleinberg's burst automaton with
    * ONLINE (filtered) semantics: Poisson negative-log-likelihood
    * costs per hour under rates μ₀ = corpus mean and μ₁ = 3μ₀ (the
    * ln(y!) term cancels between states and is dropped), a fixed
    * entry penalty γ = 5 for base→burst, free exit; hour t is labeled
    * burst when the running burst-path cost undercuts the base-path
    * cost. The DP is a GENUINE sequential recursion (the ts_holt
    * class): Spark folds the CALENDAR-BOUNDED series with the
    * `aggregate` HOF carrying (c0, c1, labels); the oracle runs the
    * SAME recursion as a recursive CTE emitting one state row per
    * hour. Determinism: μ₀/μ₁ are exact-input ratios (identical
    * doubles cross-engine), and the two ln() outputs — the ONLY
    * transcendentals — are rounded to 9 dp before entering the DP, so
    * a last-ulp libm divergence cannot flip a label; everything after
    * is identical IEEE arithmetic in identical order. Output: burst
    * EPISODES (start/end hour, length, exact event volume) via
    * gaps-islands over the labeled spine.
    */
  val tsBurstDetect: Q = Q(
    "ts_burst_detect",
    """WITH RECURSIVE hr AS (
      |  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hx,
      |         CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |bounds AS (SELECT min(hx) AS lo, max(hx) AS hi FROM hr),
      |spine AS (
      |  SELECT CAST(u.hx AS BIGINT) AS hx
      |  FROM bounds, unnest(generate_series(lo, hi)) AS u(hx)),
      |dense AS (
      |  SELECT s.hx, coalesce(hr.y, 0) AS y,
      |         row_number() OVER (ORDER BY s.hx) AS i
      |  FROM spine s LEFT JOIN hr ON s.hx = hr.hx),
      |mu AS (
      |  SELECT CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu0,
      |         3.0 * CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu1,
      |         round(ln(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 9) AS l0,
      |         round(ln(3.0 * CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 9) AS l1
      |  FROM dense),
      |r AS (
      |  SELECT CAST(1 AS BIGINT) AS i,
      |         (SELECT mu0 - CAST(y AS DOUBLE) * l0 FROM dense, mu WHERE i = 1) AS c0,
      |         (SELECT 5.0 + mu1 - CAST(y AS DOUBLE) * l1 FROM dense, mu WHERE i = 1) AS c1
      |  UNION ALL
      |  SELECT r.i + 1,
      |         least(r.c0, r.c1) + (mu.mu0 - CAST(d.y AS DOUBLE) * mu.l0),
      |         least(r.c1, r.c0 + 5.0) + (mu.mu1 - CAST(d.y AS DOUBLE) * mu.l1)
      |  FROM r JOIN dense d ON d.i = r.i + 1 CROSS JOIN mu),
      |lbl AS (
      |  SELECT d.hx, d.y, CASE WHEN r.c1 < r.c0 THEN 1 ELSE 0 END AS b
      |  FROM r JOIN dense d ON d.i = r.i),
      |burst AS (
      |  SELECT hx, y, hx - row_number() OVER (ORDER BY hx) AS isle
      |  FROM lbl WHERE b = 1)
      |SELECT CAST(min(hx) * 3600000000 AS BIGINT) AS start_us,
      |       CAST(max(hx) * 3600000000 AS BIGINT) AS end_us,
      |       CAST(count(*) AS BIGINT) AS n_hours,
      |       CAST(sum(y) AS BIGINT) AS n_events,
      |       CAST(max(y) AS BIGINT) AS peak
      |FROM burst GROUP BY isle
      |ORDER BY start_us""".stripMargin
  ) { (s, d) =>
    val hr = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("hx"))
      .agg(count(lit(1)).as("y"))
    val bounds = hr.agg(min(col("hx")).as("lo"), max(col("hx")).as("hi"))
    val spine = bounds.select(col("lo"), explode(sequence(col("lo"), col("hi"))).as("hx"))
    val dense = spine.join(hr, Seq("hx"), "left")
      .select(col("lo"), col("hx"), coalesce(col("y"), lit(0L)).as("y"))
    // one row: lo + the ordered count array + the quantized cost constants
    val packed = dense
      .agg(min(col("lo")).as("lo"),
        expr("transform(array_sort(collect_list(struct(hx, y))), e -> CAST(e.y AS DOUBLE))")
          .as("ys"),
        (sum(col("y")).cast("double") / count(lit(1)).cast("double")).as("mu0"),
        (lit(3.0) * sum(col("y")).cast("double") / count(lit(1)).cast("double")).as("mu1"),
        round(log(sum(col("y")).cast("double") / count(lit(1)).cast("double")), 9).as("l0"),
        round(log(lit(3.0) * sum(col("y")).cast("double")
          / count(lit(1)).cast("double")), 9).as("l1"))
    // sequential DP via the aggregate HOF (ts_holt device): state =
    // (c0, c1, labels); labels accumulate one int per hour
    val labeled = packed
      .filter(size(col("ys")) > 0) // empty-corpus survival: slice(ys, 2, -1) throws
      .select(col("lo"), col("ys"), expr(
      """aggregate(
        |  slice(ys, 2, greatest(size(ys) - 1, 0)),
        |  named_struct(
        |    'c0', mu0 - get(ys, 0) * l0,
        |    'c1', 5.0D + mu1 - get(ys, 0) * l1,
        |    'lbl', array(CASE WHEN (5.0D + mu1 - get(ys, 0) * l1) < (mu0 - get(ys, 0) * l0)
        |                      THEN 1 ELSE 0 END)),
        |  (acc, y) -> named_struct(
        |    'c0', least(acc.c0, acc.c1) + (mu0 - y * l0),
        |    'c1', least(acc.c1, acc.c0 + 5.0D) + (mu1 - y * l1),
        |    'lbl', concat(acc.lbl, array(
        |      CASE WHEN (least(acc.c1, acc.c0 + 5.0D) + (mu1 - y * l1))
        |                 < (least(acc.c0, acc.c1) + (mu0 - y * l0))
        |           THEN 1 ELSE 0 END)))) AS st""".stripMargin).as("st"))
    val perHour = labeled.select(col("lo"), col("ys"),
        posexplode(col("st.lbl")).as(Seq("pos", "b")))
      .select((col("lo") + col("pos")).as("hx"),
        expr("CAST(element_at(ys, CAST(pos AS INT) + 1) AS BIGINT)").as("y"),
        col("b"))
    import org.apache.spark.sql.expressions.Window
    val burst = perHour.filter(col("b") === 1)
      .withColumn("isle", col("hx") - row_number().over(Window.orderBy(col("hx"))))
    burst.groupBy(col("isle"))
      .agg((min(col("hx")) * 3600000000L).cast("long").as("start_us"),
        (max(col("hx")) * 3600000000L).cast("long").as("end_us"),
        count(lit(1)).cast("long").as("n_hours"),
        sum(col("y")).cast("long").as("n_events"),
        max(col("y")).cast("long").as("peak"))
      .drop("isle")
      .select(col("start_us"), col("end_us"), col("n_hours"), col("n_events"), col("peak"))
      .orderBy(col("start_us"))
  }

  def all: Seq[Q] = Seq(tsBurstDetect)
}
