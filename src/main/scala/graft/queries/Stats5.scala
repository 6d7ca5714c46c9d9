package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 second wave: Poisson rate comparison, conditional entropy,
  * local-maximum peak detection, and the FORWARD as-of join — event-
  * stream inference and sequencing operators rounding out the r9
  * hypothesis-test surface (stats_poisson_rate is the count-process
  * companion to ab_test_z's proportions; stats_cond_entropy decomposes
  * mutual information; ts_peak_detect localizes bursts the way
  * ts_changepoint_mean localizes level shifts; join_asof_forward is
  * the time-to-NEXT-event twin of join_asof's last-event-before).
  *
  * Determinism: counts are exact integers; every float is a final
  * mirrored formula (exact-input IEEE divisions, ln over exact
  * ratios, bounded ≤25-term sums under the chi2 6-dp headroom);
  * derived entropies subtract ALREADY-ROUNDED values (cramers_v
  * device); timestamps compare/subtract in exact epoch-micros.
  */
object Stats5 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Two-sample Poisson rate test between the 'error' and 'click'
    * event streams over the SHARED observation window (whole-corpus
    * day span, so exposure cancels): rate per day for each, the rate
    * ratio, and the unconditional z = (n1−n2)/√(n1+n2) — "is the
    * error rate genuinely above the click rate?". Scale: one
    * partial-aggregable pass; the test runs on a 1-row aggregate.
    */
  val statsPoissonRate: Q = Q(
    "stats_poisson_rate",
    """WITH b AS (
      |  SELECT CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |         CAST(epoch_us(date_trunc('day', max(ts))) // 86400000000
      |              - epoch_us(date_trunc('day', min(ts))) // 86400000000 + 1 AS BIGINT)
      |           AS days
      |  FROM events)
      |SELECT n1, n2, days,
      |       round(CAST(n1 AS DOUBLE) / CAST(days AS DOUBLE), 6) AS rate1,
      |       round(CAST(n2 AS DOUBLE) / CAST(days AS DOUBLE), 6) AS rate2,
      |       round(CAST(n1 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_ratio,
      |       round((CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
      |             / sqrt(CAST(n1 + n2 AS DOUBLE)), 6) AS z
      |FROM b""".stripMargin
  ) { (s, d) =>
    val b = T.events(s, d).agg(
      sum(when(col("event_type") === "error", 1).otherwise(0)).cast("long").as("n1"),
      sum(when(col("event_type") === "click", 1).otherwise(0)).cast("long").as("n2"),
      (expr("unix_micros(date_trunc('day', max(ts))) div 86400000000")
        - expr("unix_micros(date_trunc('day', min(ts))) div 86400000000") + 1)
        .cast("long").as("days"))
    b.select(col("n1"), col("n2"), col("days"),
      round(dbl(col("n1")) / dbl(col("days")), 6).as("rate1"),
      round(dbl(col("n2")) / dbl(col("days")), 6).as("rate2"),
      round(dbl(col("n1")) / dbl(col("n2")), 6).as("rate_ratio"),
      round((dbl(col("n1")) - dbl(col("n2"))) / sqrt(dbl(col("n1") + col("n2"))), 6)
        .as("z"))
  }

  /** Entropy decomposition of order priority given market segment:
    * H(pri), the conditional H(pri|seg), and their difference — the
    * mutual information in nats, read as "how much does knowing the
    * segment tell you about the priority?". All probabilities are
    * exact count ratios over the bounded 5×5 cell table; one ln per
    * term; mi_nats subtracts the ALREADY-ROUNDED entropies. Scale:
    * counts partial-aggregable; entropies run on ≤25-row aggregates.
    */
  val statsCondEntropy: Q = Q(
    "stats_cond_entropy",
    """WITH j AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
      |xy AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS nxy FROM j GROUP BY 1, 2),
      |x AS (SELECT seg, CAST(count(*) AS BIGINT) AS nx FROM j GROUP BY 1),
      |y AS (SELECT pri, CAST(count(*) AS BIGINT) AS ny FROM j GROUP BY 1),
      |hy AS (
      |  SELECT n, round(-sum((CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
      |                       * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS h_y
      |  FROM y CROSS JOIN tot GROUP BY n),
      |hyx AS (
      |  SELECT round(-sum((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
      |                    * ln(CAST(nxy AS DOUBLE) / CAST(nx AS DOUBLE))), 6)
      |           AS h_y_given_x
      |  FROM xy JOIN x USING (seg) CROSS JOIN tot)
      |SELECT n, h_y, h_y_given_x, round(h_y - h_y_given_x, 6) AS mi_nats
      |FROM hy CROSS JOIN hyx""".stripMargin
  ) { (s, d) =>
    val j = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderpriority").as("pri")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("pri"))
    val tot = j.agg(count(lit(1)).as("n"))
    val xy = j.groupBy(col("seg"), col("pri")).agg(count(lit(1)).as("nxy"))
    val x = j.groupBy(col("seg")).agg(count(lit(1)).as("nx"))
    val y = j.groupBy(col("pri")).agg(count(lit(1)).as("ny"))
    val hy = y.crossJoin(broadcast(tot)).groupBy(col("n"))
      .agg(round(-sum((dbl(col("ny")) / dbl(col("n")))
        * log(dbl(col("ny")) / dbl(col("n")))), 6).as("h_y"))
    val hyx = xy.join(broadcast(x), "seg").crossJoin(broadcast(tot))
      .agg(round(-sum((dbl(col("nxy")) / dbl(col("n")))
        * log(dbl(col("nxy")) / dbl(col("nx")))), 6).as("h_y_given_x"))
    hy.crossJoin(broadcast(hyx))
      .select(col("n"), col("h_y"), col("h_y_given_x"),
        round(col("h_y") - col("h_y_given_x"), 6).as("mi_nats"))
  }

  /** Burst detection on the hourly event-count series: strict local
    * maxima (n above BOTH neighbors) that also exceed the per-series
    * median — every comparison is between exact integers (the median
    * is percentile_disc, an actual count), so peak membership is
    * float-free. Scale: the lag/lead window runs per-series over the
    * CALENDAR-BOUNDED hourly aggregate; medians are a |event_types|-
    * row broadcast.
    */
  val tsPeakDetect: Q = Q(
    "ts_peak_detect",
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type,
      |         CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT) AS med
      |  FROM h GROUP BY 1),
      |w AS (
      |  SELECT event_type, hr, n,
      |         lag(n) OVER (PARTITION BY event_type ORDER BY hr) AS pn,
      |         lead(n) OVER (PARTITION BY event_type ORDER BY hr) AS nn
      |  FROM h)
      |SELECT w.event_type AS event_type, hr, n, med
      |FROM w JOIN med ON w.event_type = med.event_type
      |WHERE pn IS NOT NULL AND nn IS NOT NULL AND n > pn AND n > nn AND n > med
      |ORDER BY w.event_type NULLS FIRST, hr NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val h = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val med = h.groupBy(col("event_type")).agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT)").as("med"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val wd = h.withColumn("pn", lag(col("n"), 1).over(w))
      .withColumn("nn", lead(col("n"), 1).over(w))
    wd.join(broadcast(med), "event_type")
      .filter(col("pn").isNotNull && col("nn").isNotNull
        && col("n") > col("pn") && col("n") > col("nn") && col("n") > col("med"))
      .select(col("event_type"), col("hr"), col("n"), col("med"))
      .orderBy(col("event_type").asc_nulls_first, col("hr").asc_nulls_first)
  }

  /** FORWARD as-of join: for every 'view' event, the next 'purchase'
    * by the same user at-or-after it, plus the exact micros-to-convert
    * — the time-to-conversion operator (join_asof is the mirror-image
    * last-event-BEFORE). Same scale-sound shape as join_asof: one
    * union-tagged window per user with first_value IGNORE NULLS over
    * the FOLLOWING frame — no range self-join, no per-anchor probe.
    * Anchors sort before same-timestamp purchases (is_view DESC), so
    * a simultaneous purchase counts as converted at 0 µs.
    */
  val joinAsofForward: Q = Q(
    "join_asof_forward",
    """WITH ce AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
      |         CASE WHEN event_type = 'purchase' THEN ts END AS purchase_ts,
      |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |w AS (
      |  SELECT event_id, user_id, ts, is_view,
      |         first_value(purchase_id IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY ts, is_view DESC, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_id,
      |         first_value(purchase_ts IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY ts, is_view DESC, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
      |  FROM ce)
      |SELECT event_id, user_id, next_purchase_id,
      |       epoch_us(next_purchase_ts) - epoch_us(ts) AS us_to_purchase
      |FROM w WHERE is_view = 1
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val ce = T.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("event_id")).as("purchase_id"),
        when(col("event_type") === "purchase", col("ts")).as("purchase_ts"),
        when(col("event_type") === "view", 1).otherwise(0).as("is_view"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_view").desc, col("event_id").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ce.withColumn("next_purchase_id", first(col("purchase_id"), ignoreNulls = true).over(w))
      .withColumn("next_purchase_ts", first(col("purchase_ts"), ignoreNulls = true).over(w))
      .filter(col("is_view") === 1)
      .select(col("event_id"), col("user_id"), col("next_purchase_id"),
        (unix_micros(col("next_purchase_ts")) - unix_micros(col("ts")))
          .as("us_to_purchase"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(statsPoissonRate, statsCondEntropy, tsPeakDetect,
    joinAsofForward)
}
