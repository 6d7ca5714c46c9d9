package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Customer-segmentation and behavioral-statistics wave (SURVEY.md §2A):
  * RFM quintile scoring, market-basket brand pairs, per-segment Gini
  * concentration, a Benford first-digit audit, rolling cross-series
  * correlation, interval peak-concurrency, Zipf rank-frequency slope,
  * and a Markov transition matrix over user event streams.
  *
  * Scale discipline (the dq_outlier_iqr / dq_drift_psi precedents):
  * global statistics are 1-row aggregates broadcast back into the scan,
  * never unpartitioned windows over row-level frames; rankings are
  * per-group windows whose partition key is either high-cardinality
  * (user_id, lang vocab) or a bounded aggregate (per-minute grid,
  * 25-cell transition matrix). Float discipline (D-rules): money goes
  * through DECIMAL(18,2) → exact integer cents; every cross-engine
  * float output is round(…, 6) with exact-integer numerators where
  * possible.
  */
object SegmentOps {

  /** RFM segmentation: per-customer recency / frequency / monetary,
    * scored 1-5 against exact interpolated quintile cutpoints. The
    * cutpoints are a 1-row aggregate broadcast back onto the customer
    * frame (the dq_outlier_iqr fence idiom) — NOT `ntile(5)` over an
    * unpartitioned window, which would funnel every customer through
    * one task; at 100 TB the customer frame shuffles once on custkey
    * and the scoring join is map-side. Cutpoints are rounded to 6 dp on
    * both sides so the strict `>` comparisons against exact integer
    * metrics (days, counts, cents) cannot flip on 1-ulp interpolation
    * differences. Ties land in the LOWER bucket on both engines (strict
    * greater-than), unlike ntile which splits ties arbitrarily.
    */
  val rfmSegment: Q = Q(
    "rfm_segment",
    """WITH cust AS (
      |  SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS last_day,
      |         CAST(count(*) AS BIGINT) AS freq,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |anchor AS (SELECT max(last_day) AS a FROM cust),
      |cust2 AS (
      |  SELECT o_custkey, date_diff('day', last_day, a) AS rec, freq, cents
      |  FROM cust CROSS JOIN anchor),
      |cuts AS (
      |  SELECT round(quantile_cont(rec, 0.2), 6) AS r1, round(quantile_cont(rec, 0.4), 6) AS r2,
      |         round(quantile_cont(rec, 0.6), 6) AS r3, round(quantile_cont(rec, 0.8), 6) AS r4,
      |         round(quantile_cont(freq, 0.2), 6) AS f1, round(quantile_cont(freq, 0.4), 6) AS f2,
      |         round(quantile_cont(freq, 0.6), 6) AS f3, round(quantile_cont(freq, 0.8), 6) AS f4,
      |         round(quantile_cont(cents, 0.2), 6) AS m1, round(quantile_cont(cents, 0.4), 6) AS m2,
      |         round(quantile_cont(cents, 0.6), 6) AS m3, round(quantile_cont(cents, 0.8), 6) AS m4
      |  FROM cust2),
      |scored AS (
      |  SELECT 5 - (CASE WHEN rec > r1 THEN 1 ELSE 0 END + CASE WHEN rec > r2 THEN 1 ELSE 0 END
      |            + CASE WHEN rec > r3 THEN 1 ELSE 0 END + CASE WHEN rec > r4 THEN 1 ELSE 0 END) AS r_score,
      |         1 + (CASE WHEN freq > f1 THEN 1 ELSE 0 END + CASE WHEN freq > f2 THEN 1 ELSE 0 END
      |            + CASE WHEN freq > f3 THEN 1 ELSE 0 END + CASE WHEN freq > f4 THEN 1 ELSE 0 END) AS f_score,
      |         1 + (CASE WHEN cents > m1 THEN 1 ELSE 0 END + CASE WHEN cents > m2 THEN 1 ELSE 0 END
      |            + CASE WHEN cents > m3 THEN 1 ELSE 0 END + CASE WHEN cents > m4 THEN 1 ELSE 0 END) AS m_score,
      |         cents
      |  FROM cust2 CROSS JOIN cuts)
      |SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers,
      |       round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS monetary_total
      |FROM scored GROUP BY 1, 2, 3
      |ORDER BY r_score NULLS FIRST, f_score NULLS FIRST, m_score NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // localCheckpoint: cust feeds anchor, the cutpoint aggregate AND the
    // scoring pass — without it Catalyst re-derives the orders scan +
    // groupBy four times (measured: 8 scan nodes in the plan)
    val cust = T.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(to_date(max(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        (sum(T.dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      .localCheckpoint()
    val anchor = cust.agg(max(col("last_day")).as("a"))
    val cust2 = cust.crossJoin(broadcast(anchor))
      .select(col("o_custkey"), datediff(col("a"), col("last_day")).as("rec"),
        col("freq"), col("cents"))
    def cut(c: String, q: Double, as: String) =
      round(percentile(col(c), lit(q)), 6).as(as)
    val cuts = cust2.agg(
      cut("rec", 0.2, "r1"), cut("rec", 0.4, "r2"), cut("rec", 0.6, "r3"), cut("rec", 0.8, "r4"),
      cut("freq", 0.2, "f1"), cut("freq", 0.4, "f2"), cut("freq", 0.6, "f3"), cut("freq", 0.8, "f4"),
      cut("cents", 0.2, "m1"), cut("cents", 0.4, "m2"), cut("cents", 0.6, "m3"), cut("cents", 0.8, "m4"))
    def hits(v: String, cs: Seq[String]) =
      cs.map(c => when(col(v) > col(c), 1).otherwise(0)).reduce(_ + _)
    cust2.crossJoin(broadcast(cuts))
      .select(
        (lit(5) - hits("rec", Seq("r1", "r2", "r3", "r4"))).as("r_score"),
        (lit(1) + hits("freq", Seq("f1", "f2", "f3", "f4"))).as("f_score"),
        (lit(1) + hits("cents", Seq("m1", "m2", "m3", "m4"))).as("m_score"),
        col("cents"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("cents")).cast("double") / 100, 2).as("monetary_total"))
      .orderBy(col("r_score").asc_nulls_first, col("f_score").asc_nulls_first,
        col("m_score").asc_nulls_first)
  }

  /** Market-basket analysis: brand pairs that co-occur in the same
    * order, top 25 by order count. The oracle states it as the classic
    * self-join on the order key; the Spark plan instead aggregates each
    * order's brand set ONCE (collect_set partial-aggregates map-side)
    * and expands the ≤ C(7,2)=21 ordered pairs per order with an array
    * lambda — one lineitem scan and one orderkey shuffle where the
    * self-join form scans and shuffles everything twice. Linear in
    * orders at any scale because the per-order distinct brand set is
    * bounded by lines-per-order; the final pair rollup is a
    * partial-aggregable count into TakeOrderedAndProject.
    */
  val basketBrandPairs: Q = Q(
    "basket_brand_pairs",
    """WITH ob AS (
      |  SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM ob a JOIN ob b
      |  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, brand_a ASC, brand_b ASC LIMIT 25""".stripMargin
  ) { (s, d) =>
    val ob = T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      .join(T.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    // sort_array pins the collect_set accumulation order so the pair
    // expansion below is deterministic; i is 0-based, slice is 1-based,
    // so partners of element i start at position i+2
    ob.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
          |  transform(slice(bs, i + 2, size(bs)),
          |            y -> struct(x AS brand_a, y AS brand_b))))""".stripMargin))
        .as("pr"))
      .select(col("pr.brand_a").as("brand_a"), col("pr.brand_b").as("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("brand_a").asc, col("brand_b").asc)
      .limit(25)
  }

  /** Gini concentration of customer spend within each market segment —
    * the standard rank formula G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over
    * spend sorted ascending. Everything up to the final division is
    * EXACT integer cents (Σi·x stays < 2⁶³ until a segment exceeds
    * ~10⁶ customers averaging ~$10⁷ lifetime — document, don't round);
    * the Gini itself is one IEEE division of exact integers, rounded to
    * 6 dp. The ranking window partitions by segment: segment count is
    * bounded but segment SIZE is not, so at extreme scale the exact
    * rank needs the per-segment sort — the classic exact-Gini cost; a
    * binned approximation (dq_drift_psi's bucket idiom) is the
    * documented fallback when a single segment outgrows one task.
    */
  val giniSegment: Q = Q(
    "gini_segment",
    """WITH spend AS (
      |  SELECT c_mktsegment, c_custkey,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT c_mktsegment, cents,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY cents ASC, c_custkey ASC) AS i
      |  FROM spend WHERE cents IS NOT NULL)
      |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
      |       round(CAST(2 * sum(CAST(i AS DECIMAL(38,0)) * cents)
      |                  - (count(*) + 1) * CAST(sum(cents) AS DECIMAL(38,0)) AS DOUBLE)
      |             / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)), 6) AS gini
      |FROM r GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val spend = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg((sum(T.dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents").asc, col("c_custkey").asc)
    // s1 = Σ i·cents summed in DECIMAL(38,0) on BOTH engines (the
    // supplier_herfindahl pattern): a long sum would wrap silently in
    // Spark while DuckDB promotes to HUGEINT — divergent failure modes.
    // cents IS NULL (a customer whose every order price is unknown) is
    // EXCLUDED before ranking, pinned identically in the oracle: the
    // engines disagree on where ASC ranks NULLs (Spark first, DuckDB
    // last), which silently shifts every measurable customer's rank —
    // the r10 sf1 null-sweep find, invisible at sf0.01 where no
    // customer has all orders nulled.
    spend.filter(col("cents").isNotNull)
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("i").cast("decimal(38,0)") * col("cents")).as("s1"),
        sum(col("cents")).as("stot"))
      .select(col("c_mktsegment"), col("n_customers"),
        round((lit(2) * col("s1") - (col("n_customers") + 1) * col("stot").cast("decimal(38,0)"))
          .cast("double")
          / (col("n_customers").cast("double") * col("stot").cast("double")), 6).as("gini"))
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** Benford first-digit audit over order totals: observed share of
    * each leading digit vs the Benford expectation log₁₀(1+1/d) — the
    * classic fraud/synthetic-data detector. The leading digit comes
    * from the DECIMAL(18,2) string form (first [1-9] char), never from
    * float log₁₀ bucketing, so values like 999.99/1000.00 cannot
    * misbucket on a 1-ulp log difference. Shares are one exact-integer
    * division; the 1-row corpus total is broadcast back (dq_drift_psi
    * idiom). Map-side combinable into 9 rows at any scale.
    */
  val benfordDigits: Q = Q(
    "benford_digits",
    """WITH digits AS (
      |  SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
      |                             '[1-9]') AS INTEGER) AS digit
      |  FROM orders),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM digits)
      |SELECT digit, CAST(count(*) AS BIGINT) AS n,
      |       round(CAST(count(*) AS DOUBLE) / t, 6) AS share,
      |       round(log10(1 + 1.0 / digit), 6) AS benford_expected
      |FROM digits CROSS JOIN tot
      |GROUP BY digit, t ORDER BY digit NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val digits = T.orders(s, d)
      .select(regexp_extract(T.dec2(col("o_totalprice")).cast("string"), "[1-9]", 0)
        .cast("int").as("digit"))
    val tot = digits.agg(count(lit(1)).as("t"))
    digits.crossJoin(broadcast(tot))
      .groupBy(col("digit"), col("t"))
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("t"), 6).as("share"),
        round(log10(lit(1) + lit(1.0) / col("digit")), 6).as("benford_expected"))
      .orderBy(col("digit").asc_nulls_first)
  }

  /** 60-minute rolling Pearson correlation between the per-minute mean
    * `view` and `purchase` values — cross-series co-movement, the
    * monitoring primitive behind "did conversions decouple from
    * traffic?". Inputs are pinned at 6 dp before the window (avg is a
    * float sum whose partial order differs cross-engine), and only
    * full 60-row frames are emitted so the correlation never sees a
    * degenerate 1-point window. The window orders the per-MINUTE
    * aggregate — cardinality = corpus minutes (≈526k/year even at
    * 100 TB), an aggregate frame like ts_resample_interp's grid, not a
    * row-level funnel.
    */
  val tsRollingCorr: Q = Q(
    "ts_rolling_corr",
    """WITH pm AS (
      |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m,
      |         round(avg(value) FILTER (WHERE event_type = 'view'), 6) AS v,
      |         round(avg(value) FILTER (WHERE event_type = 'purchase'), 6) AS p
      |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
      |j AS (
      |  SELECT m, v, p, row_number() OVER (ORDER BY m) AS rn
      |  FROM pm WHERE v IS NOT NULL AND p IS NOT NULL),
      |r AS (
      |  SELECT m, rn,
      |         round(corr(v, p) OVER (ORDER BY m
      |               ROWS BETWEEN 59 PRECEDING AND CURRENT ROW), 6) AS corr60
      |  FROM j)
      |SELECT m, corr60 FROM r WHERE rn >= 60 ORDER BY m NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val pm = T.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(round(avg(when(col("event_type") === "view", col("value"))), 6).as("v"),
        round(avg(when(col("event_type") === "purchase", col("value"))), 6).as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull)
    val j = pm.withColumn("rn", row_number().over(Window.orderBy(col("m"))))
    j.withColumn("corr60",
        round(corr(col("v"), col("p")).over(
          Window.orderBy(col("m")).rowsBetween(-59, 0)), 6))
      .filter(col("rn") >= 60)
      .select(col("m"), col("corr60"))
      .orderBy(col("m").asc_nulls_first)
  }

  /** Peak concurrency per event type: each event opens a 5-minute
    * half-open interval [ts, ts+5m); the classic +1/−1 sweep (running
    * sum over interval endpoints) finds the maximum number of
    * simultaneously-open intervals. The endpoint order is total —
    * (t, delta, event_id) with closes (−1) before opens (+1) at the
    * same instant — so the half-open semantics are pinned
    * cross-engine. The sweep window partitions by series; the
    * sf-data's 5-series shape is the same bounded-cardinality caveat
    * as ts_anomaly_zscore — on host×metric telemetry the same plan
    * parallelizes per series.
    */
  val maxConcurrency: Q = Q(
    "max_concurrency",
    """WITH pts AS (
      |  SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
      |  UNION ALL
      |  SELECT event_type, epoch_us(ts) + 300000000 AS t, -1 AS delta, event_id
      |  FROM events),
      |sw AS (
      |  SELECT event_type,
      |         sum(delta) OVER (PARTITION BY event_type
      |                          ORDER BY t ASC, delta ASC, event_id ASC
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc,
      |         delta
      |  FROM pts)
      |SELECT event_type, CAST(max(conc) AS BIGINT) AS peak_concurrency,
      |       CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_intervals
      |FROM sw GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // one scan: each event explodes into its (open, close) endpoint
    // pair map-side — the UNION ALL form reads the table twice
    val pts = T.spreadExplodeInput(s, T.events(s, d)) // few-file guard (r16)
      .select(col("event_type"), unix_micros(col("ts")).as("t"), col("event_id"))
      .select(col("event_type"), col("event_id"), explode(array(
        struct(col("t"), lit(1).as("delta")),
        struct((col("t") + 300000000L).as("t"), lit(-1).as("delta")))).as("p"))
      .select(col("event_type"), col("p.t").as("t"), col("p.delta").as("delta"),
        col("event_id"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t").asc, col("delta").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("conc", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("conc")).cast("long").as("peak_concurrency"),
        count(when(col("delta") === 1, 1)).as("n_intervals"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Zipf rank-frequency slope per language: ln(freq) regressed on
    * ln(rank) over the top-200 tokens — natural text sits near −1,
    * templated/synthetic corpora flatten. Token counts and ranks are
    * exact integers (rank totalized by (freq DESC, token ASC)); only
    * the regression arithmetic is float, rounded 6 dp (agg_linreg
    * precedent). The rank window partitions by lang over the DISTINCT
    * vocabulary — Heaps'-law-bounded, the text_rarity argument — and
    * the regression consumes ≤ 200 rows per lang.
    */
  val zipfSlope: Q = Q(
    "zipf_slope",
    """WITH tok AS (
      |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents),
      |f AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, c,
      |         row_number() OVER (PARTITION BY lang ORDER BY c DESC, w ASC) AS rnk
      |  FROM f)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_ranks,
      |       round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6)
      |         AS zipf_slope
      |FROM r WHERE rnk <= 200 GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val tok = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("lang"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
    val f = tok.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("w").asc)
    f.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 200)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        round(regr_slope(log(col("c").cast("double")), log(col("rnk").cast("double"))), 6)
          .as("zipf_slope"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** First-order Markov transition matrix over per-user event streams:
    * P(next_type | type) with counts, stream order totalized by
    * (ts, event_id). The lead() window partitions by user_id — high
    * cardinality, fully parallel; the probability normalization is a
    * window over the ≤|types|² aggregate (bounded, the mixture_weights
    * argument). p is one exact-integer division rounded 6 dp.
    */
  val transitionMatrix: Q = Q(
    "transition_matrix",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts ASC, event_id ASC) AS next_type
      |  FROM events),
      |c AS (
      |  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, next_type, n,
      |       round(CAST(n AS DOUBLE)
      |             / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6) AS p
      |FROM c ORDER BY event_type NULLS FIRST, next_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val seq = T.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("next_type").isNotNull)
    val c = seq.groupBy(col("event_type"), col("next_type")).agg(count(lit(1)).as("n"))
    c.withColumn("p",
        round(col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy(col("event_type"))).cast("double"), 6))
      .orderBy(col("event_type").asc_nulls_first, col("next_type").asc_nulls_first)
  }

  /** Funnel conversion-time percentiles: per user, the delay from the
    * FIRST view to the first purchase at-or-after it, cohorted by the
    * hour-of-day of that first view — "how fast do morning vs evening
    * visitors convert". Delays are EXACT integer microseconds up to the
    * last step, then ONE IEEE division to minutes (deterministic) so
    * the interpolated percentiles run at ~10³ magnitude where a 4-dp
    * round absorbs cross-engine ulp noise — at raw-µs magnitude
    * (~4×10¹¹) one ulp is ~6×10⁻⁵ and NO decimal rounding is stable
    * (measured: Spark …81.5 vs DuckDB …81.50006). Both stages are
    * user_id-co-partitioned aggregates (the funnel_steps chain); the
    * percentile rollup groups by the 24-value hour cohort —
    * partial-aggregable, no window at all.
    */
  val funnelConversionTime: Q = Q(
    "funnel_conversion_time",
    """WITH fv AS (
      |  SELECT user_id, min(epoch_us(ts)) AS v_us
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |fp AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      |  FROM events e JOIN fv ON e.user_id = fv.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.v_us
      |  GROUP BY 1),
      |d AS (
      |  SELECT fv.user_id,
      |         CAST(fp.p_us - fv.v_us AS DOUBLE) / 60000000 AS delay_min,
      |         CAST((fv.v_us // 3600000000) % 24 AS BIGINT) AS view_hour
      |  FROM fv JOIN fp ON fv.user_id = fp.user_id)
      |SELECT view_hour, CAST(count(*) AS BIGINT) AS n_converted,
      |       round(quantile_cont(delay_min, 0.5), 4) AS p50_delay_min,
      |       round(quantile_cont(delay_min, 0.9), 4) AS p90_delay_min
      |FROM d GROUP BY 1 ORDER BY view_hour NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val fp = ev.filter(col("event_type") === "purchase")
      .join(fv, "user_id")
      .filter(col("us") >= col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"), min(col("v_us")).as("v_us2"))
    fp
      .select(col("user_id"),
        ((col("p_us") - col("v_us2")).cast("double") / 60000000).as("delay_min"),
        // `div` = exact integer division on longs; `/` would round-trip
        // through double (Tables.events nanos precedent)
        (expr("v_us2 div 3600000000") % 24).as("view_hour"))
      .groupBy(col("view_hour"))
      .agg(count(lit(1)).as("n_converted"),
        round(percentile(col("delay_min"), lit(0.5)), 4).as("p50_delay_min"),
        round(percentile(col("delay_min"), lit(0.9)), 4).as("p90_delay_min"))
      .orderBy(col("view_hour").asc_nulls_first)
  }

  /** Herfindahl–Hirschman concentration of supplier revenue within each
    * nation: HHI = Σ sᵢ² over revenue shares — the antitrust/market-
    * concentration primitive. Both the numerator Σcᵢ² and denominator
    * (Σcᵢ)² are computed from EXACT integer cents (squares summed in
    * DECIMAL(38,0), far beyond long headroom), so the HHI is two exact
    * sums and three IEEE ops — deterministic cross-engine without a
    * single per-row float. Fully partial-aggregable: two nested
    * aggregates, no window, no cross join.
    */
  val supplierHerfindahl: Q = Q(
    "supplier_herfindahl",
    """WITH sup AS (
      |  SELECT n_name, l_suppkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |       round(CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
      |             / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)), 6)
      |         AS hhi
      |FROM sup GROUP BY 1 ORDER BY n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val sup = T.lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_suppkey"))
      .agg((sum(T.dec2(col("l_extendedprice"))) * 100).cast("long").as("cents"))
    sup.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("sq"),
        sum(col("cents")).as("tot"))
      .select(col("n_name"), col("n_suppliers"),
        round(col("sq").cast("double")
          / (col("tot").cast("double") * col("tot").cast("double")), 6).as("hhi"))
      .orderBy(col("n_name").asc_nulls_first)
  }

  /** Equi-depth (decile) histogram per series: 9 interpolated cutpoints
    * per event_type, every row scored into its decile by counting
    * cutpoints below it — the one-pass broadcast-cutpoint idiom
    * (rfm_segment/dq_outlier_iqr), NOT an ntile window: at 100 TB the
    * scoring join is map-side against a |series|×9 broadcast and the
    * counting is partial-aggregable. Cutpoints rounded 6 dp on both
    * sides; boundary ties land in the lower bucket (strict `>`) on both
    * engines. Near-uniform bucket counts are the evidence the depth cut
    * worked; exact equality is not expected with interpolated cuts on
    * continuous data.
    */
  val equiDepthHist: Q = Q(
    "equi_depth_hist",
    """WITH cuts AS (
      |  SELECT event_type AS ct,
      |         round(quantile_cont(value, 0.1), 6) AS c1, round(quantile_cont(value, 0.2), 6) AS c2,
      |         round(quantile_cont(value, 0.3), 6) AS c3, round(quantile_cont(value, 0.4), 6) AS c4,
      |         round(quantile_cont(value, 0.5), 6) AS c5, round(quantile_cont(value, 0.6), 6) AS c6,
      |         round(quantile_cont(value, 0.7), 6) AS c7, round(quantile_cont(value, 0.8), 6) AS c8,
      |         round(quantile_cont(value, 0.9), 6) AS c9
      |  FROM events GROUP BY 1)
      |SELECT event_type,
      |       (CASE WHEN value > c1 THEN 1 ELSE 0 END + CASE WHEN value > c2 THEN 1 ELSE 0 END
      |      + CASE WHEN value > c3 THEN 1 ELSE 0 END + CASE WHEN value > c4 THEN 1 ELSE 0 END
      |      + CASE WHEN value > c5 THEN 1 ELSE 0 END + CASE WHEN value > c6 THEN 1 ELSE 0 END
      |      + CASE WHEN value > c7 THEN 1 ELSE 0 END + CASE WHEN value > c8 THEN 1 ELSE 0 END
      |      + CASE WHEN value > c9 THEN 1 ELSE 0 END) AS decile,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events JOIN cuts ON event_type = ct
      |GROUP BY 1, 2 ORDER BY event_type NULLS FIRST, decile NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d).select(col("event_type"), col("value"))
    val cutCols = (1 to 9).map(i =>
      round(percentile(col("value"), lit(i / 10.0)), 6).as(s"c$i"))
    val cuts = e.groupBy(col("event_type").as("ct"))
      .agg(cutCols.head, cutCols.tail: _*)
    val decile = (1 to 9).map(i => when(col("value") > col(s"c$i"), 1).otherwise(0))
      .reduce(_ + _)
    e.join(broadcast(cuts), col("event_type") === col("ct"))
      .select(col("event_type"), decile.as("decile"))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first, col("decile").asc_nulls_first)
  }

  /** Month-over-month revenue growth per nation — the BI staple.
    * Monthly revenue is exact integer cents; growth is (cents − prev)
    * / prev — exact subtraction, ONE IEEE division, round 6; the first
    * month per nation is NULL on both engines. The lag window runs
    * over the |nations|×|months| aggregate (bounded by calendar ×
    * data model, never corpus volume); everything upstream is
    * partial-aggregable.
    */
  val tsMomGrowth: Q = Q(
    "ts_mom_growth",
    """WITH m AS (
      |  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1, 2),
      |lagd AS (
      |  SELECT n_name, mon, cents,
      |         lag(cents) OVER (PARTITION BY n_name ORDER BY mon) AS prev
      |  FROM m)
      |SELECT n_name, mon, CAST(cents AS DOUBLE) / 100 AS revenue,
      |       round(CAST(cents - prev AS DOUBLE) / prev, 6) AS mom_growth
      |FROM lagd ORDER BY n_name NULLS FIRST, mon NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // a month-over-month series has no NULL month: the lag chain's
    // null position differs between engines (null-sweep r9) — exclude
    val m = T.orders(s, d).select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .filter(col("o_orderdate").isNotNull)
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_trunc("month", col("o_orderdate")).as("mon"))
      .agg((sum(T.dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
    m.withColumn("prev", lag(col("cents"), 1).over(
        Window.partitionBy(col("n_name")).orderBy(col("mon"))))
      .select(col("n_name"), col("mon"),
        (col("cents").cast("double") / 100).as("revenue"),
        round((col("cents") - col("prev")).cast("double") / col("prev"), 6)
          .as("mom_growth"))
      .orderBy(col("n_name").asc_nulls_first, col("mon").asc_nulls_first)
  }

  /** Monthly stickiness (mean-DAU / MAU): how much of the monthly
    * audience shows up on an average day. The ratio is computed as
    * sum_dau / (n_days · mau) — all exact integers into ONE IEEE
    * division, round 6 — instead of avg(dau)/mau, which would stack
    * two divisions. The distinct (user, day) set is one shuffle; both
    * rollups are partial-aggregable; the month frame is
    * calendar-bounded.
    */
  val cohortStickiness: Q = Q(
    "cohort_stickiness",
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT CAST(date_trunc('month', day) AS DATE) AS mon,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS mau,
      |       CAST(count(*) AS BIGINT) AS sum_dau,
      |       CAST(count(DISTINCT day) AS BIGINT) AS n_days,
      |       round(CAST(count(*) AS DOUBLE)
      |             / (count(DISTINCT day) * count(DISTINCT user_id)), 6)
      |         AS stickiness
      |FROM d GROUP BY 1 ORDER BY mon NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // each distinct (user, day) row contributes exactly 1 to its day's
    // DAU, so Σdau per month IS the row count — one pass over the
    // distinct set (two count-distincts share the expand), instead of
    // recomputing the distinct shuffle for separate dau/mau rollups
    T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(trunc(col("day"), "month").as("mon"))
      .agg(countDistinct(col("user_id")).as("mau"),
        count(lit(1)).as("sum_dau"),
        countDistinct(col("day")).as("n_days"))
      .select(col("mon"), col("mau"), col("sum_dau"), col("n_days"),
        round(col("sum_dau").cast("double") / (col("n_days") * col("mau")), 6)
          .as("stickiness"))
      .orderBy(col("mon").asc_nulls_first)
  }

  /** Inter-arrival-time percentiles per event type: the gap from each
    * event to the SAME USER's previous event (any type), attributed to
    * the later event's type — the queueing/ops view of user cadence.
    * Gaps are exact integer µs divided ONCE to seconds (the
    * funnel_conversion_time magnitude lesson: percentiles at raw-µs
    * scale are not decimal-roundable), percentiles rounded 4 dp. The
    * lag window partitions by user_id — high cardinality, fully
    * parallel; the rollup groups by the bounded type set.
    */
  val windowInterarrival: Q = Q(
    "window_interarrival",
    """WITH g AS (
      |  SELECT event_type,
      |         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |           AS DOUBLE) / 1000000 AS gap_s
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
      |       round(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s
      |FROM g WHERE gap_s IS NOT NULL
      |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
    e.withColumn("gap_s",
        (col("us") - lag(col("us"), 1).over(w)).cast("double") / 1000000)
      .filter(col("gap_s").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(percentile(col("gap_s"), lit(0.5)), 4).as("p50_gap_s"),
        round(percentile(col("gap_s"), lit(0.9)), 4).as("p90_gap_s"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Exact-duplicate family-size histogram: how much of the corpus is
    * duplicated and in what cluster shapes — the one-glance dedup
    * health metric (family_size 1 = unique docs; n_docs column shows
    * where the volume sits). Families key on md5(text) so the first
    * shuffle moves 16-byte digests, never document bodies; both
    * levels are partial-aggregable counts.
    */
  val dedupFamilyHist: Q = Q(
    "dedup_family_hist",
    """WITH fam AS (
      |  SELECT md5(text) AS key, CAST(count(*) AS BIGINT) AS family_size
      |  FROM documents GROUP BY 1)
      |SELECT family_size, CAST(count(*) AS BIGINT) AS n_families,
      |       CAST(family_size * count(*) AS BIGINT) AS n_docs
      |FROM fam GROUP BY 1 ORDER BY family_size NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .groupBy(md5(col("text")).as("key"))
      .agg(count(lit(1)).as("family_size"))
      .groupBy(col("family_size"))
      .agg(count(lit(1)).as("n_families"))
      .select(col("family_size"), col("n_families"),
        (col("family_size") * col("n_families")).as("n_docs"))
      .orderBy(col("family_size").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(rfmSegment, basketBrandPairs, giniSegment, benfordDigits,
    tsRollingCorr, maxConcurrency, zipfSlope, transitionMatrix,
    funnelConversionTime, supplierHerfindahl, equiDepthHist,
    tsMomGrowth, cohortStickiness, windowInterarrival, dedupFamilyHist)
}
