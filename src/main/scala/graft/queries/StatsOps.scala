package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Statistical-monitoring and text-statistics surface: IQR outlier
  * fences, per-group linear regression, CUSUM drift detection, the
  * regexp function family, and a corpus bigram language-model score.
  *
  * Float discipline (SURVEY §2 D-rules): interpolated quantiles and
  * regression co-moments are rounded to a fixed dp on BOTH sides (the
  * agg_corr/agg_percentile precedent); the CUSUM runs in exact integer
  * cents with denominators cleared — no rounding at all; log2 sums are
  * rounded like text_entropy.
  */
object StatsOps {

  /** Tukey-fence outlier counts per series: fences from exact
    * interpolated quartiles, rounded to 4 dp on both sides so the
    * boundary comparison is engine-stable; counting is a broadcast
    * 5-row fence join back onto the stream — partial-aggregable,
    * no window, no serialization point.
    */
  val dqOutlierIqr: Q = Q(
    "dq_outlier_iqr",
    """WITH q AS (
      |  SELECT event_type AS qt,
      |         round(quantile_cont(value, 0.25) - (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5, 4) AS lo,
      |         round(quantile_cont(value, 0.75) + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)) * 1.5, 4) AS hi
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |       count(*) FILTER (WHERE e.value < q.lo OR e.value > q.hi) AS n_outliers,
      |       min(q.lo) AS lo_fence, min(q.hi) AS hi_fence
      |FROM events e JOIN q ON e.event_type = q.qt
      |GROUP BY e.event_type ORDER BY e.event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d).select(col("event_type"), col("value"))
    val q = e.groupBy(col("event_type").as("qt")).agg(
      percentile(col("value"), lit(0.25)).as("q1"),
      percentile(col("value"), lit(0.75)).as("q3"))
    val fences = q.select(col("qt"),
      round(col("q1") - (col("q3") - col("q1")) * lit(1.5), 4).as("lo"),
      round(col("q3") + (col("q3") - col("q1")) * lit(1.5), 4).as("hi"))
    e.join(broadcast(fences), col("event_type") === col("qt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("value") < col("lo") || col("value") > col("hi"), 1))
          .as("n_outliers"),
        min(col("lo")).as("lo_fence"), min(col("hi")).as("hi_fence"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Per-series least-squares trend of value vs day index (days since
    * corpus start) — slope/intercept/R² via the SQL-standard regr_*
    * aggregates, both engines' co-moment math rounded to 6 dp
    * (agg_corr precedent). x is an exact integer day index on both
    * sides, so only the regression arithmetic itself is float.
    */
  val aggLinreg: Q = Q(
    "agg_linreg",
    """SELECT event_type,
      |       round(regr_slope(value, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)), 6) AS slope,
      |       round(regr_intercept(value, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)), 6) AS intercept,
      |       round(regr_r2(value, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)), 6) AS r2,
      |       CAST(regr_count(value, CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)) AS BIGINT) AS n
      |FROM events GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val x = datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("double")
    T.events(s, d)
      .select(col("event_type"), col("ts"), col("value"))
      .groupBy(col("event_type"))
      .agg(
        round(regr_slope(col("value"), x), 6).as("slope"),
        round(regr_intercept(col("value"), x), 6).as("intercept"),
        round(regr_r2(col("value"), x), 6).as("r2"),
        regr_count(col("value"), x).cast("long").as("n"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** CUSUM drift detection per series: running sum of deviations of the
    * hourly revenue total from the series' mean hourly total. NO
    * rounding anywhere: hourly totals become exact integer CENTS, and
    * the rational mean S/n is cleared of its denominator —
    * n·cusum_k = n·prefix_k − k·S is computed in exact integers, the
    * drift flag compares integers (|scaled| > 2000·100·n ⇔ |cusum| >
    * 2000), and the displayed cusum is ONE IEEE division of exact
    * integers, bit-identical cross-engine at any scale factor. (The
    * first cut rounded per-hour means to 6 dp; at sf1 one of 3600
    * values landed on a round-half boundary where Spark's
    * BigDecimal HALF_UP and DuckDB's scaled-multiply rounding
    * disagree by 1e-6 — this formulation removes the class.)
    * Integer headroom: n·prefix stays < 2^53 until the per-series
    * corpus exceeds ~10^5 hours × ~$10^9/hour — document, don't round.
    */
  val tsCusum: Q = Q(
    "ts_cusum",
    """WITH hourly AS (
      |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |cs AS (
      |  SELECT event_type, h,
      |         CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY h
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfx,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS k,
      |         CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s_tot,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM hourly)
      |SELECT event_type, h,
      |       CAST(n * pfx - k * s_tot AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS cusum,
      |       abs(n * pfx - k * s_tot) > 200000 * n AS drift
      |FROM cs ORDER BY event_type NULLS FIRST, h NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val hourly = T.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg((sum(T.dec2(col("value"))) * 100).cast("long").as("cents"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val scaled = col("n") * col("pfx") - col("k") * col("s_tot")
    hourly
      .withColumn("pfx", sum(col("cents")).over(wRun).cast("long"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("h"))))
      .withColumn("s_tot", sum(col("cents")).over(wAll).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("event_type"), col("h"),
        (scaled.cast("double") / (col("n") * 100).cast("double")).as("cusum"),
        (abs(scaled) > lit(200000L) * col("n")).as("drift"))
      .orderBy(col("event_type").asc_nulls_first, col("h").asc_nulls_first)
  }

  /** The regexp function family over part: group extraction, global
    * replacement, anchored match, match counting. Patterns stay in the
    * character-class/anchor/alternation subset where Java regex (Spark)
    * and RE2 (DuckDB) agree; DuckDB's regexp_replace needs the explicit
    * 'g' flag to match Spark's replace-all semantics.
    */
  val fnRegexp: Q = Q(
    "fn_regexp",
    """SELECT p_partkey,
      |       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
      |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
      |       regexp_matches(p_type, '^(ECONOMY|STANDARD)') AS is_common,
      |       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
      |FROM part ORDER BY p_partkey NULLS FIRST LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("int").as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_masked"),
        col("p_type").rlike("^(ECONOMY|STANDARD)").as("is_common"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels"))
      .orderBy(col("p_partkey").asc_nulls_first)
      .limit(200)
  }

  /** Corpus bigram language-model score per document: mean surprisal
    * −Σk·log2(p)/m of the doc's character bigrams under the corpus
    * bigram distribution — the classic cheap LM-quality gate (gibberish
    * scores high, templated text low). The corpus total is a 1-row
    * aggregate crossed back via broadcast (the dq_drift_psi idiom); the
    * model join is an equi-join on the bigram. Both engines ORDER BY the
    * ROUNDED score (text_entropy precedent) so the top-25 cut is stable.
    */
  val textBigramLogprob: Q = Q(
    "text_bigram_logprob",
    """WITH bi AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text)-1),
      |         i -> substring(text, i, 2))) AS bg
      |  FROM documents WHERE length(text) >= 2),
      |dk AS (SELECT doc_id, bg, count(*) AS k FROM bi GROUP BY 1, 2),
      |ck AS (SELECT bg, CAST(sum(k) AS BIGINT) AS ck FROM dk GROUP BY 1),
      |tot AS (SELECT CAST(sum(ck) AS BIGINT) AS t FROM ck)
      |SELECT dk.doc_id, CAST(sum(dk.k) AS BIGINT) AS n_bigrams,
      |       round(-sum(dk.k * log2(CAST(ck.ck AS DOUBLE) / tot.t)) / sum(dk.k), 6) AS surprisal
      |FROM dk JOIN ck USING (bg) CROSS JOIN tot
      |GROUP BY dk.doc_id
      |ORDER BY surprisal DESC, dk.doc_id ASC LIMIT 25""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d).filter(length(col("text")) >= 2)
    // total bigram occurrences == Σ(len−1): read straight off the scan —
    // no second corpus explode for a scalar
    val tot = docs.agg(sum(length(col("text")) - 1).cast("long").as("t"))
    // NOT substring(text, i, 2): Spark's substring walks UTF-8 bytes from
    // the start — O(i) per call, O(len²) per doc. Split once (code-point
    // array, BMP-safe per the text_entropy/text_langid precedent), then
    // O(1) element_at lookups: the explode pass drops ~3.5 s → ~0.4 s.
    // few-file straggler guard BEFORE the char-split + bigram explode
    // (r16; pathology at Tables.spreadExplodeInput). Only the explode
    // branch is spread — `tot` stays a bare map-side scan.
    val bi = T.spreadExplodeInput(s, docs)
      .withColumn("arr", split(col("text"), ""))
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(arr)-1), i -> concat(element_at(arr, i), element_at(arr, i+1)))"))
          .as("bg"))
    val dk = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("k"))
    // corpus count per bigram as a window over the compact (doc, bigram)
    // aggregate — the model "join" without re-deriving the explode (the
    // naive agg-then-self-join plan runs the corpus explode twice);
    // partitioned by bigram, high cardinality — parallel, never global
    val ck = sum(col("k")).over(Window.partitionBy(col("bg")))
    dk.withColumn("ck", ck)
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        round(negate(sum(col("k") * log2(col("ck").cast("double") / col("t"))))
          / sum(col("k")), 6).as("surprisal"))
      .orderBy(col("surprisal").desc, col("doc_id").asc)
      .limit(25)
  }

  val all: Seq[Q] =
    Seq(dqOutlierIqr, aggLinreg, tsCusum, fnRegexp, textBigramLogprob)
}
