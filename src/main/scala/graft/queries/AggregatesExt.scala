package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Additional aggregate surface: correlation/covariance, exact
  * percentiles, ordered string aggregation. Doubles through iterative
  * co-moment/interpolation math are rounded to 6 dp on both sides (D2
  * mitigation, as for stddev).
  */
object AggregatesExt {

  val aggCorr: Q = Q(
    "agg_corr",
    """SELECT l_returnflag,
      |       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      |       round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_covar"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  /** Exact interpolated percentiles (not the approx sketch — that is
    * §2B B10).
    */
  val aggPercentile: Q = Q(
    "agg_percentile",
    """SELECT l_returnflag,
      |       round(median(CAST(l_quantity AS DOUBLE)), 6) AS med_qty,
      |       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25_qty,
      |       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS p90_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(median(col("l_quantity")), 6).as("med_qty"),
        round(percentile(col("l_quantity"), lit(0.25)), 6).as("p25_qty"),
        round(percentile(col("l_quantity"), lit(0.9)), 6).as("p90_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  /** Ordered, distinct string aggregation. collect_set order is
    * nondeterministic (D4) — array_sort pins it; the oracle's
    * string_agg(DISTINCT ... ORDER BY) is the same contract.
    */
  val fnStringagg: Q = Q(
    "fn_stringagg",
    """SELECT c_nationkey,
      |       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |       count(DISTINCT c_mktsegment) AS n_segments
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      .orderBy(col("c_nationkey").asc_nulls_first)
  }

  /** Equal-width histogram via floor arithmetic (DuckDB has no
    * width_bucket, so BOTH sides use the same portable formula; last
    * bucket capped). min/max per bucket are comparisons, not sums —
    * exact on doubles.
    */
  val aggHistogram: Q = Q(
    "agg_histogram",
    """SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bucket,
      |       count(*) AS n,
      |       CAST(min(o_totalprice) AS DOUBLE) AS lo,
      |       CAST(max(o_totalprice) AS DOUBLE) AS hi
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .groupBy(least(floor(col("o_totalprice") / 50000), lit(9)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).cast("double").as("lo"),
        max(col("o_totalprice")).cast("double").as("hi"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  /** Quantity-weighted lower median of the line price per return flag —
    * the weighted-percentile shape (median price per UNIT, not per
    * line) that plain percentile cannot express. Semantics: the
    * smallest price whose cumulative quantity reaches half the total.
    * Everything is exact: prices are DECIMAL(18,2), weights integer
    * quantities, and the default RANGE window frame (ORDER BY price,
    * ties included up to CURRENT ROW) makes the cumulative sum
    * independent of intra-tie row order on BOTH engines — no rounding
    * anywhere, one final decimal→double cast. The Spark plan is the
    * two-phase bin-and-refine (below): partial-aggregable bin counts +
    * an exact RANGE window over only the crossing bin's ~n/B slice, so
    * no flag ever serializes its full partition into one task. The
    * oracle keeps the direct one-window form — same semantics, and
    * DuckDB's single node doesn't carry the parallelism constraint.
    */
  val aggWeightedMedian: Q = Q(
    "agg_weighted_median",
    """WITH w AS (
      |  SELECT l_returnflag AS flag,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |         CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, price, qty,
      |         CAST(sum(qty) OVER (PARTITION BY flag ORDER BY price) AS BIGINT) AS cum,
      |         CAST(sum(qty) OVER (PARTITION BY flag) AS BIGINT) AS tot
      |  FROM w)
      |SELECT flag, CAST(min(price) AS DOUBLE) AS weighted_median,
      |       CAST(min(tot) AS BIGINT) AS total_qty
      |FROM c WHERE 2 * cum >= tot
      |GROUP BY flag ORDER BY flag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // Two-phase bin-and-refine: the naive per-flag RANGE cumulative sum
    // serializes each flag's ENTIRE partition into one task (|flags|=3
    // caps parallelism — the r6 scale flag). Instead: (A) bin rows into
    // B equal-width cent buckets (exact integer floor division, bin(p)
    // monotonic in p, price ties share a bin so RANGE semantics are
    // preserved), partial-aggregate per-bin weights, and prefix-sum the
    // |flags|×B bin table; (B) the crossing bin — the one where
    // 2·cum first reaches tot — holds the weighted median, so only its
    // ~n/B slice needs the exact RANGE window, seeded with the exact
    // cumulative weight of all earlier bins. Same result bit-for-bit,
    // no unbounded per-flag sort anywhere.
    val B = 1024
    // the pipeline equi-joins on flag repeatedly, and NULL group keys
    // never equi-match — route them through a sentinel (\u0001 cannot
    // collide with the single-letter flags) and restore at the edge so
    // the NULL group survives like it does in the oracle's GROUP BY
    val w = T.lineitem(s, d).select(
      coalesce(col("l_returnflag"), lit("\u0001")).as("flag"),
      T.dec2(col("l_extendedprice")).as("price"),
      col("l_quantity").cast("long").as("qty"))
      .withColumn("cents", (col("price") * 100).cast("long"))
    val stats = w.groupBy(col("flag"))
      .agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"),
        sum(col("qty")).as("tot"))
    val binned = w.join(broadcast(stats), Seq("flag"))
      .withColumn("bin", expr(s"(cents - minc) * ${B}L div (maxc - minc + 1)"))
    // ≤ |flags|×B rows: the only window runs over this bounded table
    val cumBins = binned.groupBy(col("flag"), col("bin"))
      .agg(sum(col("qty")).as("bq"))
      .withColumn("cumb", sum(col("bq")).over(
        Window.partitionBy(col("flag")).orderBy(col("bin"))))
      .join(broadcast(stats.select(col("flag"), col("tot"))), Seq("flag"))
      .localCheckpoint()
    val crossing = cumBins.filter(lit(2) * col("cumb") >= col("tot"))
      .groupBy(col("flag")).agg(min(col("bin")).as("bin"))
    val seed = cumBins.join(crossing, Seq("flag", "bin"))
      .select(col("flag"), col("bin"), (col("cumb") - col("bq")).as("cum_before"),
        col("tot"))
    val slice = binned.select(col("flag"), col("bin"), col("price"), col("qty"))
      .join(broadcast(seed), Seq("flag", "bin"))
    // default frame with ORDER BY is RANGE UNBOUNDED PRECEDING..CURRENT
    // ROW: price ties accumulate together, so `cum` stays intra-tie-
    // order independent — now over a 1/B slice, not the full flag
    slice.withColumn("cum", col("cum_before") + sum(col("qty")).over(
        Window.partitionBy(col("flag")).orderBy(col("price"))))
      .filter(lit(2) * col("cum") >= col("tot"))
      .groupBy(col("flag"))
      .agg(min(col("price")).cast("double").as("weighted_median"),
        min(col("tot")).cast("long").as("total_qty"))
      .select(nullif(col("flag"), lit("\u0001")).as("flag"),
        col("weighted_median"), col("total_qty"))
      .orderBy(col("flag").asc_nulls_first)
  }

  val all: Seq[Q] =
    Seq(aggCorr, aggPercentile, fnStringagg, aggHistogram, aggWeightedMedian)
}
