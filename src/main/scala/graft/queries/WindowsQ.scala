package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 4 — window functions. One shuffle per partition
  * key; window order keys always end in a unique tie-break (D4).
  */
object WindowsQ {

  val windowRank: Q = Q(
    "window_rank",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER w AS rn,
      |         rank() OVER w AS rnk,
      |         dense_rank() OVER w AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 2
      |ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 2)
      .orderBy(col("o_custkey").asc_nulls_first, col("rn").asc_nulls_first)
  }

  val windowRunning: Q = Q(
    "window_running",
    """SELECT o_custkey, o_orderkey,
      |       sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS running_spend,
      |       count(*) OVER w AS running_n
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate NULLS FIRST, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // window-internal ORDER BY must pin null position too: Spark ASC
    // defaults NULLS FIRST, DuckDB NULLS LAST (null-sweep r9 finding)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(T.dec2(col("o_totalprice"))).over(w).as("running_spend"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** Per-user gap to the previous event, exact µs arithmetic (D5). */
  val windowLeadLag: Q = Q(
    "window_lead_lag",
    """SELECT event_id, user_id,
      |       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
      |       lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    T.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** 7-day trailing order count per customer — RANGE frame over an
    * integer day number (Spark range frames need a numeric order key).
    */
  val windowRangeFrame: Q = Q(
    "window_range_frame",
    """SELECT o_custkey, o_orderkey, day_num,
      |       count(*) OVER (PARTITION BY o_custkey ORDER BY day_num
      |                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS trailing_7d
      |FROM (SELECT o_custkey, o_orderkey,
      |             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day_num
      |      FROM orders)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num").asc)
      .rangeBetween(-6, Window.currentRow)
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("day_num"))
      .withColumn("trailing_7d", count(lit(1)).over(w))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  val windowFirstLastNtile: Q = Q(
    "window_first_last_ntile",
    """SELECT o_custkey, o_orderkey,
      |       first_value(o_orderkey) OVER w AS biggest_order,
      |       last_value(o_orderkey) OVER w AS smallest_order,
      |       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val wFull = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wNtile = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(wFull).as("biggest_order"),
        last(col("o_orderkey")).over(wFull).as("smallest_order"),
        ntile(4).over(wNtile).as("quartile"))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** Distribution functions: percent_rank/cume_dist are exact integer
    * ratios (identical double division in both engines — no rounding
    * needed); nth_value needs the explicit full frame, like last_value.
    */
  val windowDistribution: Q = Q(
    "window_distribution",
    """SELECT o_custkey, o_orderkey,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume,
      |       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_biggest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val order = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val w = Window.partitionBy(col("o_custkey")).orderBy(order: _*)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_biggest"))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
  }

  /** COUNT(DISTINCT) OVER — unsupported as a window aggregate in both
    * engines; the standard rewrite is max(dense_rank) per partition,
    * which both execute identically.
    */
  val windowDistinctCount: Q = Q(
    "window_distinct_count",
    """SELECT o_custkey, o_orderkey,
      |       max(dr) OVER (PARTITION BY o_custkey) AS n_distinct_prios
      |FROM (SELECT o_custkey, o_orderkey,
      |             dense_rank() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderpriority) AS dr
      |      FROM orders)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST
      |LIMIT 1000""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderpriority").asc)
    val wAll = Window.partitionBy(col("o_custkey"))
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(wRank).as("dr"))
      .select(col("o_custkey"), col("o_orderkey"),
        max(col("dr")).over(wAll).as("n_distinct_prios"))
      .orderBy(col("o_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      .limit(1000)
  }

  /** Share-of-total per group: each supplier's revenue share of its
    * nation's total, plus revenue rank — the BI "percent of category"
    * shape. Numerator and denominator are EXACT decimal sums; the share
    * is a single IEEE division of their double casts (deterministic
    * cross-engine — same inputs, one correctly-rounded op, no round()).
    * Rank's ordering is made unique by the supplier-key suffix (D1).
    */
  val windowShareOfTotal: Q = Q(
    "window_share_of_total",
    """WITH rev AS (
      |  SELECT s.s_nationkey, s.s_suppkey,
      |         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2)
      |SELECT s_nationkey, s_suppkey,
      |       CAST(rev AS DOUBLE) AS revenue,
      |       CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY s_nationkey) AS DOUBLE) AS share,
      |       CAST(rank() OVER (PARTITION BY s_nationkey
      |            ORDER BY rev DESC, s_suppkey ASC) AS BIGINT) AS rk
      |FROM rev
      |ORDER BY s_nationkey NULLS FIRST, s_suppkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val rev = T.lineitem(s, d).groupBy(col("l_suppkey"))
      .agg(sum(T.dec2(col("l_extendedprice"))).as("rev"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
    val wN = Window.partitionBy(col("s_nationkey"))
    val wR = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("rev").desc, col("s_suppkey").asc)
    rev.select(col("s_nationkey"), col("s_suppkey"),
      col("rev").cast("double").as("revenue"),
      (col("rev").cast("double") / sum(col("rev")).over(wN).cast("double"))
        .as("share"),
      rank().over(wR).cast("long").as("rk"))
      .orderBy(col("s_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    windowRank, windowRunning, windowLeadLag, windowRangeFrame,
    windowFirstLastNtile, windowDistribution, windowDistinctCount,
    windowShareOfTotal)
}
