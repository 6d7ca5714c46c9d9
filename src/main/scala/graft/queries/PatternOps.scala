package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Sequence-pattern and dominance analytics over the event stream and
  * the supplier corpus — the MATCH_RECOGNIZE / streak / skyline shapes
  * a product-analytics engine is asked for next after funnels.
  *
  * Scale posture: every window partitions by user_id (high cardinality —
  * parallel); the skyline's dominance join is EQUI on the nation key, so
  * the quadratic verify is bounded per nation group (nations are an
  * enumerated dimension, ≤ 25 keys), never corpus×corpus.
  */
object PatternOps {

  /** Consecutive view→click→purchase triples per user, in (ts, event_id)
    * event order — the strict-sequence pattern match (CEP shape) that
    * funnel_steps's "ever before" semantics cannot express. lead() keeps
    * it one window pass; revenue is the purchase row's value (D2 decimal).
    */
  val windowPatternMatch: Q = Q(
    "window_pattern_match",
    """WITH seq AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lead(event_type, 1) OVER w AS t1,
      |         lead(event_type, 2) OVER w AS t2,
      |         lead(value, 2) OVER w AS v2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, count(*) AS n_conversions,
      |       CAST(sum(CAST(v2 AS DECIMAL(18,2))) AS DOUBLE) AS conv_revenue
      |FROM seq WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("v2", lead(col("value"), 2).over(w))
      .filter(col("event_type") === "view" && col("t1") === "click" && col("t2") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(T.dec2(col("v2"))).as("conv_revenue"))
      .orderBy(col("user_id").asc_nulls_first)
  }

  /** Gaps-and-islands: per-user longest run of consecutive active DAYS
    * (the "streak" query). The classic day_index − row_number() grouping
    * key — pure integer arithmetic, one window per user partition.
    */
  val gapsIslands: Q = Q(
    "gaps_islands",
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |idx AS (SELECT user_id, day, date_diff('day', DATE '1970-01-01', day) AS di,
      |               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM days),
      |isl AS (SELECT user_id, di - rn AS grp, count(*) AS len FROM idx GROUP BY 1, 2)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak, count(*) AS n_streaks,
      |       CAST(sum(len) AS BIGINT) AS active_days
      |FROM isl GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // distinct on (user_id, day) is set semantics — every column is a
    // key, so it is deterministic (not the D4 dropDuplicates hazard).
    val days = T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp",
        datediff(col("day"), to_date(lit("1970-01-01"))) - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_streaks"),
        sum(col("len")).cast("long").as("active_days"))
      .orderBy(col("user_id").asc_nulls_first)
  }

  /** Skyline / Pareto frontier: per nation, the suppliers not dominated
    * on (shipped quantity ↑, total cost ↓) by any same-nation supplier.
    * Quantities are integral longs, cost is exact DECIMAL(18,2): every
    * dominance comparison is exact, no float ties.
    *
    * The 2-D skyline needs no self-join: dominance decomposes into
    * (a) some STRICTLY-higher-qty supplier is no more expensive —
    * `min(cost) RANGE [qty+1, ∞)` (integer range frame), and
    * (b) some SAME-qty supplier is strictly cheaper — `min(cost)` over
    * the (nation, qty) group. Two sort-based windows per nation,
    * O(n log n), replacing the first cut's LEFT ANTI self-join and its
    * per-group quadratic residual. Measured wall time at sf1 is
    * UNCHANGED (~3.7 s) — the dominant cost there is the 60M-row
    * lineitem rollup, not the skyline stage — but at dimension
    * cardinalities where groups are large (supplier×part skylines),
    * the quadratic term is the one that kills; this shape has none.
    * The oracle keeps the NOT EXISTS formulation — semantics
    * unchanged, only the plan.
    */
  val paretoFrontier: Q = Q(
    "pareto_frontier",
    """WITH agg AS (
      |  SELECT s.s_nationkey, s.s_suppkey, s.s_name,
      |         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS cost
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2, 3)
      |SELECT a.s_nationkey, a.s_suppkey, a.s_name, a.qty, CAST(a.cost AS DOUBLE) AS cost
      |FROM agg a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM agg b
      |  WHERE b.s_nationkey = a.s_nationkey
      |    AND b.qty >= a.qty AND b.cost <= a.cost
      |    AND (b.qty > a.qty OR b.cost < a.cost))
      |ORDER BY a.s_nationkey NULLS FIRST, a.s_suppkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val li = T.lineitem(s, d).groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"),
        sum(T.dec2(col("l_extendedprice"))).as("cost"))
    val sup = T.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_name"))
    val agg = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
        col("qty"), col("cost"))
    // (a) cheapest cost among strictly-higher-qty same-nation suppliers
    val wHigher = Window.partitionBy(col("s_nationkey")).orderBy(col("qty"))
      .rangeBetween(1L, Window.unboundedFollowing)
    // (b) cheapest cost within the same (nation, qty) group (incl. self)
    val wSameQty = Window.partitionBy(col("s_nationkey"), col("qty"))
    agg
      .withColumn("min_cost_higher", min(col("cost")).over(wHigher))
      .withColumn("min_cost_same", min(col("cost")).over(wSameQty))
      .filter(
        // no higher-qty supplier at <= cost (null = no higher-qty rows)
        (col("min_cost_higher").isNull || col("min_cost_higher") > col("cost"))
          // and no same-qty supplier strictly cheaper
          && !(col("min_cost_same") < col("cost")))
      .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
        col("qty"), col("cost"))
      .orderBy(col("s_nationkey").asc_nulls_first, col("s_suppkey").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(windowPatternMatch, gapsIslands, paretoFrontier)
}
