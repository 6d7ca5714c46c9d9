package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 2 — all join shapes, equi and non-equi. */
object Joins {

  val joinInnerEqui: Q = Q(
    "join_inner_equi",
    """SELECT o_orderkey, c_custkey, c_name, o_orderstatus
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 1000""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_orderstatus"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(1000)
  }

  /** Dim enrichment with explicit broadcast of the small sides — the plan
    * Catalyst would pick anyway, pinned for the 100 TB case where stats
    * may mislead (SURVEY §4.2).
    */
  val joinBroadcast: Q = Q(
    "join_broadcast",
    """SELECT r_name, n_name,
      |       count(*) AS n_items,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(T.dec2(col("l_extendedprice")) * (lit(1) - T.dec4(col("l_discount"))))
          .as("revenue"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val joinLeftOuter: Q = Q(
    "join_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |       coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(T.dec2(col("o_totalprice"))), T.dec2(lit(0))).as("spend"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** Symmetric difference of two key sets via FULL OUTER JOIN. */
  val joinFullOuter: Q = Q(
    "join_full_outer",
    """WITH a AS (SELECT c_custkey AS a_key FROM customer WHERE c_nationkey < 12),
      |     b AS (SELECT DISTINCT o_custkey AS b_key FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT coalesce(a_key, b_key) AS custkey,
      |       (a_key IS NOT NULL) AS in_a,
      |       (b_key IS NOT NULL) AS in_b
      |FROM a FULL OUTER JOIN b ON a_key = b_key
      |ORDER BY custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val a = T.customer(s, d).filter(col("c_nationkey") < 12)
      .select(col("c_custkey").as("a_key"))
    val b = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("b_key")).distinct()
    a.join(b, col("a_key") === col("b_key"), "full_outer")
      .select(
        coalesce(col("a_key"), col("b_key")).as("custkey"),
        col("a_key").isNotNull.as("in_a"),
        col("b_key").isNotNull.as("in_b"))
      .orderBy(col("custkey").asc_nulls_first)
  }

  val joinSemi: Q = Q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(
        T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** Anti-joins against the URGENT subset so the result is non-empty at
    * every sf (every customer has SOME order in this data — the plain
    * no-orders anti-join proved 0==0, a vacuous check; VERDICT r1 #7).
    */
  val joinAnti: Q = Q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** Equi key + range predicate: ship within 90 days of the order date.
    * Planner: SMJ/SHJ on the equi key, range as a post-join filter —
    * the scalable shape for time-window correlation.
    */
  val joinThetaRange: Q = Q(
    "join_theta_range",
    """SELECT l_returnflag, count(*) AS n,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .join(T.orders(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(T.dec2(col("l_quantity"))).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  /** As-of backward join: for each purchase, the latest click by the same
    * user at or before the purchase ts; ts ties → max click event_id.
    * Spark has no native as-of join; the canonical idiom is the
    * union + ordered-window `last(_, ignoreNulls)` formulation below —
    * one shuffle on user_id, no range self-join, skew-safe at scale.
    * The oracle uses the SAME formulation to pin tie-breaks exactly
    * (SURVEY §7.2 #4).
    */
  val joinAsof: Q = Q(
    "join_asof",
    """WITH ce AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, ts, is_purchase,
      |         last_value(click_id IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY ts, is_purchase, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id
      |  FROM ce
      |)
      |SELECT event_id, user_id, ts, asof_click_id
      |FROM w WHERE is_purchase = 1
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val ce = T.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ce.withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_click_id"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  val joinCrossSmall: Q = Q(
    "join_cross_small",
    """SELECT r_name, n_name
      |FROM region CROSS JOIN nation
      |WHERE r_regionkey <> n_regionkey
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.region(s, d).crossJoin(T.nation(s, d))
      .filter(col("r_regionkey") =!= col("n_regionkey"))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Salted skew join — the standard fix when one fact key is hot
    * enough to overwhelm a single reducer: the fact side gets a
    * row-deterministic salt in [0, 8), the (small) dim side is
    * replicated ×8 with every salt value, and the join runs on
    * (key, salt) so the hot key's rows spread across 8 partitions.
    * Semantics-preserving by construction (each fact row matches exactly
    * one replica), so the oracle is the PLAIN join. Forced to
    * sort-merge via hint — a broadcast join would sidestep the very
    * shuffle the technique exists to fix. AQE's skew-join splitting
    * handles moderate skew automatically; explicit salting is the
    * answer when a single key exceeds what one task can hold.
    */
  val joinSkewSalted: Q = Q(
    "join_skew_salted",
    """SELECT c_mktsegment, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val salts = 8
    val fact = T.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    val dim = T.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")).as("salt"))
    fact.join(dim.hint("merge"),
        col("user_id") === col("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).as("total_value"))
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    * top-N-per-group shape expressed as a join (both engines support
    * LATERAL natively; Spark plans it as a correlated lateral join).
    * Runs through the SQL-text entry point (SURVEY §3.3) — same dialect
    * in both engines here, so the oracle IS the query text.
    */
  val joinLateral: Q = Q(
    "join_lateral",
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |                        WHERE o_custkey = c_custkey
      |                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey < 100
      |ORDER BY c_custkey NULLS FIRST, o_totalprice DESC, o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).createOrReplaceTempView("customer")
    T.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |                        WHERE o_custkey = c_custkey
        |                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 100
        |ORDER BY c_custkey ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC NULLS FIRST""".stripMargin)
  }

  /** PURE range join (no equi key) at the scale shape: every lineitem
    * matched to the 7-day windows opened by the first 200 orders, by
    * ship date alone. The naive plan is a nested-loop over n×200; the
    * scale plan BINS time into weeks — each interval explodes to the
    * week bins it overlaps (≤ 2 for a 7-day window), each point keys to
    * its one bin, and the join becomes an EQUI-join on the bin followed
    * by the exact range filter. A matching pair shares exactly the
    * point's single bin, so no dedup is needed. The oracle is the plain
    * theta join — binning is plan shape, not semantics.
    */
  val joinRangeBinned: Q = Q(
    "join_range_binned",
    """SELECT o_orderpriority, count(*) AS n,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |FROM lineitem
      |JOIN (SELECT o_orderpriority, o_orderdate,
      |             o_orderdate + INTERVAL 7 DAY AS o_end
      |      FROM orders WHERE o_orderkey <= 200) iv
      |  ON l_shipdate >= o_orderdate AND l_shipdate < o_end
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    def weekBin(c: org.apache.spark.sql.Column) =
      floor(datediff(c, lit("1970-01-01").cast("date")) / 7)
    val iv = T.orders(s, d).filter(col("o_orderkey") <= 200)
      .select(col("o_orderpriority"), col("o_orderdate"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("o_end"))
      .select(col("o_orderpriority"), col("o_orderdate"), col("o_end"),
        explode(sequence(weekBin(col("o_orderdate")), weekBin(col("o_end")))).as("bin"))
    T.lineitem(s, d)
      .select(col("l_shipdate"), col("l_quantity"),
        weekBin(col("l_shipdate")).as("pbin"))
      .join(broadcast(iv),
        col("pbin") === col("bin")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") < col("o_end"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(T.dec2(col("l_quantity"))).as("qty"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  /** As-of join with a staleness tolerance: the matched click must be
    * ≤ 1 hour old at purchase time, else NULL (a stale quote/state is
    * worse than none — the kdb-style `tolerance` knob). Same scalable
    * union + ordered-window idiom as join_asof (one shuffle on
    * user_id, no range self-join); the tolerance is a post-window
    * filter on the carried click timestamp, exact in integer micros.
    */
  val joinAsofTolerance: Q = Q(
    "join_asof_tolerance",
    """WITH ce AS (
      |  SELECT event_id, user_id, ts,
      |         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
      |         CASE WHEN event_type = 'click' THEN ts END AS click_ts,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), w AS (
      |  SELECT event_id, user_id, ts, is_purchase,
      |         last_value(click_id IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY ts, is_purchase, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cid,
      |         last_value(click_ts IGNORE NULLS) OVER (
      |           PARTITION BY user_id
      |           ORDER BY ts, is_purchase, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cts
      |  FROM ce
      |)
      |SELECT event_id, user_id, ts,
      |       CASE WHEN cts IS NOT NULL
      |                 AND epoch_us(ts) - epoch_us(cts) <= 3600000000
      |            THEN cid END AS asof_click_id_1h
      |FROM w WHERE is_purchase = 1
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val ce = T.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "click", col("ts")).as("click_ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ce
      .withColumn("cid", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("cts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("cts").isNotNull
          && unix_micros(col("ts")) - unix_micros(col("cts")) <= 3600000000L,
          col("cid")).as("asof_click_id_1h"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** Nearest-event time join (both directions, ±1 h tolerance): each
    * purchase matched to the temporally CLOSEST click by the same user —
    * the sensor-alignment shape join_asof's backward-only semantics
    * cannot express. Dist-tie → earlier click, then click id.
    *
    * Re-expressed r12 as a TWO-DIRECTION AS-OF over the unioned event
    * stream (the event_attribution device): the former hour-bucket
    * equi-join emitted |purchases_cell| × |clicks_cell| candidate pairs
    * per (user, hour) cell — per-cell density grows with SF, so a
    * heavy-hitter user's cells go quadratic (the r12 skewjoin plan gate
    * flagged it; the r11 "only fact×fact join" grep had missed the
    * composite key). Now: ONE shuffle on user_id + two in-partition
    * sorted window passes. The backward pass orders (t_us ASC, clicks
    * before purchases at equal t_us, event_id ASC) and carries the
    * running max of struct(t_us, −click_id) over clicks — at each
    * purchase that is the latest preceding click, min click_id on µs
    * ties; the forward pass mirrors it descending with
    * struct(−t_us, −click_id) → earliest following click. The nearest
    * within ±1 h is whichever direction's best is closer (the overall
    * nearest IS the within-window nearest whenever one exists); an
    * exact-µs tie between directions goes backward (smaller cts), which
    * is the join's (dist, cts ASC, click_id ASC) order. Null user_id /
    * event_type rows drop exactly as the inner equi-join dropped them.
    * Distances compared as exact integer microseconds. Zero pair
    * enumeration: the hot user costs one sorted partition, not a
    * density-squared candidate set.
    */
  val joinAsofNearest: Q = Q(
    "join_asof_nearest",
    """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS click_id, user_id, ts AS cts
      |      FROM events WHERE event_type = 'click'),
      |cand AS (
      |  SELECT p.purchase_id, p.user_id, c.click_id,
      |         abs(epoch_us(p.pts) - epoch_us(c.cts)) AS dist_us,
      |         row_number() OVER (PARTITION BY p.purchase_id
      |           ORDER BY abs(epoch_us(p.pts) - epoch_us(c.cts)) ASC,
      |                    c.cts ASC, c.click_id ASC) AS rn
      |  FROM p JOIN c ON p.user_id = c.user_id
      |   AND c.cts >= p.pts - INTERVAL 1 HOUR
      |   AND c.cts <= p.pts + INTERVAL 1 HOUR)
      |SELECT purchase_id, user_id, click_id, dist_us
      |FROM cand WHERE rn = 1 ORDER BY purchase_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val st = T.events(s, d)
      .filter(col("user_id").isNotNull && col("ts").isNotNull
        && (col("event_type") === "purchase" || col("event_type") === "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        (col("event_type") === "click").cast("int").as("is_click"),
        col("event_id"))
    // clicks sort BEFORE purchases at equal t_us (is_click DESC), so a
    // click at exactly pts is inside the purchase's backward frame (and
    // the forward one — the join's range bounds are both inclusive)
    val wB = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("is_click").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").desc, col("is_click").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickB = when(col("is_click") === 1,
      struct(col("t_us").as("t"), (-col("event_id")).as("nid")))
    val clickF = when(col("is_click") === 1,
      struct((-col("t_us")).as("nt"), (-col("event_id")).as("nid")))
    val scanned = st
      .withColumn("back", max(clickB).over(wB))
      .withColumn("fwd", max(clickF).over(wF))
    val hourUs = 3600000000L
    val p = scanned.filter(col("is_click") === 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("t_us").as("pts_us"),
        col("back.t").as("bt"), (-col("back.nid")).as("bid"),
        (-col("fwd.nt")).as("ft"), (-col("fwd.nid")).as("fid"))
      .withColumn("db",
        when(col("bt").isNotNull && col("pts_us") - col("bt") <= hourUs,
          col("pts_us") - col("bt")))
      .withColumn("df",
        when(col("ft").isNotNull && col("ft") - col("pts_us") <= hourUs,
          col("ft") - col("pts_us")))
    val backWins = col("db").isNotNull && (col("df").isNull || col("db") <= col("df"))
    p.withColumn("click_id", when(backWins, col("bid"))
        .when(col("df").isNotNull, col("fid")))
      .withColumn("dist_us", when(backWins, col("db"))
        .when(col("df").isNotNull, col("df")))
      .filter(col("click_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("click_id"), col("dist_us"))
      .orderBy(col("purchase_id").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    joinInnerEqui, joinBroadcast, joinLeftOuter, joinFullOuter,
    joinSemi, joinAnti, joinThetaRange, joinAsof, joinAsofTolerance,
    joinCrossSmall, joinSkewSalted, joinLateral, joinRangeBinned,
    joinAsofNearest)
}
