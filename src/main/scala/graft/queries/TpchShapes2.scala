package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q13, Q15, Q16,
  * Q17, Q20, Q21, Q22), adapted to the reduced schemas — with
  * `TpchShapes` this completes all 22 TPC-H shapes. The test tables
  * have no partsupp / phone / commitdate, so where the original leans
  * on those the adaptation preserves the SHAPE (the plan-level
  * challenge: correlated scalar aggregates, min-join-back, EXISTS /
  * NOT EXISTS self-joins, NOT IN, two-level aggregation) on the
  * columns that exist. Determinism discipline as in `TpchShapes`:
  * money sums in exact DECIMAL (D2), one final double division,
  * explicit NULLS FIRST/LAST, a total ORDER BY before every LIMIT;
  * `Q.stabilize` emits decimal finals as DOUBLE and each oracle
  * mirrors with CAST(... AS DOUBLE).
  */
object TpchShapes2 {

  private def vol6 = (T.dec2(col("l_extendedprice"))
    * (lit(1) - T.dec4(col("l_discount")))).cast("decimal(18,6)")

  /** Q2 (adapted): min-cost supplier. partsupp's supply cost becomes
    * the minimum observed line price per (part, supplier); the SHAPE —
    * a correlated scalar min over a region-restricted join, answered
    * by aggregate-once-and-join-back instead of a per-row subquery —
    * is the point. At scale: one shuffle builds the (part, supplier)
    * cost table, one partial-aggregable min per part, equi-join back.
    */
  val tpchQ2: Q = Q(
    "tpch_q2",
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eur AS (
      |  SELECT l_partkey, l_suppkey, supplycost, s_acctbal, s_name, n_name
      |  FROM cost JOIN supplier ON s_suppkey = l_suppkey
      |            JOIN nation ON s_nationkey = n_nationkey
      |            JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey,
      |       CAST(supplycost AS DOUBLE) AS supplycost
      |FROM part JOIN eur ON p_partkey = l_partkey
      |WHERE p_size BETWEEN 1 AND 10 AND p_type = 'LARGE'
      |  AND supplycost = (SELECT min(e2.supplycost) FROM eur e2
      |                    WHERE e2.l_partkey = p_partkey)
      |ORDER BY s_acctbal DESC NULLS LAST, n_name NULLS FIRST,
      |         s_name NULLS FIRST, p_partkey
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    // the selective part predicate (size 1–10 AND type LARGE) is
    // independent of the correlated min, so a LEFT SEMI against the
    // filtered part keys prunes the cost aggregate's INPUT — lineitem
    // rows for non-candidate parts never enter the (part, supplier)
    // aggregation, the supplier joins, or the min — instead of
    // filtering only after the min-join-back (the r4 plan).
    val partF = T.part(s, d)
      .filter(col("p_size").between(1, 10) && col("p_type") === "LARGE")
    val cost = T.lineitem(s, d)
      .join(broadcast(partF.select(col("p_partkey").as("fk"))),
        col("l_partkey") === col("fk"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(T.dec2(col("l_extendedprice"))).as("supplycost"))
    val eur = cost
      .join(T.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
    val minCost = eur.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("supplycost")).as("mincost"))
    eur
      .join(minCost,
        col("l_partkey") === col("mk") && col("supplycost") === col("mincost"))
      .join(broadcast(partF), col("p_partkey") === col("l_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("supplycost"))
      .orderBy(col("s_acctbal").desc_nulls_last, col("n_name").asc_nulls_first,
        col("s_name").asc_nulls_first, col("p_partkey"))
      .limit(100)
  }

  /** Q8: national market share — conditional share of a decimal sum,
    * divided ONCE as double. Two nation roles (customer's for the
    * region gate, supplier's for the share) join as independent
    * broadcast copies.
    */
  val tpchQ8: Q = Q(
    "tpch_q8",
    """SELECT o_year,
      |       CAST(sum(CASE WHEN nation = 'NATION_7' THEN volume
      |                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |         / CAST(sum(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l_discount AS DECIMAL(18,4)))
      |              AS DECIMAL(18,6)) AS volume,
      |         n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= DATE '1996-01-01'
      |    AND o_orderdate <= DATE '1997-12-31'
      |) t
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin
  ) { (s, d) =>
    val n1 = T.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val n2 = T.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    T.part(s, d).filter(col("p_type") === "ECONOMY")
      .join(T.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(T.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(T.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date")
            && col("o_orderdate") <= lit("1997-12-31").cast("date")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
        col("c_rk") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        vol6.as("volume"), col("nation"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("nation") === "NATION_7", col("volume"))
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
        / sum(col("volume")).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q9 (adapted): product-type profit. partsupp's supply cost becomes
    * retail cost (p_retailprice × quantity); the SHAPE — a 5-table
    * join grouped by (nation, year) over a LIKE-filtered part set —
    * is preserved. Both products pinned to DECIMAL(18,6) pre-sum.
    */
  val tpchQ9: Q = Q(
    "tpch_q9",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
      |                     AS DECIMAL(18,6))
      |                - CAST(CAST(p_retailprice AS DECIMAL(18,2))
      |                       * CAST(l_quantity AS DECIMAL(18,2))
      |                       AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE 'red%'
      |GROUP BY 1, 2
      |ORDER BY nation NULLS FIRST, o_year DESC""".stripMargin
  ) { (s, d) =>
    val amount = vol6 - (T.dec2(col("p_retailprice"))
      * T.dec2(col("l_quantity"))).cast("decimal(18,6)")
    T.part(s, d).filter(col("p_name").like("red%"))
      .join(T.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(T.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation").asc_nulls_first, col("o_year").desc)
  }

  /** Q11 (adapted): important stock — per-part value vs a scalar
    * threshold (2× the mean part value — scale-FREE, unlike the
    * original's fixed fraction, which empties as the part count
    * grows). The threshold subquery is a 1-row aggregate broadcast
    * against the grouped frame; at scale both sides partial-aggregate
    * map-side and the 1-row side is free.
    */
  val tpchQ11: Q = Q(
    "tpch_q11",
    """WITH val AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |                JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_3', 'NATION_7')
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_key, CAST(part_value AS DOUBLE) AS part_value
      |FROM val
      |WHERE CAST(part_value AS DOUBLE) >
      |      (SELECT 2.0 * (CAST(sum(v2.part_value) AS DOUBLE) / count(*))
      |       FROM val v2)
      |ORDER BY part_value DESC NULLS LAST, p_key""".stripMargin
  ) { (s, d) =>
    val nat = broadcast(T.nation(s, d)
      .filter(col("n_name").isin("NATION_3", "NATION_7")))
    val valDf = T.lineitem(s, d)
      .join(T.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(T.dec2(col("l_extendedprice"))).as("part_value"))
    val threshold = valDf
      .agg((lit(2.0) * (sum(col("part_value")).cast("double")
        / count(lit(1)).cast("double"))).as("thr"))
    valDf.crossJoin(broadcast(threshold))
      .filter(col("part_value").cast("double") > col("thr"))
      .select(col("l_partkey").as("p_key"), col("part_value"))
      .orderBy(col("part_value").desc_nulls_last, col("p_key"))
  }

  /** Q13: customer order-count distribution — the left-outer join with
    * a predicate INSIDE the join condition (so zero-order customers
    * survive), then a two-level aggregation. count(o_orderkey) counts
    * matches only — BIGINT on both engines.
    */
  val tpchQ13: Q = Q(
    "tpch_q13",
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d),
        col("c_custkey") === col("o_custkey")
          && col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q15: top supplier — the aggregate-reused-twice shape (revenue view
    * feeds both the max scalar and the equality probe). Decimal
    * equality against the max is exact, so no epsilon games.
    */
  val tpchQ15: Q = Q(
    "tpch_q15",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l_discount AS DECIMAL(18,4)))
      |              AS DECIMAL(18,6))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val revenue = T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date")
        && col("l_shipdate") < lit("1996-04-01").cast("date"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(vol6).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
    T.supplier(s, d)
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q16 (adapted): supplier count per part attribute — partsupp
    * becomes the DISTINCT (part, supplier) pairs observed in lineitem;
    * the NOT IN exclusion (negative-balance suppliers) is a broadcast
    * anti join; count(DISTINCT) shuffles once on the group keys.
    * Both broadcast filters (part semi, bad-supplier anti) run BEFORE
    * the distinct — they are map-side, so reordering is free and the
    * distinct's shuffle carries only candidate-part pairs (~the part
    * filter's selectivity) instead of every (part, supplier) pair.
    */
  val tpchQ16: Q = Q(
    "tpch_q16",
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 2, 3, 5, 8, 13, 21, 34)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand NULLS FIRST, p_type NULLS FIRST,
      |         p_size""".stripMargin
  ) { (s, d) =>
    val goodPart = T.part(s, d)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 2, 3, 5, 8, 13, 21, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = T.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val ps = T.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(goodPart.select(col("p_partkey").as("gk"))),
        col("l_partkey") === col("gk"), "left_semi")
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .distinct()
    ps
      .join(broadcast(goodPart), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc_nulls_first,
        col("p_type").asc_nulls_first, col("p_size"))
  }

  /** Q17: small-quantity revenue — the correlated scalar avg, answered
    * by aggregating lineitem per part ONCE and equi-joining back
    * (never a per-row subquery). The threshold is one double
    * expression evaluated identically on both engines.
    */
  val tpchQ17: Q = Q(
    "tpch_q17",
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |            / 7.0 AS DOUBLE) AS avg_yearly,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
      |  AND l_quantity <
      |      (SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |                     / count(*))
      |       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin
  ) { (s, d) =>
    val perPart = T.lineitem(s, d)
      .groupBy(col("l_partkey").as("ak"))
      .agg((sum(T.dec2(col("l_quantity"))).cast("double")
        / count(lit(1)).cast("double")).as("avg_q"))
    T.lineitem(s, d)
      .join(broadcast(T.part(s, d)
          .filter(col("p_brand") === "Brand#11" && col("p_type") === "SMALL")),
        col("p_partkey") === col("l_partkey"))
      .join(perPart, col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_q"))
      .agg((sum(T.dec2(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** Q20 (adapted): part promotion — the nested-IN chain. "Available
    * quantity exceeds half of shipped" becomes "the supplier's 1996
    * shipments of promoted (red) parts exceed 20% of their all-time
    * shipments of them" — a share threshold that stays selective at
    * every SF (the per-(supp,part) variant degenerates: sparse groups
    * have one row, so any 1996 row qualifies). The plan is
    * part-filter → semi join → grouped conditional sums → semi join,
    * all equi-keyed.
    */
  val tpchQ20: Q = Q(
    "tpch_q20",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |  GROUP BY l_suppkey
      |  HAVING CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01'
      |                        AND l_shipdate < DATE '1997-01-01'
      |                       THEN CAST(l_quantity AS DECIMAL(18,2))
      |                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |         > 0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val redParts = T.part(s, d)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val in96 = col("l_shipdate") >= lit("1996-01-01").cast("date") &&
      col("l_shipdate") < lit("1997-01-01").cast("date")
    val qualifying = T.lineitem(s, d)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(
        sum(when(in96, T.dec2(col("l_quantity")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q96"),
        sum(T.dec2(col("l_quantity"))).as("qall"))
      .filter(col("q96").cast("double") > lit(0.2) * col("qall").cast("double"))
      .select(col("l_suppkey"))
    T.supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Q21 (adapted): suppliers who kept waiting — the EXISTS +
    * NOT EXISTS self-join pair on lineitem. With no commit/receipt
    * dates, "late" becomes "returned" (l_returnflag = 'R'): the sole
    * returned supplier in a multi-supplier finished order. Both
    * quantifiers are hash semi/anti joins on l_orderkey with the
    * supplier inequality as a post-probe filter — no nested loop.
    */
  val tpchQ21: Q = Q(
    "tpch_q21",
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    val others = T.lineitem(s, d)
      .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
    val othersR = T.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
    T.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(T.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(others,
        col("k2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"),
        "left_semi")
      .join(othersR,
        col("k3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"),
        "left_anti")
      .join(broadcast(T.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc_nulls_first)
      .limit(100)
  }

  /** Q22 (adapted): global sales opportunity — phone country codes
    * become nationkey buckets (c_nationkey % 7) and "no orders"
    * becomes "no orders since 2000" (every sf0.01 customer has SOME
    * order). The shape survives intact: uncorrelated scalar avg over
    * the positive-balance subset, anti join against orders, grouped
    * rollup of the survivors.
    */
  val tpchQ22: Q = Q(
    "tpch_q22",
    """WITH pot AS (
      |  SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode, c_custkey, c_acctbal
      |  FROM customer
      |  WHERE c_nationkey % 7 IN (1, 2, 3, 5))
      |SELECT cntrycode, count(*) AS numcust,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM pot
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(p2.c_acctbal AS DECIMAL(18,2)))
      |                               AS DOUBLE) / count(*)
      |                   FROM pot p2 WHERE p2.c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= DATE '2000-01-01')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin
  ) { (s, d) =>
    val pot = T.customer(s, d)
      .filter((col("c_nationkey") % 7).isin(1, 2, 3, 5))
      .select((col("c_nationkey") % 7).cast("long").as("cntrycode"),
        col("c_custkey"), col("c_acctbal"))
    val avgBal = pot.filter(col("c_acctbal") > 0.0)
      .agg((sum(T.dec2(col("c_acctbal"))).cast("double")
        / count(lit(1)).cast("double")).as("avg_bal"))
    val recent = T.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey"))
    pot.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(T.dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  val all: Seq[Q] = Seq(tpchQ2, tpchQ8, tpchQ9, tpchQ11, tpchQ13,
    tpchQ15, tpchQ16, tpchQ17, tpchQ20, tpchQ21, tpchQ22)
}
