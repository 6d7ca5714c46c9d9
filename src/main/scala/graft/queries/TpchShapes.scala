package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Full TPC-H-shape pipeline queries (Q1/Q3/Q5 on the reduced schemas)
  * — the composition proof that the operator rows assemble into
  * realistic multi-join/agg/sort pipelines, and the bench anchors
  * BASELINE.md §6 measured for DuckDB. Determinism: money math in
  * DECIMAL(18,2/4) end to end (D2); averages computed as ONE double
  * division of exact operands (engine-native avg(DECIMAL) folds in
  * engine-specific order); Q.stabilize emits the decimal finals as
  * DOUBLE.
  */
object TpchShapes {

  /** Q1: pricing summary report over lineitem. */
  val tpchQ1: Q = Q(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS sum_disc_price,
      |       sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))
      |           * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,6))) AS sum_charge,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_qty,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_price,
      |       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val disc1 = lit(1) - T.dec4(col("l_discount"))
    val tax1 = lit(1) + T.dec4(col("l_tax"))
    T.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(T.dec2(col("l_quantity"))).as("sum_qty"),
        sum(T.dec2(col("l_extendedprice"))).as("sum_base_price"),
        sum(T.dec2(col("l_extendedprice")) * disc1).as("sum_disc_price"),
        // the 3-factor product carries engine-specific intermediate
        // scale (Spark reduces to 6, DuckDB keeps 10) — pin it to (18,6)
        // before summing so both engines sum identical addends
        sum((T.dec2(col("l_extendedprice")) * disc1 * tax1)
          .cast("decimal(18,6)")).as("sum_charge"),
        (sum(T.dec2(col("l_quantity"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_qty"),
        (sum(T.dec2(col("l_extendedprice"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_price"),
        (sum(T.dec4(col("l_discount"))).cast("double")
          / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Q3: shipping-priority revenue top-10 (no o_shippriority in the
    * reduced schema — grouped by orderkey + orderdate).
    */
  val tpchQ3: Q = Q(
    "tpch_q3",
    """SELECT l_orderkey,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS revenue,
      |       o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1995-03-15'
      |  AND l_shipdate > DATE '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey NULLS FIRST
      |LIMIT 10""".stripMargin
  ) { (s, d) =>
    val cutoff = lit("1995-03-15").cast("date")
    T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(T.orders(s, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(T.dec2(col("l_extendedprice"))
        * (lit(1) - T.dec4(col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc_nulls_first)
      .limit(10)
  }

  /** Q5: local-supplier revenue by nation for one region and year
    * (customer and supplier in the same nation; reduced schema keeps
    * all Q5 joins: customer→orders→lineitem→supplier→nation→region;
    * year window shifted to 1996 — this corpus starts at 1995).
    */
  val tpchQ5: Q = Q(
    "tpch_q5",
    """SELECT n_name,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |              JOIN supplier ON l_suppkey = s_suppkey
      |                           AND c_nationkey = s_nationkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // Join order puts BOTH selective filters ahead of the big shuffles:
    // region('ASIA')⋈nation collapses to a 5-row broadcast that prunes
    // customer to 1/5 before it ever meets orders, and the date filter
    // prunes orders at the scan. Supplier carries no broadcast hint on
    // purpose: the planner decides from stats. Plan-shape note (r6
    // audit): at sf0.1 the planner broadcasts the column-pruned
    // lineitem itself (4-column estimate ≈ 7 MB < the 10 MB threshold)
    // — zero fact-table shuffles at toy scale; at 100 TB the same
    // declarative plan exceeds the threshold and becomes the intended
    // orderkey SMJ that shuffles only date-qualified rows. Both are
    // the right plan for their scale, chosen by stats/AQE rather than
    // hard-coded (measured r6: 0.90 s warm, 1.10× the r4 median —
    // inside the box-variance band, no regression).
    val asiaNations = T.nation(s, d)
      .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    T.customer(s, d)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .join(T.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date")
            && col("o_orderdate") < lit("1997-01-01").cast("date")),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(T.supplier(s, d),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(T.dec2(col("l_extendedprice"))
        * (lit(1) - T.dec4(col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc_nulls_first)
  }

  /** Q7: volume shipping between two nations by ship year — the
    * bidirectional 6-table join. Both nation filters are pushed INTO
    * supplier and customer through 2-row broadcasts before the
    * lineitem/orders shuffles, so the big joins only move rows that can
    * still qualify; the OR of the two direction pairs filters after
    * both sides are labeled.
    */
  val tpchQ7: Q = Q(
    "tpch_q7",
    """SELECT supp_nation, cust_nation, l_year, sum(volume) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val nat = T.nation(s, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
    val supp = T.supplier(s, d)
      .join(broadcast(nat.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = T.customer(s, d)
      .join(broadcast(nat.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("c_nk"))
      .select(col("c_custkey"), col("cust_nation"))
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date")
        && col("l_shipdate") < lit("1998-01-01").cast("date"))
      .join(supp, col("s_suppkey") === col("l_suppkey"))
      .join(T.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("c_custkey") === col("o_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(T.dec2(col("l_extendedprice"))
        * (lit(1) - T.dec4(col("l_discount")))).as("revenue"))
      .orderBy(col("supp_nation").asc_nulls_first, col("cust_nation").asc_nulls_first,
        col("l_year").asc_nulls_first)
  }

  /** Q10: returned-item reporting — top-20 customers by revenue lost to
    * returns in one quarter. Both selective predicates (order-date
    * window, returnflag = 'R') are pushed to their scans; nation is a
    * broadcast.
    */
  val tpchQ10: Q = Q(
    "tpch_q10",
    """SELECT c_custkey, c_name,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS revenue,
      |       n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey NULLS FIRST
      |LIMIT 20""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(T.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date")
            && col("o_orderdate") < lit("1996-04-01").cast("date")),
        col("c_custkey") === col("o_custkey"))
      .join(T.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(T.dec2(col("l_extendedprice"))
        * (lit(1) - T.dec4(col("l_discount")))).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc_nulls_first)
      .limit(20)
  }

  /** Q4 (adapted): order-priority checking — count orders in a quarter
    * having at least one returned lineitem. The reduced schema has no
    * commit/receipt dates, so the EXISTS predicate tests returnflag;
    * the SHAPE is the point: an EXISTS decorrelated to a left-semi
    * join, never a count-then-filter. At scale the semi join shuffles
    * only (orderkey) pairs, and the date filter prunes orders first.
    */
  val tpchQ4: Q = Q(
    "tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date")
        && col("o_orderdate") < lit("1996-10-01").cast("date"))
      .join(T.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  /** Q6: forecasting revenue change — the pure single-scan aggregate.
    * Every predicate reaches the parquet scan (PushedFilters); no
    * shuffle except the final 1-row reduction.
    */
  val tpchQ6: Q = Q(
    "tpch_q6",
    """SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * CAST(l_discount AS DECIMAL(18,4))) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date")
        && col("l_shipdate") < lit("1997-01-01").cast("date")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(T.dec2(col("l_extendedprice")) * T.dec4(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q12 (adapted): shipping-mode priority split — the reduced schema
    * has no l_shipmode, so the group key is l_linestatus; the SHAPE is
    * the conditional aggregation (urgent/non-urgent CASE folded into
    * two sums over one join pass, not two joins).
    */
  val tpchQ12: Q = Q(
    "tpch_q12",
    """SELECT l_linestatus,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    T.orders(s, d)
      .join(T.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("date")
            && col("l_shipdate") < lit("1997-01-01").cast("date")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(urgent, 1).otherwise(0)).cast("long").as("high_line_count"),
        sum(when(!urgent, 1).otherwise(0)).cast("long").as("low_line_count"))
      .orderBy(col("l_linestatus").asc_nulls_first)
  }

  /** Q14: promotion-effect revenue share — one month of lineitem joined
    * to part, promo share as a ratio of two exact decimal sums divided
    * once as DOUBLE (D2). Both CASE branches pinned to DECIMAL(18,6) so
    * the engines sum identical addends.
    */
  val tpchQ14: Q = Q(
    "tpch_q14",
    """SELECT 100 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                      * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6))
      |                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
      |       / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |                  * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)))
      |              AS DOUBLE) AS promo_revenue_pct,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'""".stripMargin
  ) { (s, d) =>
    val rev6 = (T.dec2(col("l_extendedprice"))
      * (lit(1) - T.dec4(col("l_discount")))).cast("decimal(18,6)")
    T.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("date")
        && col("l_shipdate") < lit("1996-10-01").cast("date"))
      .join(T.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100) * sum(when(col("p_type") === "PROMO", rev6)
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("double")
          / sum(rev6).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  /** Q18: large-volume customers — the HAVING-subquery shape. The IN
    * subquery is the same aggregate the outer query re-groups, so the
    * scale plan is: aggregate lineitem ONCE on orderkey (one shuffle),
    * semi-join orders against the qualifying keys, then re-join for the
    * customer rollup. Top-100 bounded output.
    */
  val tpchQ18: Q = Q(
    "tpch_q18",
    """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120)
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    // every GROUP BY key is functionally determined by o_orderkey
    // (orders is unique per key), so the HAVING subquery's per-order
    // aggregate IS the output aggregate: one lineitem scan, one
    // shuffle, and the filtered (rare) big orders join back — instead
    // of the naive plan's second lineitem scan + re-aggregation of the
    // joined rows. The rollup sums LONGS, not decimals: l_quantity is
    // integral by the TPC-H data contract (1..50), so the long sum is
    // value-identical to the declared DECIMAL(18,2) sum (and exact /
    // order-independent like it) at a fraction of the codegen cost —
    // and if the contract ever breaks, the oracle hash-compare fails
    // loudly rather than drifting.
    val qty = T.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 120)
    T.orders(s, d)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(T.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc_nulls_first)
      .limit(100)
  }

  /** Q19: discounted revenue over OR-of-ANDs brand/size/quantity
    * predicates — the disjunctive-pushdown shape: the per-table halves
    * of the disjunction (p_brand+p_size on part, l_quantity bounds on
    * lineitem) must reach their scans as a derived OR filter, with the
    * full disjunction re-checked after the join.
    */
  val tpchQ19: Q = Q(
    "tpch_q19",
    """SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin
  ) { (s, d) =>
    val pred =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15)
        && col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 25)
        && col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 35)
        && col("l_quantity") >= 20 && col("l_quantity") <= 30)
    T.lineitem(s, d)
      .join(T.part(s, d), col("p_partkey") === col("l_partkey"))
      .filter(pred)
      .agg(sum(T.dec2(col("l_extendedprice"))
        * (lit(1) - T.dec4(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val all: Seq[Q] = Seq(tpchQ1, tpchQ3, tpchQ5, tpchQ7, tpchQ10,
    tpchQ4, tpchQ6, tpchQ12, tpchQ14, tpchQ18, tpchQ19)
}
