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
    // prunes orders at the scan. The two remaining SMJs (custkey,
    // orderkey) then shuffle only qualifying rows. Supplier carries no
    // broadcast hint on purpose: at this SF the planner broadcasts it
    // from parquet stats, at 100 TB AQE decides from the runtime size —
    // the adaptive choice, not a hard-coded one.
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

  val all: Seq[Q] = Seq(tpchQ1, tpchQ3, tpchQ5, tpchQ7, tpchQ10)
}
