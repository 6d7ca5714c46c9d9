package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 3 — aggregation shapes. Decimal per D2; doubles
  * that lack a decimal path (stddev/var/avg) are rounded to 6 dp in both
  * engines.
  */
object Aggregates {

  /** TPC-H Q1 shape — the flagship (M0). */
  val aggHashGroup: Q = Q(
    "agg_hash_group",
    """SELECT l_returnflag, l_linestatus,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(T.dec2(col("l_quantity"))).as("sum_qty"),
        sum(T.dec2(col("l_extendedprice"))).as("sum_base_price"),
        sum(T.dec2(col("l_extendedprice")) * (lit(1) - T.dec4(col("l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val aggMultiKey: Q = Q(
    "agg_multi_key",
    """SELECT year(o_orderdate) AS order_year, o_orderstatus, o_orderpriority,
      |       count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |FROM orders
      |GROUP BY 1, 2, 3
      |ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("order_year"),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(T.dec2(col("o_totalprice"))).as("total"))
      .orderBy(col("order_year").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  val aggDistinct: Q = Q(
    "agg_distinct",
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  val aggFilterClause: Q = Q(
    "agg_filter_clause",
    """SELECT l_returnflag,
      |       count(*) AS n_all,
      |       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_quantity >= 25) AS big_qty_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
        sum(when(col("l_quantity") >= 25, T.dec2(col("l_extendedprice"))))
          .as("big_qty_price"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  val aggRollup: Q = Q(
    "agg_rollup",
    """SELECT r_name, n_name,
      |       grouping(r_name) AS g_r, grouping(n_name) AS g_n,
      |       count(*) AS n_cust, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_r, g_n, r_name NULLS LAST, n_name NULLS LAST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).as("g_r"),
        grouping(col("n_name")).as("g_n"),
        count(lit(1)).as("n_cust"),
        sum(T.dec2(col("c_acctbal"))).as("bal"))
      .orderBy(col("g_r").asc, col("g_n").asc,
        col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
  }

  val aggCube: Q = Q(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus,
      |       grouping(l_returnflag) AS g_f, grouping(l_linestatus) AS g_s,
      |       count(*) AS n, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY g_f, g_s, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_f"),
        grouping(col("l_linestatus")).as("g_s"),
        count(lit(1)).as("n"),
        sum(T.dec2(col("l_quantity"))).as("qty"))
      .orderBy(col("g_f").asc, col("g_s").asc,
        col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
  }

  val aggGroupingSets: Q = Q(
    "agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |       grouping(o_orderstatus) AS g_s, grouping(o_orderpriority) AS g_p,
      |       count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_s, g_p, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("graft_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       grouping(o_orderstatus) AS g_s, grouping(o_orderpriority) AS g_p,
        |       count(*) AS n
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_s, g_p, o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""".stripMargin)
  }

  val aggStats: Q = Q(
    "agg_stats",
    """SELECT l_returnflag,
      |       round(min(l_quantity), 6) AS min_qty,
      |       round(max(l_quantity), 6) AS max_qty,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(stddev_samp(l_quantity), 6) AS sd_qty,
      |       round(var_samp(l_quantity), 6) AS var_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(col("l_quantity")), 6).as("min_qty"),
        round(max(col("l_quantity")), 6).as("max_qty"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  val aggTopGroups: Q = Q(
    "agg_top_groups",
    """SELECT c_mktsegment, c_nationkey, count(*) AS n_cust
      |FROM customer
      |GROUP BY c_mktsegment, c_nationkey
      |HAVING count(*) > 10
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("n_cust") > 10)
      .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    aggHashGroup, aggMultiKey, aggDistinct, aggFilterClause, aggRollup,
    aggCube, aggGroupingSets, aggStats, aggTopGroups)
}
