package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A groups 1–6: scans/projection/filtering, joins,
  * aggregation, windows, sort/limit, set operations.
  *
  * Determinism discipline (SURVEY §2 D1–D6): every query is totally
  * ordered by a unique key suffix, money math is DECIMAL, null order is
  * explicit, and no nondeterministic operators appear.
  */
object Relational {

  /** TPC-H Q1 shape — the flagship (M0). Decimal per D2. */
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

  val all: Seq[Q] = Seq(aggHashGroup)
}
