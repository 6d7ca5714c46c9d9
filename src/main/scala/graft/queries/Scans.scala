package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 1 — scans, projection, filtering, conditionals. */
object Scans {

  val scanCount: Q = Q(
    "scan_count",
    "SELECT count(*) AS n FROM lineitem"
  ) { (s, d) =>
    T.lineitem(s, d).agg(count(lit(1)).as("n"))
  }

  val projectExpr: Q = Q(
    "project_expr",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS net_price,
      |       CAST(l_quantity AS INTEGER) AS qty_int,
      |       upper(l_returnflag) AS flag_uc
      |FROM lineitem
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
      |         l_partkey NULLS FIRST, l_suppkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    // lineitem's unique key is the 4-tuple incl. part/supp keys (D1):
    // (l_orderkey, l_linenumber) alone has ~20% duplicates in this data.
    T.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        (T.dec2(col("l_extendedprice")) * (lit(1) - T.dec4(col("l_discount"))))
          .as("net_price"),
        col("l_quantity").cast("int").as("qty_int"),
        upper(col("l_returnflag")).as("flag_uc"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("l_partkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)
      .limit(100)
  }

  val filterPred: Q = Q(
    "filter_pred",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
      |FROM orders
      |WHERE (o_orderpriority IN ('1-URGENT', '2-HIGH')
      |       AND o_totalprice BETWEEN 10000 AND 200000
      |       AND NOT (o_orderstatus = 'P'))
      |   OR o_orderpriority LIKE '5-%'
      |ORDER BY o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .filter(
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_totalprice").between(10000, 200000)
          && !(col("o_orderstatus") === "P"))
          || col("o_orderpriority").like("5-%"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey").asc_nulls_first)
  }

  val exprCaseWhen: Q = Q(
    "expr_case_when",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS band,
      |       count(*) AS n,
      |       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
      |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
      |FROM orders
      |GROUP BY 1
      |ORDER BY band NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .withColumn("band",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n"),
        sum(T.dec2(col("o_totalprice"))).as("total"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"))
      .orderBy(col("band").asc_nulls_first)
  }

  val fnConditional: Q = Q(
    "fn_conditional",
    """SELECT o_orderkey,
      |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
      |       CAST(least(CAST(o_totalprice AS DECIMAL(18,2)), CAST(100000 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS capped,
      |       CAST(greatest(CAST(o_totalprice AS DECIMAL(18,2)), CAST(50000 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS floored
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING"))
          .as("status_norm"),
        least(T.dec2(col("o_totalprice")), T.dec2(lit(100000))).as("capped"),
        greatest(T.dec2(col("o_totalprice")), T.dec2(lit(50000))).as("floored"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(100)
  }

  val all: Seq[Q] =
    Seq(scanCount, projectExpr, filterPred, exprCaseWhen, fnConditional)
}
