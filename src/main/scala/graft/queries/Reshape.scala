package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A groups 8–9 — generators (UDTF surface), pivot/unpivot,
  * subqueries, CTE.
  */
object Reshape {

  /** Tokenize + explode (Spark's Generator node) → top-20 word counts. */
  val explodeTokens: Q = Q(
    "explode_tokens",
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY n DESC, word ASC NULLS FIRST
      |LIMIT 20""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    T.spreadExplodeInput(s, T.documents(s, d))
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc_nulls_first)
      .limit(20)
  }

  /** Row multiplication via sequence + explode. */
  val generatorSequence: Q = Q(
    "generator_sequence",
    """SELECT l_orderkey, l_linenumber, i
      |FROM lineitem, unnest(generate_series(1, l_linenumber)) AS u(i)
      |WHERE l_orderkey <= 50
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, i NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .filter(col("l_orderkey") <= 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(sequence(lit(1), col("l_linenumber"))).as("i"))
      .orderBy(col("l_orderkey").asc_nulls_first,
        col("l_linenumber").asc_nulls_first, col("i").asc_nulls_first)
  }

  /** inline() — the array-of-structs generator (VERDICT r1 noted its
    * absence): unpivots each order into (k, v) attribute rows in one
    * generator node. Oracle: DuckDB's unnest(…, recursive := true)
    * flattens the struct fields into columns the same way.
    */
  val generatorInline: Q = Q(
    "generator_inline",
    """SELECT * FROM (
      |  SELECT o_orderkey, unnest([{'k': 'prio', 'v': o_orderpriority},
      |                             {'k': 'status', 'v': o_orderstatus}], recursive := true)
      |  FROM orders
      |  WHERE o_orderkey <= 100
      |)
      |ORDER BY o_orderkey NULLS FIRST, k NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"), inline(array(
        struct(lit("prio").as("k"), col("o_orderpriority").as("v")),
        struct(lit("status").as("k"), col("o_orderstatus").as("v")))))
      .orderBy(col("o_orderkey").asc_nulls_first, col("k").asc_nulls_first)
  }

  /** Wide report matrix: rows = user-id bucket, columns = the five known
    * event types (pinned list per D4), values = counts. The oracle uses
    * conditional aggregation — same semantics, no PIVOT column-order
    * ambiguity.
    */
  val pivotWide: Q = Q(
    "pivot_wide",
    """SELECT user_id % 10 AS bucket,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY 1
      |ORDER BY bucket NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = T.events(s, d)
      .groupBy((col("user_id") % 10).as("bucket"))
      .pivot("event_type", types)
      .count()
    // pivot yields NULL for empty cells; the FILTER oracle yields 0.
    types.foldLeft(wide) { (df, t) =>
      df.withColumn(t, coalesce(col(s"`$t`"), lit(0L)))
    }.orderBy(col("bucket").asc_nulls_first)
  }

  /** Inverse reshape: wide per-flag measures → long (flag, measure, val). */
  val unpivotLong: Q = Q(
    "unpivot_long",
    """WITH wide AS (
      |  SELECT l_returnflag,
      |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, 'sum_qty' AS measure, CAST(sum_qty AS DECIMAL(28,2)) AS val FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'sum_price' AS measure, CAST(sum_price AS DECIMAL(28,2)) AS val FROM wide
      |ORDER BY l_returnflag NULLS FIRST, measure NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(T.dec2(col("l_quantity"))).as("sum_qty"),
        sum(T.dec2(col("l_extendedprice"))).as("sum_price"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "measure", "val")
      .withColumn("val", col("val").cast("decimal(28,2)"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("measure").asc_nulls_first)
  }

  /** Uncorrelated scalar subquery. The above-average predicate is
    * multiplied through (price·N > Σprice) so both sides stay exact
    * decimals — no cross-engine division rounding (D2).
    */
  val subqueryScalar: Q = Q(
    "subquery_scalar",
    """SELECT count(*) AS n_above,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS price_above
      |FROM lineitem
      |WHERE CAST(l_extendedprice AS DECIMAL(18,2)) * (SELECT count(*) FROM lineitem)
      |      > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) FROM lineitem)""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d).createOrReplaceTempView("graft_lineitem_sq")
    s.sql(
      """SELECT count(*) AS n_above,
        |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS price_above
        |FROM graft_lineitem_sq
        |WHERE CAST(l_extendedprice AS DECIMAL(18,2)) * (SELECT count(*) FROM graft_lineitem_sq)
        |      > (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) FROM graft_lineitem_sq)""".stripMargin)
  }

  /** Correlated scalar subquery (Catalyst decorrelates to a join):
    * each customer's most expensive order(s). Max is accumulation-free,
    * so the double compares exactly (D2).
    */
  val subqueryCorrelated: Q = Q(
    "subquery_correlated",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("graft_orders_sq")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_orders_sq o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM graft_orders_sq o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin)
  }

  /** CTE referenced twice (plan reuse): nation pairs with equal customer
    * counts.
    */
  val cteReuse: Q = Q(
    "cte_reuse",
    """WITH per_nation AS (
      |  SELECT c_nationkey, count(*) AS n FROM customer GROUP BY c_nationkey
      |)
      |SELECT a.c_nationkey AS nk_a, b.c_nationkey AS nk_b, a.n
      |FROM per_nation a JOIN per_nation b
      |  ON a.n = b.n AND a.c_nationkey < b.c_nationkey
      |ORDER BY nk_a NULLS FIRST, nk_b NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).createOrReplaceTempView("graft_customer_cte")
    s.sql(
      """WITH per_nation AS (
        |  SELECT c_nationkey, count(*) AS n FROM graft_customer_cte GROUP BY c_nationkey
        |)
        |SELECT a.c_nationkey AS nk_a, b.c_nationkey AS nk_b, a.n
        |FROM per_nation a JOIN per_nation b
        |  ON a.n = b.n AND a.c_nationkey < b.c_nationkey
        |ORDER BY nk_a ASC NULLS FIRST, nk_b ASC NULLS FIRST""".stripMargin)
  }

  /** Outer explode: docs whose filtered token list is empty survive
    * with a NULL token (plain explode would drop them). Oracle: LEFT
    * JOIN LATERAL unnest.
    */
  val explodeOuter: Q = Q(
    "explode_outer_tokens",
    """SELECT d.doc_id, t.tok AS long_token
      |FROM (SELECT doc_id,
      |             list_filter(string_split(text, ' '), x -> length(x) > 12) AS xs
      |      FROM documents) d
      |LEFT JOIN LATERAL unnest(d.xs) AS t(tok) ON true
      |ORDER BY d.doc_id NULLS FIRST, long_token ASC NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 12)").as("xs"))
      .select(col("doc_id"), explode_outer(col("xs")).as("long_token"))
      .orderBy(col("doc_id").asc_nulls_first, col("long_token").asc_nulls_first)
  }

  /** Ordinal-preserving explode. Oracle: unnest over an index-zipped
    * struct list (DuckDB has no WITH ORDINALITY in 1.0).
    */
  val generatorPosexplode: Q = Q(
    "generator_posexplode",
    """SELECT x.p_partkey, u.s.p AS pos, u.s.v AS word
      |FROM (SELECT p_partkey, string_split(p_type, ' ') AS xs
      |      FROM part WHERE p_partkey <= 100) x,
      |     unnest(list_transform(generate_series(1, len(x.xs)),
      |                           i -> {'p': i - 1, 'v': x.xs[i]})) AS u(s)
      |ORDER BY p_partkey NULLS FIRST, pos NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.part(s, d)
      .filter(col("p_partkey") <= 100)
      .select(col("p_partkey"),
        posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
      .orderBy(col("p_partkey").asc_nulls_first, col("pos").asc_nulls_first)
  }

  /** IN / NOT IN predicate subqueries — the other decorrelation path
    * (RewritePredicateSubquery → semi/anti) next to the EXISTS forms in
    * join_semi/join_anti. Both inner keys are non-null, so NOT IN's
    * three-valued-logic trap is not in play (D4 keeps it deterministic).
    */
  val subqueryIn: Q = Q(
    "subquery_in",
    """SELECT o_orderkey, o_custkey
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY')
      |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
      |                         WHERE l_quantity > 45)
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 500""".stripMargin
  ) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("orders")
    T.customer(s, d).createOrReplaceTempView("customer")
    T.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'MACHINERY')
        |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
        |                         WHERE l_quantity > 45)
        |ORDER BY o_orderkey ASC NULLS FIRST
        |LIMIT 500""".stripMargin)
  }

  /** WITH RECURSIVE (Spark 4 gained it) — a recursive bucket spine
    * LEFT-joined to the price histogram, so empty buckets still appear.
    * Same SQL text runs on both engines; Spark executes through the
    * SQL entry point.
    */
  private val cteRecursiveSql =
    """WITH RECURSIVE buckets(b) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT b + 1 FROM buckets WHERE b < 11
      |)
      |SELECT b, count(o_orderkey) AS n
      |FROM buckets LEFT JOIN orders
      |  ON CAST(least(floor(o_totalprice / 50000), 11) AS BIGINT) = b
      |GROUP BY b
      |ORDER BY b NULLS FIRST""".stripMargin

  val cteRecursive: Q = Q("cte_recursive", cteRecursiveSql) { (s, d) =>
    T.orders(s, d).createOrReplaceTempView("orders")
    s.sql(cteRecursiveSql)
  }

  val all: Seq[Q] = Seq(
    explodeTokens, generatorSequence, generatorInline, pivotWide, unpivotLong,
    subqueryScalar, subqueryCorrelated, subqueryIn, cteReuse, cteRecursive,
    explodeOuter, generatorPosexplode)
}
