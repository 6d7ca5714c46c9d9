package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 sixth wave: warehouse-audit and SQL-surface depth —
  * referential-integrity orphan audit (the FK check every nightly
  * import runs), null-safe equality join (<=> / IS NOT DISTINCT FROM),
  * bitwise aggregates (bit_or/bit_and/bit_xor), and the nth_value
  * window accessor. All exact-integer semantics — no float surface at
  * all in this wave.
  */
object MiscOps2 {

  /** Referential-integrity audit over the star schema's FK edges:
    * child-row count and orphan count (child key with no parent) per
    * relationship — the nightly gate between "loaded" and "trustable".
    * Each check is one anti-join aggregate; at 100 TB the parent side
    * of dimension FKs broadcasts, and fact→fact (lineitem→orders)
    * shuffles on the already-partitioned join key. Output is one row
    * per FK edge, integer-only.
    */
  val dqReferential: Q = Q(
    "dq_referential",
    """WITH checks AS (
      |  SELECT 'customer->nation' AS fk,
      |         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
      |         (SELECT CAST(count(*) AS BIGINT) FROM customer c
      |            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |            WHERE n.n_nationkey IS NULL) AS n_orphan
      |  UNION ALL
      |  SELECT 'lineitem->orders',
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |            LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |            WHERE o.o_orderkey IS NULL)
      |  UNION ALL
      |  SELECT 'lineitem->part',
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
      |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |            LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |            WHERE p.p_partkey IS NULL)
      |  UNION ALL
      |  SELECT 'orders->customer',
      |         (SELECT CAST(count(*) AS BIGINT) FROM orders),
      |         (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |            WHERE c.c_custkey IS NULL)
      |  UNION ALL
      |  SELECT 'supplier->nation',
      |         (SELECT CAST(count(*) AS BIGINT) FROM supplier),
      |         (SELECT CAST(count(*) AS BIGINT) FROM supplier s
      |            LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      |            WHERE n.n_nationkey IS NULL))
      |SELECT fk, n_child, n_orphan, n_orphan = 0 AS ok
      |FROM checks ORDER BY fk NULLS FIRST""".stripMargin
  ) { (s, d) =>
    def check(fk: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
      val p = (if (bcast) broadcast(parent) else parent)
        .select(col(pk).as("__pk"))
      val orphans = child.select(col(ck))
        .join(p, col(ck) === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphan"))
      child.agg(count(lit(1)).as("n_child")).crossJoin(broadcast(orphans))
        .select(lit(fk).as("fk"), col("n_child"), col("n_orphan"),
          (col("n_orphan") === 0).as("ok"))
    }
    check("customer->nation", T.customer(s, d), "c_nationkey",
        T.nation(s, d), "n_nationkey", bcast = true)
      .unionAll(check("lineitem->orders", T.lineitem(s, d), "l_orderkey",
        T.orders(s, d), "o_orderkey", bcast = false))
      .unionAll(check("lineitem->part", T.lineitem(s, d), "l_partkey",
        T.part(s, d), "p_partkey", bcast = false))
      .unionAll(check("orders->customer", T.orders(s, d), "o_custkey",
        T.customer(s, d), "c_custkey", bcast = false))
      .unionAll(check("supplier->nation", T.supplier(s, d), "s_nationkey",
        T.nation(s, d), "n_nationkey", bcast = true))
      .orderBy(col("fk").asc_nulls_first)
  }

  /** Null-safe equality join (Spark `<=>` ↔ SQL IS NOT DISTINCT FROM):
    * two views of the customer table derive a NULLABLE bucket key
    * (negative-balance customers get NULL), and the null-safe join
    * matches the NULL groups to each other — the semantic a plain
    * equi-join silently drops. Scale discipline: both sides aggregate
    * to |keys|-bounded group counts BEFORE the join, so the NULL<=>NULL
    * match is one row joining one row — never the n² pair explosion a
    * row-level null-safe join invites.
    */
  val joinNullSafe: Q = Q(
    "join_null_safe",
    """WITH a AS (
      |  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k,
      |         CAST(count(*) AS BIGINT) AS cnt_a
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      |  GROUP BY 1),
      |b AS (
      |  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k,
      |         CAST(count(*) AS BIGINT) AS cnt_b
      |  FROM customer WHERE c_mktsegment IN ('MACHINERY', 'HOUSEHOLD')
      |  GROUP BY 1)
      |SELECT a.k AS k, cnt_a, cnt_b
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |ORDER BY k NULLS FIRST""".stripMargin
  ) { (s, d) =>
    def side(segs: Seq[String], cname: String): DataFrame =
      T.customer(s, d)
        .filter(col("c_mktsegment").isin(segs: _*))
        .select(when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_nationkey")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as(cname))
    val a = side(Seq("BUILDING", "AUTOMOBILE"), "cnt_a")
    val b = side(Seq("MACHINERY", "HOUSEHOLD"), "cnt_b")
      .withColumnRenamed("k", "kb")
    a.join(b, col("k") <=> col("kb"))
      .select(col("k"), col("cnt_a"), col("cnt_b"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** Bitwise aggregates bit_or / bit_and / bit_xor over a derived
    * 8-bit flag (user_id % 256) per event type — the flag-rollup
    * idiom behind permission masks and feature-flag audits. All three
    * are associative + commutative, so they partial-aggregate
    * map-side and the result is partitioning-independent — the same
    * property the HLL row proves for distinct counts, here exact.
    */
  val aggBitwise2: Q = Q(
    "agg_bitwise_agg",
    """SELECT event_type,
      |       CAST(bit_or(user_id % 256) AS BIGINT) AS flags_or,
      |       CAST(bit_and(user_id % 256) AS BIGINT) AS flags_and,
      |       CAST(bit_xor(user_id % 256) AS BIGINT) AS flags_xor,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .select(col("event_type"), (col("user_id") % 256).as("f"))
      .groupBy(col("event_type"))
      .agg(expr("bit_or(f)").cast("long").as("flags_or"),
        expr("bit_and(f)").cast("long").as("flags_and"),
        expr("bit_xor(f)").cast("long").as("flags_xor"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** nth_value window accessor: for each segment's top-5 orders, the
    * segment's 3rd-highest order value so far (running frame) — the
    * remaining rank-accessor beside first/last/ntile. (cents DESC,
    * orderkey ASC) is a total order, so every nth pick is
    * deterministic; the window partitions by segment — parallel at
    * any scale; output bounded at 5·|segments| rows.
    */
  val windowNthValue: Q = Q(
    "window_nth_value",
    """WITH o AS (
      |  SELECT c_mktsegment AS seg, o_orderkey,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer JOIN orders ON c_custkey = o_custkey),
      |w AS (
      |  SELECT seg, o_orderkey, cents,
      |         row_number() OVER (PARTITION BY seg
      |                            ORDER BY cents DESC, o_orderkey ASC) AS rn,
      |         nth_value(cents, 3) OVER (PARTITION BY seg
      |             ORDER BY cents DESC, o_orderkey ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_cents
      |  FROM o)
      |SELECT seg, rn, o_orderkey, cents, third_cents
      |FROM w WHERE rn <= 5
      |ORDER BY seg NULLS FIRST, rn""".stripMargin
  ) { (s, d) =>
    val o = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .join(T.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("seg"), col("o_orderkey"),
        (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    val ord = Window.partitionBy(col("seg"))
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    val framed = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("rn", row_number().over(ord))
      .withColumn("third_cents", nth_value(col("cents"), 3).over(framed))
      .filter(col("rn") <= 5)
      .select(col("seg"), col("rn"), col("o_orderkey"), col("cents"), col("third_cents"))
      .orderBy(col("seg").asc_nulls_first, col("rn"))
  }

  val all: Seq[Q] = Seq(dqReferential, joinNullSafe, aggBitwise2, windowNthValue)
}
