package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Change-data-capture merge — the incremental-load half of a warehouse
  * import tool: compact a changelog to its latest change per key, then
  * MERGE it into a snapshot (matched+U → update, matched+D → delete,
  * unmatched+U → insert, unmatched+D → no-op, untouched keys kept).
  *
  * Scale: changelog compaction windows over the CHANGES only (typically
  * ≪ snapshot); the merge itself is one shuffle join on the key — at
  * 100 TB you bucket the snapshot by the same key so the join co-locates
  * and only the delta shuffles. The same logic backs the streaming
  * foreachBatch MERGE sink (graft.streaming.StreamOps) and the keyed
  * parquet Upsert operator.
  */
object CdcOps {

  /** The changelog is derived deterministically from orders: each order
    * is a change to its customer's account (status F → delete, else
    * upsert of totalprice); orderkey % 97 == 0 rows get a synthetic
    * never-seen key (−o_custkey — customer keys are ≥ 1, so negation
    * can never collide with a real key at ANY scale factor, unlike an
    * additive offset) to exercise the insert arm.
    */
  val cdcMerge: Q = Q(
    "cdc_merge",
    """WITH chg AS (
      |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey ELSE o_custkey END AS k,
      |         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
      |         o_orderdate, o_orderkey
      |  FROM orders
      |), latest AS (
      |  SELECT k, op, amount FROM (
      |    SELECT k, op, amount,
      |           row_number() OVER (PARTITION BY k
      |                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |    FROM chg
      |  ) WHERE rn = 1
      |)
      |SELECT coalesce(c.c_custkey, l.k) AS cust_id,
      |       CASE WHEN l.k IS NULL THEN 'kept'
      |            WHEN c.c_custkey IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS action,
      |       CAST(CASE WHEN l.k IS NULL THEN CAST(c.c_acctbal AS DECIMAL(18,2))
      |                 WHEN c.c_custkey IS NULL THEN l.amount
      |                 ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) + l.amount
      |            END AS DOUBLE) AS balance
      |FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k
      |WHERE coalesce(l.op, 'U') <> 'D'
      |ORDER BY cust_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val chg = T.orders(s, d).select(
      when(col("o_orderkey") % 97 === 0, -col("o_custkey"))
        .otherwise(col("o_custkey")).as("k"),
      when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"),
      T.dec2(col("o_totalprice")).as("amount"),
      col("o_orderdate"), col("o_orderkey"))
    // changelog compaction: latest change per key (D4 tie-break on the
    // unique orderkey). Windows only over the delta, never the snapshot.
    val wLatest = Window.partitionBy(col("k"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val latest = chg.withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("k"), col("op"), col("amount"))
    val snap = T.customer(s, d)
      .select(col("c_custkey"), T.dec2(col("c_acctbal")).as("acctbal"))
    snap.join(latest, col("c_custkey") === col("k"), "full_outer")
      .filter(coalesce(col("op"), lit("U")) =!= "D")
      .select(
        coalesce(col("c_custkey"), col("k")).as("cust_id"),
        when(col("k").isNull, lit("kept"))
          .when(col("c_custkey").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("action"),
        when(col("k").isNull, col("acctbal"))
          .when(col("c_custkey").isNull, col("amount"))
          .otherwise(col("acctbal") + col("amount")).as("balance"))
      .orderBy(col("cust_id").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(cdcMerge)
}
