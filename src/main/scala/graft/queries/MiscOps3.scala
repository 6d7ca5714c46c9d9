package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 fourth wave: the bitmap exact-distinct rollup
  * (Spark's mergeable EXACT alternative to HLL) and the `mask()` data-
  * masking surface — both oracle-checked against semantics DuckDB
  * expresses differently (COUNT DISTINCT / regexp chains).
  */
object MiscOps3 {

  /** Exact distinct customers per order priority computed through
    * Spark's BITMAP aggregate family: key → (bucket, bit position),
    * one roaring-style bitmap built per (group, bucket) via
    * `bitmap_construct_agg`, distinct count = Σ `bitmap_count` over
    * buckets. The POINT of the row: bitmaps are mergeable
    * (associative + commutative per bucket — map-side partial
    * aggregation, partitioning-independent), which makes EXACT
    * 100 TB COUNT(DISTINCT) a two-level rollup with bounded state per
    * bucket — the exact-answer sibling of b10_hll_merge, trading
    * memory ∝ keyspace/32k-bucket for zero error. The oracle is plain
    * COUNT(DISTINCT): bitmap counting is exact, so the rollup must
    * equal it key-for-key.
    */
  val aggBitmapDistinct: Q = Q(
    "agg_bitmap_distinct",
    """SELECT o_orderpriority AS pri,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |       CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY 1
      |ORDER BY pri NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val perBucket = T.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"),
        expr("bitmap_bucket_number(o_custkey)").as("bkt"))
      .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey)))")
        .as("bc"),
        count(lit(1)).as("n"))
    perBucket.groupBy(col("pri"))
      .agg(sum(col("bc")).cast("long").as("n_cust"),
        sum(col("n")).cast("long").as("n_orders"))
      .orderBy(col("pri").asc_nulls_first)
  }

  /** The `mask()` data-masking surface: default masking (uppercase→X,
    * lowercase→x, digit→n) plus a custom-replacement variant — the
    * PII-lite sibling of text_redact's pattern redaction (masking
    * preserves SHAPE for debugging; redaction removes content).
    * DuckDB has no mask(), so the oracle mirrors the exact semantics
    * as a regexp_replace chain — ASCII inputs here, so the character
    * classes agree. Deterministic: pure per-row string transforms,
    * ordered by the primary key.
    */
  val fnMask: Q = Q(
    "fn_mask",
    """SELECT c_custkey,
      |       regexp_replace(regexp_replace(regexp_replace(c_name,
      |         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked_default,
      |       regexp_replace(regexp_replace(regexp_replace(c_name,
      |         '[A-Z]', '#', 'g'), '[a-z]', '#', 'g'), '[0-9]', '*', 'g') AS masked_custom,
      |       regexp_replace(c_name, '[0-9]', 'n', 'g') AS masked_digits_only
      |FROM customer
      |ORDER BY c_custkey NULLS FIRST
      |LIMIT 50""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .select(col("c_custkey"),
        expr("mask(c_name)").as("masked_default"),
        expr("mask(c_name, '#', '#', '*', NULL)").as("masked_custom"),
        expr("mask(c_name, NULL, NULL, 'n', NULL)").as("masked_digits_only"))
      .orderBy(col("c_custkey").asc_nulls_first)
      .limit(50)
  }

  def all: Seq[Q] = Seq(aggBitmapDistinct, fnMask)
}
