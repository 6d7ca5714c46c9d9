package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 eighth wave: Spark-4-native semi-structured and
  * collation surfaces (VARIANT, UTF8_LCASE) plus month-arithmetic
  * calendar-edge semantics — each oracle-mirrored through DuckDB's
  * different-but-equivalent primitives (JSON extraction, lower(),
  * INTERVAL clamping).
  */
object SurfaceOps3 {

  /** The VARIANT semi-structured path: parse_json(props) → typed
    * variant_get access + schema_of_variant — Spark 4's open-schema
    * ingestion type, distinct from fn_json's string-based
    * get_json_object (VARIANT parses once into a binary form; at
    * 100 TB that single-parse representation is the difference
    * between one decode and one per accessed field). Aggregated per
    * event type with exact-integer stats; the oracle reaches the same
    * values through DuckDB's JSON extraction, and the inferred
    * schema string is pinned literally.
    */
  val fnVariant: Q = Q(
    "fn_variant",
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |       'OBJECT<k: BIGINT>' AS variant_schema
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
        expr("schema_of_variant(parse_json(props))").as("vs"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).cast("long").as("min_k"),
        max(col("k")).cast("long").as("max_k"),
        max(col("vs")).as("variant_schema"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Month arithmetic at the calendar edges on real data: +1 month
    * with END-OF-MONTH CLAMPING (Jan 31 → Feb 29 in a leap year),
    * last_day, and a clamped-row detector (day-of-month changed under
    * the shift). Both engines implement identical proleptic-Gregorian
    * clamping — this row pins it on every order date rather than a
    * literal. Bounded output: one row per renewal month.
    */
  val fnMonthArith: Q = Q(
    "fn_month_arith",
    """WITH m AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS od,
      |         CAST(date_trunc('day', o_orderdate + INTERVAL 1 MONTH) AS DATE) AS renew,
      |         last_day(CAST(date_trunc('day', o_orderdate) AS DATE)) AS eom
      |  FROM orders)
      |SELECT CAST(date_trunc('month', renew) AS DATE) AS renew_month,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN day(renew) <> day(od) THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_clamped,
      |       CAST(sum(CASE WHEN od = eom THEN 1 ELSE 0 END) AS BIGINT) AS n_on_eom
      |FROM m
      |GROUP BY 1
      |ORDER BY renew_month NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val m = T.orders(s, d).select(
      to_date(date_trunc("day", col("o_orderdate"))).as("od"))
      .select(col("od"),
        add_months(col("od"), 1).as("renew"),
        last_day(col("od")).as("eom"))
    m.groupBy(trunc(col("renew"), "month").as("renew_month"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(dayofmonth(col("renew")) =!= dayofmonth(col("od")), 1).otherwise(0))
          .cast("long").as("n_clamped"),
        sum(when(col("od") === col("eom"), 1).otherwise(0)).cast("long").as("n_on_eom"))
      .orderBy(col("renew_month").asc_nulls_first)
  }

  /** Case-insensitive semantics through Spark 4 COLLATIONS
    * (UTF8_LCASE) on deterministically mixed-case strings: distinct
    * counts collapse 2:1 under the collation, and a collated
    * self-join matches upper to lower variants. DuckDB mirrors with
    * lower() — equivalent for this ASCII data; the row's point is
    * that the COLLATION path (not an explicit lower()) produces those
    * semantics, Spark 4's first-class answer to case-insensitive
    * warehouses. Bounded per-segment output.
    */
  val fnCollation: Q = Q(
    "fn_collation",
    """WITH v AS (
      |  SELECT c_mktsegment AS seg,
      |         CASE WHEN (c_custkey // 10) % 2 = 0
      |              THEN upper(c_mktsegment || '_tier' || CAST(c_custkey % 10 AS VARCHAR))
      |              ELSE lower(c_mktsegment || '_tier' || CAST(c_custkey % 10 AS VARCHAR))
      |         END AS mixed
      |  FROM customer)
      |SELECT seg,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT mixed) AS BIGINT) AS n_raw_distinct,
      |       CAST(count(DISTINCT lower(mixed)) AS BIGINT) AS n_ci_distinct
      |FROM v GROUP BY seg
      |ORDER BY seg NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // case parity from (custkey div 10) is independent of the %10 base,
    // so every base string exists in BOTH cases → collation halves the count
    val v = T.customer(s, d).select(col("c_mktsegment").as("seg"),
      when(expr("(c_custkey div 10) % 2") === 0,
        upper(concat(col("c_mktsegment"), lit("_tier"),
          (col("c_custkey") % 10).cast("string"))))
        .otherwise(lower(concat(col("c_mktsegment"), lit("_tier"),
          (col("c_custkey") % 10).cast("string")))).as("mixed"))
    v.groupBy(col("seg"))
      .agg(count(lit(1)).cast("long").as("n"),
        countDistinct(col("mixed")).cast("long").as("n_raw_distinct"),
        countDistinct(expr("collate(mixed, 'UTF8_LCASE')")).cast("long")
          .as("n_ci_distinct"))
      .orderBy(col("seg").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(fnVariant, fnMonthArith, fnCollation)
}
