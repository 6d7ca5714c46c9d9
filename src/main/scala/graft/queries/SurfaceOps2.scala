package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 seventh wave: the SQL-standard regr_* regression
  * aggregate family (native in BOTH engines — cross-engine agreement
  * is the point), the binary codec surface (base64/hex), and — as a
  * rows-only twin — the TakeOrderedAndProject plan guarantee for
  * ORDER BY + LIMIT.
  */
object SurfaceOps2 {

  /** The SQL-standard regr_* aggregates (slope, intercept, R², count,
    * mean-x, mean-y) — NATIVE in both Spark and DuckDB, so this row
    * pins that the two engines' implementations agree on the same
    * data, the way a user porting warehouse SQL would hit them.
    * agg_linreg builds the same numbers from explicit exact sufficient
    * statistics; here the point is the built-in surface. Run over the
    * CALENDAR-BOUNDED daily aggregate (exact-integer inputs, ≤366
    * rows), so the engines' internal float accumulation is a bounded
    * sum under the chi2 6-dp-headroom argument, rounded 6 dp.
    */
  val aggRegrNative: Q = Q(
    "agg_regr_native",
    """WITH dly AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y
      |  FROM events GROUP BY 1)
      |SELECT CAST(regr_count(y, x) AS BIGINT) AS n,
      |       round(regr_avgx(y, x), 6) AS mean_x,
      |       round(regr_avgy(y, x), 6) AS mean_y,
      |       round(regr_slope(y, x), 6) AS slope,
      |       round(regr_intercept(y, x), 6) AS intercept,
      |       round(regr_r2(y, x), 6) AS r2
      |FROM dly""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .agg(
        sum(when(col("event_type") === "view", 1).otherwise(0)).cast("double").as("x"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).cast("double").as("y"))
    dly.agg(
      expr("CAST(regr_count(y, x) AS BIGINT)").as("n"),
      round(expr("regr_avgx(y, x)"), 6).as("mean_x"),
      round(expr("regr_avgy(y, x)"), 6).as("mean_y"),
      round(expr("regr_slope(y, x)"), 6).as("slope"),
      round(expr("regr_intercept(y, x)"), 6).as("intercept"),
      round(expr("regr_r2(y, x)"), 6).as("r2"))
  }

  /** Binary codec surface: base64 and hex encodings of the UTF-8
    * bytes of a string column, plus a Spark-side round-trip
    * (unbase64 → decode) equality flag the oracle mirrors as literal
    * TRUE — both encodings are RFC 4648 / uppercase-hex in both
    * engines, so the encoded text must agree byte-for-byte.
    * Deterministic per-row transforms, ordered by the key.
    */
  val fnBinaryCodec: Q = Q(
    "fn_binary_codec",
    """SELECT c_custkey,
      |       base64(encode(c_name)) AS b64,
      |       hex(c_name) AS hx,
      |       TRUE AS roundtrip_ok
      |FROM customer
      |ORDER BY c_custkey NULLS FIRST
      |LIMIT 40""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .select(col("c_custkey"),
        base64(col("c_name").cast("binary")).as("b64"),
        hex(col("c_name")).as("hx"),
        (decode(unbase64(base64(col("c_name").cast("binary"))), "UTF-8")
          === col("c_name")).as("roundtrip_ok"))
      .orderBy(col("c_custkey").asc_nulls_first)
      .limit(40)
  }

  /** B32 — ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    * partition top-k + merge), never a global sort: the plan guarantee
    * that makes "top 100 of 100 TB" a cheap operation. Asserted off
    * the executed plan (TakeOrderedAndProject present, no global
    * SortExec above the scan), with the result checked against the
    * window-rank formulation.
    */
  val takeOrdered: Q = Q.noOracle("b32_take_ordered") { (s, d) =>
    import s.implicits._
    val q = T.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
    val rows = q.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val plan = q.queryExecution.executedPlan.toString()
    val hasTopK = plan.contains("TakeOrderedAndProject")
    // a global Sort node would mean the full table was sorted for 20 rows
    val hasGlobalSort = plan.contains("Sort [") && !hasTopK
    import org.apache.spark.sql.expressions.Window
    val viaWindow = T.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 20).drop("rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    Seq((rows.length.toLong, hasTopK, hasGlobalSort, rows.sameElements(viaWindow),
      hasTopK && !hasGlobalSort && rows.sameElements(viaWindow)))
      .toDF("k", "plan_topk", "plan_global_sort", "matches_window_rank", "ok")
  }

  def all: Seq[Q] = Seq(aggRegrNative, fnBinaryCodec, takeOrdered)
}
