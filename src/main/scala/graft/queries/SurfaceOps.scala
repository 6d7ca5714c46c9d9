package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 fifth wave (SQL-surface depth): timezone
  * conversion with a DST-regime probe, the try_* error-safe arithmetic
  * family, and multi-aggregate pivot — surfaces a warehouse importer's
  * consumers hit daily.
  */
object SurfaceOps {

  private def dbl(c: Column): Column = c.cast("double")

  /** Timezone conversion offsets observed across two zones and two
    * calendar regimes: January events as-is, and the same instants
    * shifted +69 days so the window straddles the 2024 DST
    * transitions (America/New_York springs forward Mar 10 — offset
    * −5 → −4; Australia/Sydney falls back Apr 7 — +11 → +10). The row
    * aggregates per (period, zone, offset_hours), so BOTH regimes of
    * each zone must appear with the right event split — pinning that
    * engine tz conversion applies the IANA rules, not a fixed offset.
    * Offsets are exact integer hour arithmetic on epoch-micros; both
    * engines use current tzdata for 2024 rules (stable since 2008).
    */
  val fnTimezone: Q = Q(
    "fn_timezone",
    """WITH base AS (
      |  SELECT ts AS uts, 'jan' AS period FROM events
      |  UNION ALL
      |  SELECT ts + INTERVAL 69 DAY, 'spring' FROM events),
      |conv AS (
      |  SELECT period, 'America/New_York' AS zone,
      |         (epoch_us(timezone('America/New_York', uts::TIMESTAMPTZ))
      |            - epoch_us(uts)) // 3600000000 AS off
      |  FROM base
      |  UNION ALL
      |  SELECT period, 'Australia/Sydney',
      |         (epoch_us(timezone('Australia/Sydney', uts::TIMESTAMPTZ))
      |            - epoch_us(uts)) // 3600000000
      |  FROM base)
      |SELECT period, zone, CAST(off AS BIGINT) AS offset_hours,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM conv
      |GROUP BY 1, 2, 3
      |ORDER BY period NULLS FIRST, zone NULLS FIRST, offset_hours NULLS FIRST"""
      .stripMargin
  ) { (s, d) =>
    val ev = T.events(s, d).select(col("ts"))
    val base = ev.select(col("ts").as("uts"), lit("jan").as("period"))
      .unionByName(ev.select((col("ts") + expr("INTERVAL 69 DAYS")).as("uts"),
        lit("spring").as("period")))
    def zoned(zone: String) = base.select(col("period"), lit(zone).as("zone"),
      ((unix_micros(from_utc_timestamp(col("uts"), zone)) - unix_micros(col("uts")))
        / lit(3600000000L)).cast("long").as("off"))
    zoned("America/New_York").unionByName(zoned("Australia/Sydney"))
      .groupBy(col("period"), col("zone"), col("off").as("offset_hours"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("period").asc_nulls_first, col("zone").asc_nulls_first,
        col("offset_hours").asc_nulls_first)
  }

  /** The try_* error-safe arithmetic family: try_add at BIGINT max,
    * try_multiply at the overflow boundary, try_divide by a data-
    * derived zero — NULL instead of error, the semantics a permissive
    * ingest pipeline needs for untrusted numeric columns. DuckDB has
    * no try_* (its overflow THROWS), so the oracle EMULATES each with
    * a guard CASE — which doubles as documentation of exactly when
    * each function nulls. Aggregated per residue class to a bounded
    * output; min/max of the division are order statistics over exact-
    * input IEEE doubles (deterministic).
    */
  val exprTryArith: Q = Q(
    "expr_try_arith",
    """WITH t AS (
      |  SELECT o_orderkey AS k,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |         o_orderkey % 3 AS grp
      |  FROM orders),
      |r AS (
      |  SELECT grp, k, cents,
      |         CASE WHEN k > 0 THEN NULL
      |              ELSE 9223372036854775807 + k END AS ta,
      |         CASE WHEN k >= 2 THEN NULL
      |              ELSE k * 4611686018427387904 END AS tm,
      |         CASE WHEN grp = 0 THEN NULL
      |              ELSE CAST(cents AS DOUBLE) / CAST(grp AS DOUBLE) END AS td
      |  FROM t)
      |SELECT CAST(grp AS BIGINT) AS grp, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(*) - count(ta) AS BIGINT) AS null_add,
      |       CAST(count(*) - count(tm) AS BIGINT) AS null_mul,
      |       CAST(count(*) - count(td) AS BIGINT) AS null_div,
      |       round(min(td), 6) AS min_div, round(max(td), 6) AS max_div
      |FROM r GROUP BY grp
      |ORDER BY grp""".stripMargin
  ) { (s, d) =>
    val t = T.orders(s, d).select(col("o_orderkey").as("k"),
      (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
      (col("o_orderkey") % 3).as("grp"))
    val r = t.select(col("grp"), col("k"), col("cents"),
      expr("try_add(9223372036854775807L, k)").as("ta"),
      expr("try_multiply(k, 4611686018427387904L)").as("tm"),
      expr("try_divide(cents, grp)").as("td"))
    r.groupBy(col("grp").cast("long").as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        (count(lit(1)) - count(col("ta"))).cast("long").as("null_add"),
        (count(lit(1)) - count(col("tm"))).cast("long").as("null_mul"),
        (count(lit(1)) - count(col("td"))).cast("long").as("null_div"),
        round(min(col("td")), 6).as("min_div"),
        round(max(col("td")), 6).as("max_div"))
      .orderBy(col("grp"))
  }

  /** Pivot with MULTIPLE aggregates per cell: returnflag × linestatus
    * grid carrying both the decimal quantity sum and the row count —
    * the multi-measure crosstab report (pivot_wide pivots one
    * measure). Pinned column naming: Spark generates
    * `<pivotValue>_<aggAlias>`; the oracle writes the same names via
    * conditional aggregation. One partial-aggregable pass.
    */
  val pivotMultiAgg: Q = Q(
    "pivot_multi_agg",
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN l_linestatus = 'F'
      |                 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F_sq,
      |       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F_n,
      |       CAST(sum(CASE WHEN l_linestatus = 'O'
      |                 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O_sq,
      |       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O_n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(T.dec2(col("l_quantity"))).as("sq"),
        count(lit(1)).as("n"))
      // pivot yields NULL for an empty (returnflag, linestatus) cell —
      // including the count — while the oracle's sum(CASE ... ELSE 0 END)
      // yields 0; coalesce the count cells so both engines agree for ANY
      // corpus, not just one that populates all cells (ADVICE r8)
      .select(col("l_returnflag"), col("F_sq"),
        coalesce(col("F_n"), lit(0L)).as("F_n"), col("O_sq"),
        coalesce(col("O_n"), lit(0L)).as("O_n"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(fnTimezone, exprTryArith, pivotMultiAgg)
}
