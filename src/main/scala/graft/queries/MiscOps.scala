package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Remaining scalar/aggregate/set-op surface: bitwise ops, crypto
  * hashes, boolean aggregates, arg-max/min, multiset set ops.
  * Dialect note: DuckDB's `^` is POWER — its bitwise XOR is `xor()`
  * (Spark SQL: `^`).
  */
object MiscOps {

  val fnBitwise: Q = Q(
    "fn_bitwise",
    """SELECT o_orderkey,
      |       o_orderkey & 255 AS low_byte,
      |       o_orderkey | 15 AS or15,
      |       xor(o_orderkey, 255) AS xor255,
      |       o_orderkey << 2 AS shl2,
      |       o_orderkey >> 2 AS shr2,
      |       bit_count(o_orderkey) AS popcount
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        expr("o_orderkey & 255").as("low_byte"),
        expr("o_orderkey | 15").as("or15"),
        expr("o_orderkey ^ 255").as("xor255"),
        expr("shiftleft(o_orderkey, 2)").as("shl2"),
        expr("shiftright(o_orderkey, 2)").as("shr2"),
        bit_count(col("o_orderkey")).as("popcount"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  val fnHash: Q = Q(
    "fn_hash",
    """SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256
      |FROM customer
      |ORDER BY c_custkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .select(col("c_custkey"), md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256"))
      .orderBy(col("c_custkey").asc_nulls_first)
      .limit(100)
  }

  val aggBool: Q = Q(
    "agg_bool",
    """SELECT c_mktsegment,
      |       bool_and(c_acctbal > 0) AS all_positive,
      |       bool_or(c_acctbal > 9000) AS any_rich,
      |       count(*) FILTER (WHERE c_acctbal < 0) AS n_negative
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("bool_and(c_acctbal > 0)").as("all_positive"),
        expr("bool_or(c_acctbal > 9000)").as("any_rich"),
        count(when(col("c_acctbal") < 0, 1)).as("n_negative"))
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** arg-max/min keyed on the UNIQUE custkey (ties on a non-unique key
    * would be nondeterministic — D4).
    */
  val aggMinmaxBy: Q = Q(
    "agg_minmax_by",
    """SELECT c_nationkey,
      |       arg_max(c_name, c_custkey) AS newest_customer,
      |       arg_min(c_name, c_custkey) AS oldest_customer,
      |       count(*) AS n
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("newest_customer"),
        min_by(col("c_name"), col("c_custkey")).as("oldest_customer"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey").asc_nulls_first)
  }

  val setIntersectAll: Q = Q(
    "set_intersect_all",
    """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d)
    o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      .intersectAll(
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
      .orderBy(col("o_custkey").asc_nulls_first)
  }

  val setExceptAll: Q = Q(
    "set_except_all",
    """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d)
    o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      .exceptAll(
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
      .orderBy(col("o_custkey").asc_nulls_first)
  }

  /** Nested struct build + field access. The struct FINAL is serialized
    * via to_json (a top-level STRUCT crashes the driver's pandas hasher
    * — VERDICT r1); struct construction and field extraction stay
    * exercised upstream. qty rides as BIGINT so no decimal/double JSON
    * number formatting enters the compare.
    */
  val fnStruct: Q = Q(
    "fn_struct",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       to_json({'flag': l_returnflag, 'qty': CAST(l_quantity AS BIGINT)}) AS line_info,
      |       ({'flag': l_returnflag, 'qty': CAST(l_quantity AS BIGINT)}).flag AS flag_again
      |FROM lineitem
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
      |         l_partkey NULLS FIRST, l_suppkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    val info = struct(
      col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"))
    T.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        // Spark's to_json DROPS null fields by default; DuckDB keeps
        // "flag":null — pin Spark to the keep-null behavior
        to_json(info, java.util.Map.of("ignoreNullFields", "false")).as("line_info"),
        info.getField("flag").as("flag_again"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("l_partkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)
      .limit(100)
  }

  /** Epoch conversions pinned to µs integers (DuckDB's to_timestamp is
    * TIMESTAMPTZ and epoch() is DOUBLE — both avoided, D6).
    */
  val fnEpoch: Q = Q(
    "fn_epoch",
    """SELECT o_orderkey,
      |       epoch_us(o_orderdate) AS ts_us,
      |       epoch_us(o_orderdate) // 1000000 AS ts_sec,
      |       make_timestamp(epoch_us(o_orderdate)) AS ts_roundtrip
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    // o_orderdate arrives as TIMESTAMP_NTZ; unix_micros needs LTZ —
    // identical instants under the pinned UTC session. The roundtrip
    // goes back to NTZ so parquet stays naive (what DuckDB's
    // make_timestamp yields).
    val ltz = col("o_orderdate").cast("timestamp")
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        unix_micros(ltz).as("ts_us"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000").as("ts_sec"),
        timestamp_micros(unix_micros(ltz)).cast("timestamp_ntz").as("ts_roundtrip"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  /** printf-style formatting (Spark format_string ↔ DuckDB printf —
    * same conversions for %d/%s/%.2f/%x on long/string/double; Spark
    * needs the float operand to be DOUBLE, a Decimal literal throws).
    */
  val fnFormat: Q = Q(
    "fn_format",
    """SELECT o_orderkey,
      |       printf('%08d|%s|%.2f', o_orderkey, o_orderstatus, o_totalprice) AS line,
      |       printf('%x', o_orderkey) AS key_hex
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        // DuckDB's printf NULL-propagates; Spark's format_string prints
        // the string "null" — pin Spark to the SQL-idiomatic NULL
        when(col("o_orderstatus").isNotNull && col("o_totalprice").isNotNull,
          format_string("%08d|%s|%.2f", col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))).as("line"),
        format_string("%x", col("o_orderkey")).as("key_hex"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  /** Deterministic MODE (most frequent value) per group. Neither
    * engine's native mode() pins tie-breaks, so both sides compute it
    * the same way: count per value, then argmax with ties to the
    * SMALLEST value — Spark as a partial-aggregable min_by over
    * (−count, value), DuckDB as the equivalent window argmax.
    */
  val aggMode: Q = Q(
    "agg_mode",
    """SELECT o_orderpriority, mode_status, n_status FROM (
      |  SELECT o_orderpriority, o_orderstatus AS mode_status, count(*) AS n_status,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY count(*) DESC, o_orderstatus ASC) AS rn
      |  FROM orders
      |  GROUP BY o_orderpriority, o_orderstatus
      |) WHERE rn = 1
      |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("o_orderpriority"))
      .agg(
        min_by(col("o_orderstatus"), struct(-col("n"), col("o_orderstatus")))
          .as("mode_status"),
        max(col("n")).as("n_max"))
      .select(col("o_orderpriority"), col("mode_status"), col("n_max").as("n_status"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  /** Two-phase (salted) aggregation — the skew-mitigation shape for a
    * hot grouping key: phase 1 pre-aggregates on (key, salt) so a
    * skewed key's rows spread over 16 reducers; phase 2 combines the
    * 16 partials per key. The salt is a deterministic hash of the
    * unique orderkey (D4 — no rand()). Decimal partial sums are exact,
    * so two-phase ≡ one-phase bit-for-bit and the plain GROUP BY is a
    * valid oracle. At 100 TB this is what un-sticks a reducer pinned
    * on one giant key; Spark's partial/final HashAggregate does the
    * same split automatically for algebraic aggs — the explicit salt
    * matters when the DISTINCT/collect-style agg defeats partials.
    */
  val aggSkewTwophase: Q = Q(
    "agg_skew_twophase",
    """WITH phase1 AS (
      |  SELECT l_returnflag, l_orderkey % 16 AS salt,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS psum,
      |         count(*) AS pcnt
      |  FROM lineitem
      |  GROUP BY 1, 2
      |)
      |SELECT l_returnflag,
      |       CAST(sum(psum) AS DOUBLE) AS total_price,
      |       CAST(sum(pcnt) AS BIGINT) AS n_items
      |FROM phase1
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val phase1 = T.lineitem(s, d)
      .groupBy(col("l_returnflag"), (col("l_orderkey") % 16).as("salt"))
      .agg(sum(T.dec2(col("l_extendedprice"))).as("psum"),
        count(lit(1)).as("pcnt"))
    phase1.groupBy(col("l_returnflag"))
      .agg(sum(col("psum")).cast("double").as("total_price"),
        sum(col("pcnt")).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  /** Z-order (Morton) clustering audit — the multi-dimensional data
    * layout lever: sort-by-z before writing gives file-level min/max
    * pruning on BOTH join/filter dimensions at once (a plain sort only
    * prunes its leading column). Raw-bit interleaving breaks on
    * asymmetric key domains (orderkey spans 2¹⁴, partkey 2¹¹ → the low
    * dimension's bits never reach the bucket prefix — measured: one
    * bucket at sf0.001), so, like Delta/Iceberg z-ordering, each
    * dimension is first NORMALIZED to a 4-bit rank against its global
    * min/max (one partial-aggregable 1-row bounds pass, broadcast —
    * allowlisted); the interleave of the two 4-bit ranks yields ≤ 256
    * z-cells at ANY scale factor. The audit groups rows by cell and
    * shows each covers a narrow rectangle of both key ranges — the
    * locality a 100 TB writer turns directly into skipped files.
    * Integer-only arithmetic, identical in both dialects.
    */
  val zorderLayout: Q = Q(
    "zorder_layout",
    {
      val duck = ((0 until 4).map(i =>
        s"(((na >> $i) & 1) * ${1L << (2 * i + 1)})") ++
        (0 until 4).map(i =>
          s"(((nb >> $i) & 1) * ${1L << (2 * i)})")).mkString(" + ")
      s"""WITH bounds AS (
         |  SELECT min(l_orderkey) AS ok_min, max(l_orderkey) AS ok_max,
         |         min(l_partkey) AS pk_min, max(l_partkey) AS pk_max
         |  FROM lineitem),
         |norm AS (
         |  SELECT l_orderkey, l_partkey,
         |         ((l_orderkey - ok_min) * 16) // (ok_max - ok_min + 1) AS na,
         |         ((l_partkey - pk_min) * 16) // (pk_max - pk_min + 1) AS nb
         |  FROM lineitem, bounds),
         |z AS (
         |  SELECT l_orderkey, l_partkey, CAST($duck AS BIGINT) AS z_cell
         |  FROM norm)
         |SELECT z_cell, CAST(count(*) AS BIGINT) AS n,
         |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
         |FROM z GROUP BY 1
         |ORDER BY z_cell NULLS FIRST""".stripMargin
    }
  ) { (s, d) =>
    val sparkZ = ((0 until 4).map(i =>
      s"((shiftright(na, $i) & 1) * ${1L << (2 * i + 1)}L)") ++
      (0 until 4).map(i =>
        s"((shiftright(nb, $i) & 1) * ${1L << (2 * i)}L)")).mkString(" + ")
    val bounds = T.lineitem(s, d).agg(
      min(col("l_orderkey")).as("ok_min"), max(col("l_orderkey")).as("ok_max"),
      min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"))
    T.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .crossJoin(broadcast(bounds))
      .select(col("l_orderkey"), col("l_partkey"),
        expr("((l_orderkey - ok_min) * 16) div (ok_max - ok_min + 1)").as("na"),
        expr("((l_partkey - pk_min) * 16) div (pk_max - pk_min + 1)").as("nb"))
      .select(col("l_orderkey"), col("l_partkey"),
        expr(s"CAST($sparkZ AS BIGINT)").as("z_cell"))
      .groupBy(col("z_cell"))
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("min_ok"), max(col("l_orderkey")).as("max_ok"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"))
      .orderBy(col("z_cell").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    fnBitwise, fnHash, aggBool, aggMinmaxBy, setIntersectAll, setExceptAll,
    fnStruct, fnEpoch, fnFormat, aggMode, aggSkewTwophase, zorderLayout)
}
