package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A group 7 — scalar function surface (string / date /
  * math / array / map / json). Dialect traps pinned per D6:
  * DuckDB `dayofweek` is 0-based (Spark 1-based), `ceil` returns DOUBLE
  * (Spark BIGINT), `sign` INT (Spark DOUBLE), map extraction returns a
  * 1-element list. Doubles through libm (ln/log10/stddev) are rounded
  * to 6 dp on both sides.
  */
object Functions {

  val fnString: Q = Q(
    "fn_string",
    """SELECT p_partkey,
      |       concat_ws('|', p_brand, p_type) AS brand_type,
      |       upper(p_name) AS name_uc,
      |       lower(p_type) AS type_lc,
      |       trim(concat(' ', p_name, ' ')) AS name_trim,
      |       substring(p_name, 1, 5) AS name5,
      |       length(p_name) AS name_len,
      |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |       replace(p_brand, 'Brand#', 'B') AS brand_short,
      |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      |       string_split(p_type, ' ')[1] AS type_head,
      |       starts_with(p_type, 'PROMO') AS is_promo
      |FROM part
      |ORDER BY p_partkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.part(s, d)
      .select(
        col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("name_uc"),
        lower(col("p_type")).as("type_lc"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
        substring(col("p_name"), 1, 5).as("name5"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        col("p_type").startsWith("PROMO").as("is_promo"))
      .orderBy(col("p_partkey").asc_nulls_first)
      .limit(200)
  }

  val fnDate: Q = Q(
    "fn_date",
    """SELECT o_orderkey,
      |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |       year(o_orderdate) AS y,
      |       month(o_orderdate) AS m,
      |       day(o_orderdate) AS dom,
      |       dayofweek(o_orderdate) + 1 AS dow,
      |       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
      |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |       last_day(o_orderdate) AS month_end,
      |       make_date(year(o_orderdate), month(o_orderdate), 1) AS month_first
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        last_day(col("o_orderdate")).as("month_end"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1))
          .as("month_first"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  val fnMath: Q = Q(
    "fn_math",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |       round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS price_r1,
      |       abs(l_discount - 0.05) AS disc_dev,
      |       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
      |       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      |       round(pow(l_quantity, 2), 6) AS qty_sq,
      |       mod(l_linenumber, 3) AS ln_mod3,
      |       round(ln(l_extendedprice), 6) AS price_ln,
      |       round(log10(l_extendedprice), 6) AS price_log10,
      |       round(sqrt(l_quantity), 6) AS qty_sqrt,
      |       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
      |FROM lineitem
      |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
      |         l_partkey NULLS FIRST, l_suppkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        round(T.dec2(col("l_extendedprice")), 1).as("price_r1"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        round(pow(col("l_quantity"), 2), 6).as("qty_sq"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(log10(col("l_extendedprice")), 6).as("price_log10"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"))
      .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first,
        col("l_partkey").asc_nulls_first, col("l_suppkey").asc_nulls_first)
      .limit(200)
  }

  /** Array surface over the 64-dim embedding vectors. Both engines fold
    * the list left-to-right in double, so sums are bit-identical (§7.3).
    * Array-valued FINALS are serialized to CSV (array_join ↔
    * array_to_string): a top-level LIST crashes the driver's pandas
    * hasher (VERDICT r1 §What's-wrong 2); the array semantics stay
    * exercised upstream. head4 serializes in integer milli-units so no
    * double→string formatting dialect enters the compare.
    */
  val fnArray: Q = Q(
    "fn_array",
    """SELECT vec_id,
      |       len(embedding) AS dim,
      |       array_to_string(list_transform(list_slice(embedding, 1, 4),
      |                       x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT) AS VARCHAR)), ',') AS head4_milli,
      |       round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b), 6) AS ssq,
      |       array_to_string(list_sort(list_distinct([label, label, 1])), ',') AS label_set
      |FROM embeddings
      |WHERE vec_id < 20
      |ORDER BY vec_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.embeddings(s, d)
      .filter(col("vec_id") < 20)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        expr("array_join(transform(slice(embedding, 1, 4), " +
          "x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT) AS STRING)), ',')")
          .as("head4_milli"),
        round(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, x) -> a + x)"),
          6).as("ssq"),
        array_join(array_sort(array_distinct(array(col("label"), col("label"), lit(1))))
          .cast("array<string>"), ",").as("label_set"))
      .orderBy(col("vec_id").asc_nulls_first)
  }

  /** Map build + lookup: per-user event-type count map, then point
    * lookups and key listing. DuckDB map extraction yields a 1-element
    * list → `[1]` unwraps it; missing key → NULL in both engines.
    */
  val fnMap: Q = Q(
    "fn_map",
    """WITH pertype AS (
      |  SELECT user_id, event_type, count(*) AS n
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY user_id, event_type
      |), m AS (
      |  SELECT user_id,
      |         MAP(list(event_type ORDER BY event_type), list(n ORDER BY event_type)) AS type_counts
      |  FROM pertype GROUP BY user_id
      |)
      |SELECT user_id,
      |       type_counts['click'][1] AS n_click,
      |       type_counts['purchase'][1] AS n_purchase,
      |       cardinality(type_counts) AS n_types,
      |       array_to_string(list_sort(map_keys(type_counts)), ',') AS types_csv
      |FROM m
      |ORDER BY user_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.events(s, d)
      // a NULL map key is illegal in Spark (NULL_MAP_KEY) and
      // meaningless here — excluded symmetrically in the oracle
      .filter(col("event_type").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n")))))
        .as("type_counts"))
      .select(
        col("user_id"),
        element_at(col("type_counts"), "click").as("n_click"),
        element_at(col("type_counts"), "purchase").as("n_purchase"),
        size(col("type_counts")).as("n_types"),
        array_join(array_sort(map_keys(col("type_counts"))), ",").as("types_csv"))
      .orderBy(col("user_id").asc_nulls_first)
  }

  val fnJson: Q = Q(
    "fn_json",
    """SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
      |       count(*) AS n,
      |       count(DISTINCT CAST(json_extract(props, '$.k') AS INTEGER)) AS n_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // parse the JSON ONCE per row; the bucket derives from the parsed
    // column (r1 bench: the doubled get_json_object was 5.4 s at sf0.1)
    T.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .select((col("k") % 10).as("k_bucket"), col("k"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_k"))
      .orderBy(col("k_bucket").asc_nulls_first)
  }

  /** Error-tolerant casts — the ingest posture (bad values → NULL, not
    * a failed batch) at expression level. Both engines have TRY_CAST.
    */
  val fnTrycast: Q = Q(
    "fn_trycast",
    """SELECT o_orderkey,
      |       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
      |       TRY_CAST(o_orderpriority AS INTEGER) AS bogus_int,
      |       TRY_CAST(o_orderstatus AS DOUBLE) AS bogus_dbl,
      |       coalesce(TRY_CAST(o_orderpriority AS INTEGER), -1) AS prio_or_default
      |FROM orders
      |ORDER BY o_orderkey NULLS FIRST
      |LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        expr("TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        expr("TRY_CAST(o_orderpriority AS INT)").as("bogus_int"),
        expr("TRY_CAST(o_orderstatus AS DOUBLE)").as("bogus_dbl"),
        coalesce(expr("TRY_CAST(o_orderpriority AS INT)"), lit(-1)).as("prio_or_default"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  /** Array set algebra — results sorted on both sides because Spark's
    * array_union/intersect/except keep first-occurrence order while the
    * DuckDB formulation composes filters (D4: pin the order).
    */
  val fnArraySetops: Q = Q(
    "fn_array_setops",
    // Finals serialized CSV-style (top-level LIST crashes the driver's
    // hasher); list_position: DuckDB yields NULL on a miss where Spark
    // yields 0 → coalesce to 0 on the oracle side. Likewise DuckDB's
    // array_to_string of an EMPTY list is NULL where Spark's array_join
    // is '' → coalesce to ''.
    """SELECT p_partkey,
      |       coalesce(array_to_string(list_sort(list_distinct(string_split(p_type, ' ') || ['PROMO', 'shiny'])), ','), '') AS u,
      |       coalesce(array_to_string(list_sort(list_filter(list_distinct(string_split(p_type, ' ')),
      |                 x -> list_contains(['ECONOMY', 'PROMO', 'STANDARD'], x))), ','), '') AS i,
      |       coalesce(array_to_string(list_sort(list_filter(list_distinct(string_split(p_type, ' ')),
      |                 x -> NOT list_contains(['ECONOMY', 'PROMO', 'STANDARD'], x))), ','), '') AS e,
      |       coalesce(array_to_string(flatten([string_split(p_type, ' '), ['#']]), ','), '') AS fl,
      |       CAST(coalesce(list_position(string_split(p_type, ' '), 'PROMO'), 0) AS BIGINT) AS pos_promo
      |FROM part
      |ORDER BY p_partkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    val toks = split(col("p_type"), " ")
    val ref = array(lit("ECONOMY"), lit("PROMO"), lit("STANDARD"))
    T.part(s, d)
      .select(
        col("p_partkey"),
        array_join(array_sort(array_union(toks, array(lit("PROMO"), lit("shiny")))), ",").as("u"),
        array_join(array_sort(array_intersect(toks, ref)), ",").as("i"),
        array_join(array_sort(array_except(toks, ref)), ",").as("e"),
        array_join(flatten(array(toks, array(lit("#")))), ",").as("fl"),
        array_position(toks, "PROMO").cast("long").as("pos_promo"))
      .orderBy(col("p_partkey").asc_nulls_first)
      .limit(100)
  }

  /** Second string batch — pins the backreference dialect trap (Spark
    * regexp_replace uses `$1`, DuckDB uses `\1`) plus split_part /
    * translate / repeat / reverse.
    */
  val fnString2: Q = Q(
    "fn_string2",
    """SELECT p_partkey,
      |       regexp_replace(p_brand, '([0-9]+)', '<\1>', 'g') AS brand_marked,
      |       split_part(p_type, ' ', 1) AS type_first,
      |       split_part(p_type, ' ', -1) AS type_last,
      |       translate(p_brand, '#', '-') AS brand_dash,
      |       repeat(p_brand, 2) AS brand_twice,
      |       reverse(p_brand) AS brand_rev
      |FROM part
      |ORDER BY p_partkey NULLS FIRST
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    T.part(s, d)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_brand"), "([0-9]+)", "<$1>").as("brand_marked"),
        expr("split_part(p_type, ' ', 1)").as("type_first"),
        expr("split_part(p_type, ' ', -1)").as("type_last"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        reverse(col("p_brand")).as("brand_rev"))
      .orderBy(col("p_partkey").asc_nulls_first)
      .limit(100)
  }

  /** Higher-order array functions — lambda transform / filter / fold /
    * existential over a deterministic per-row integer array. Spark's
    * `aggregate(arr, 0L, (a,x) -> a+x)` (explicit zero) is mirrored by
    * DuckDB's `list_reduce` (seeds from the first element) — equal on
    * the NONEMPTY arrays this derivation guarantees (len ∈ [2, 8]);
    * `exists` has no DuckDB twin, so both sides agree on the
    * filter-then-count formulation's semantics. All integer arithmetic.
    */
  val fnArrayHof: Q = Q(
    "fn_array_hof",
    """WITH t AS (SELECT o_orderkey, generate_series(1, o_orderkey % 7 + 2) AS arr
      |           FROM orders)
      |SELECT o_orderkey,
      |       CAST(len(arr) AS BIGINT) AS arr_len,
      |       CAST(list_reduce(list_transform(arr, x -> x * x), (a, x) -> a + x) AS BIGINT) AS sq_sum,
      |       CAST(len(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_even,
      |       len(list_filter(arr, x -> x > 5)) > 0 AS has_gt5
      |FROM t ORDER BY o_orderkey NULLS FIRST LIMIT 200""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(col("o_orderkey"),
        expr("sequence(1, o_orderkey % 7 + 2)").as("arr"))
      .select(col("o_orderkey"),
        size(col("arr")).cast("long").as("arr_len"),
        expr("aggregate(transform(arr, x -> x * x), 0L, (a, x) -> a + x)")
          .as("sq_sum"),
        expr("size(filter(arr, x -> x % 2 = 0))").cast("long").as("n_even"),
        expr("exists(arr, x -> x > 5)").as("has_gt5"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  /** Calendar arithmetic beyond fn_date: month-end, month-add with
    * end-of-month clamping (both engines clamp Jan 31 + 1 mo →
    * Feb 29), ISO day-of-week (Spark's Monday-0 `weekday` + 1 ==
    * DuckDB's `isodow`), quarter start, ISO week number, and
    * `make_date` from parts (day 28 — valid in every year, because
    * DuckDB's make_date THROWS on invalid dates while Spark returns
    * null, so the derivation must stay in the always-valid domain).
    */
  val fnDate2: Q = Q(
    "fn_date2",
    """SELECT o_orderkey,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
      |       CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_dow,
      |       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
      |       CAST(datepart('week', CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
      |       make_date(CAST(datepart('year', o_orderdate) AS INTEGER), 12, 28) AS year_ref
      |FROM orders ORDER BY o_orderkey NULLS FIRST LIMIT 200""".stripMargin
  ) { (s, d) =>
    val dt = to_date(col("o_orderdate"))
    T.orders(s, d)
      .select(col("o_orderkey"),
        last_day(dt).as("month_end"),
        add_months(dt, 1).as("next_month"),
        (weekday(dt) + 1).cast("long").as("iso_dow"),
        date_trunc("quarter", dt).cast("date").as("quarter_start"),
        weekofyear(dt).cast("long").as("iso_week"),
        make_date(year(col("o_orderdate")), lit(12), lit(28)).as("year_ref"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .limit(200)
  }

  val all: Seq[Q] = Seq(
    fnString, fnDate, fnMath, fnArray, fnMap, fnJson, fnTrycast,
    fnArraySetops, fnString2, fnArrayHof, fnDate2)
}
