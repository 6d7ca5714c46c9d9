package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 eleventh wave: URL parsing (the clickstream /
  * web-corpus column type), and schema-full JSON parsing with
  * PERMISSIVE corrupt-record semantics (from_json as the typed
  * counterpart of fn_json's path extraction).
  */
object SurfaceOps4 {

  /** parse_url + url_decode over deterministically synthesized order
    * URLs (host varies by segment, path by order, query carries an
    * encoded parameter): extract HOST / PATH / QUERY parameter and
    * aggregate per host — the canonicalization every web-scale corpus
    * dedup runs before URL-level dedup. DuckDB has no parse_url, so
    * the oracle mirrors the grammar with split_part/regexp — which
    * doubles as a spec of exactly which URL component each accessor
    * returns. Map-only transforms + a bounded per-host aggregate.
    */
  val fnUrlParse: Q = Q(
    "fn_url_parse",
    """WITH u AS (
      |  SELECT 'https://' || lower(c_mktsegment) || '.example.com/order/'
      |           || CAST(o_orderkey AS VARCHAR) || '?pri=' ||
      |           replace(o_orderpriority, ' ', '%20') AS url,
      |         o_orderkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |p AS (
      |  SELECT split_part(split_part(url, '://', 2), '/', 1) AS host,
      |         '/' || split_part(split_part(url, '://', 2), '/', 2) || '/'
      |           || split_part(split_part(split_part(url, '://', 2), '/', 3), '?', 1)
      |           AS path,
      |         replace(split_part(url, 'pri=', 2), '%20', ' ') AS pri,
      |         o_orderkey
      |  FROM u WHERE url IS NOT NULL)
      |SELECT host, pri, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
      |       min(path) AS sample_path
      |FROM p GROUP BY host, pri
      |ORDER BY host NULLS FIRST, pri NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val u = T.orders(s, d)
      .join(T.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(concat(lit("https://"), lower(col("c_mktsegment")),
        lit(".example.com/order/"), col("o_orderkey").cast("string"),
        lit("?pri="), regexp_replace(col("o_orderpriority"), " ", "%20")).as("url"),
        col("o_orderkey"))
    // a NULL url (null segment/priority upstream) is unparseable — the
    // two engines' parsers disagree on how to say so; exclude it in both
    val p = u.filter(col("url").isNotNull).select(
      parse_url(col("url"), lit("HOST")).as("host"),
      parse_url(col("url"), lit("PATH")).as("path"),
      url_decode(parse_url(col("url"), lit("QUERY"), lit("pri"))).as("pri"),
      col("o_orderkey"))
    p.groupBy(col("host"), col("pri"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("o_orderkey")).cast("long").as("min_key"),
        min(col("path")).as("sample_path"))
      .orderBy(col("host").asc_nulls_first, col("pri").asc_nulls_first)
  }

  /** from_json with an explicit schema under PERMISSIVE semantics:
    * a deterministic ~1% slice of props is corrupted in-query
    * (trailing garbage), the schema-full parse nulls exactly those
    * rows while fn_json-style path extraction would need per-field
    * handling. Output per event type: parsed count, corrupt count,
    * exact k-sum over the valid rows. The oracle mirrors corruption
    * and parse with a guard CASE + JSON extraction.
    */
  val fnFromJsonSchema: Q = Q(
    "fn_from_json_schema",
    """WITH raw AS (
      |  SELECT event_type,
      |         CASE WHEN event_id % 97 = 0 THEN 'x' || props ELSE props END AS js
      |  FROM events),
      |parsed AS (
      |  SELECT event_type,
      |         CASE WHEN json_valid(js)
      |              THEN CAST(json_extract(js, '$.k') AS BIGINT) END AS k
      |  FROM raw)
      |SELECT event_type,
      |       CAST(count(k) AS BIGINT) AS n_parsed,
      |       CAST(count(*) - count(k) AS BIGINT) AS n_corrupt,
      |       CAST(sum(k) AS BIGINT) AS sum_k
      |FROM parsed GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // corruption PREPENDS garbage: Jackson (Spark's parser) ignores
    // TRAILING garbage after a complete object (measured — '{...}x'
    // parses fine), so only a broken prefix exercises the malformed
    // path in both engines identically
    val raw = T.events(s, d).select(col("event_type"),
      when(col("event_id") % 97 === 0, concat(lit("x"), col("props")))
        .otherwise(col("props")).as("js"))
    val parsed = raw.select(col("event_type"),
      from_json(col("js"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).as("st"))
    // PERMISSIVE from_json yields Row(null) for malformed input (the
    // struct itself is NOT null — measured); corrupt = field null
    val marked = parsed.select(col("event_type"), col("st.k").as("k"))
    marked.groupBy(col("event_type"))
      .agg(count(col("k")).cast("long").as("n_parsed"),
        (count(lit(1)) - count(col("k"))).cast("long").as("n_corrupt"),
        sum(col("k")).cast("long").as("sum_k"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(fnUrlParse, fnFromJsonSchema)
}
