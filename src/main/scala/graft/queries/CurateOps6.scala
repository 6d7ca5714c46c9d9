package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 session-3 wave: the two crawl-curation primitives the dedup
  * family still lacked — intra-corpus boilerplate-segment dedup (the
  * RefinedWeb/CCNet "line dedup" pass, re-expressed over the fixture's
  * single-line docs as fixed-width word segments) and URL
  * canonicalization dedup (the normalize-before-dedup step every
  * crawl frontier runs: case/port/tracking-param/param-order noise
  * collapses to one canonical key).
  */
object CurateOps6 {

  /** Boilerplate-segment dedup, the RefinedWeb line-dedup semantics:
    * a doc's text is cut into NON-overlapping W=8-word segments; a
    * segment occurring verbatim in >= 2 DISTINCT docs is boilerplate
    * (headers, injected templates, near-dup runs); per doc report the
    * segment count and the fraction a line-dedup pass would remove.
    * Plan: one explode (n_words/W rows), distinct-(seg,doc) partial
    * aggregate, doc-frequency as a window over that compact aggregate
    * (the text_bigram_logprob device — no self-join, no second
    * explode), then a per-doc rollup. Two key-hashed shuffles, all
    * partial-aggregable: linear at corpus scale, no driver state.
    */
  val dedupParagraph: Q = Q(
    "dedup_paragraph",
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t
      |  FROM documents WHERE text IS NOT NULL),
      |seg AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 7, 8),
      |                i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS seg
      |  FROM tok WHERE len(t) >= 8),
      |pairs AS (SELECT doc_id, seg, count(*) AS k FROM seg GROUP BY 1, 2),
      |nd AS (SELECT doc_id, k, count(*) OVER (PARTITION BY seg) AS n_docs
      |       FROM pairs)
      |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_segs,
      |       CAST(coalesce(sum(k) FILTER (WHERE n_docs >= 2), 0) AS BIGINT)
      |         AS n_boiler,
      |       round(coalesce(sum(k) FILTER (WHERE n_docs >= 2), 0)
      |             / CAST(sum(k) AS DOUBLE), 6) AS removed_frac
      |FROM nd GROUP BY doc_id
      |ORDER BY doc_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard BEFORE the split+segment explode (r16;
    // pathology at Tables.spreadExplodeInput)
    val toks = T.spreadExplodeInput(s, T.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 8)
    val segs = toks.select(col("doc_id"), explode(expr(
      """transform(sequence(1, size(t) - 7, 8),
        |          i -> array_join(slice(t, i, 8), ' '))""".stripMargin)).as("seg"))
    val pairs = segs.groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("k"))
    val nDocs = count(lit(1)).over(Window.partitionBy(col("seg")))
    pairs.withColumn("n_docs", nDocs)
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_segs"),
        coalesce(sum(when(col("n_docs") >= 2, col("k"))), lit(0L))
          .cast("long").as("n_boiler"))
      .select(col("doc_id"), col("n_segs"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_segs"), 6)
          .as("removed_frac"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** URL canonicalization dedup: synthetic crawl URLs carry the four
    * real-world noise classes (scheme/host case, explicit default
    * port, utm_* tracking params, query-param order); canonicalize =
    * lower scheme+host, strip :443, drop utm_*, sort remaining params
    * — then group by the canonical key to find duplicate clusters.
    * Both engines run the SAME string pipeline (regexp component
    * extraction + split/filter/sort/join on the param list), so the
    * row doubles as a spec of the canonical form. Map-only transforms,
    * one shuffle on the canonical key, TakeOrderedAndProject top-50
    * under a (n_raw DESC, canonical ASC) total order — linear at
    * frontier scale.
    */
  val urlCanonicalDedup: Q = Q(
    "url_canonical_dedup",
    """WITH raw AS (
      |  SELECT o_orderkey,
      |         CASE o_orderkey % 2 WHEN 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
      |         CASE o_orderkey % 3 WHEN 0 THEN 'Shop.Example.COM'
      |              WHEN 1 THEN 'shop.example.com' ELSE 'SHOP.EXAMPLE.com' END ||
      |         CASE WHEN o_orderkey % 5 = 0 THEN ':443' ELSE '' END ||
      |         '/item/' || CAST(o_orderkey // 10 AS VARCHAR) ||
      |         CASE o_orderkey % 4
      |           WHEN 0 THEN '?utm_source=news&color=red&size=' || CAST(o_orderkey % 3 AS VARCHAR)
      |           WHEN 1 THEN '?size=' || CAST(o_orderkey % 3 AS VARCHAR) || '&color=red'
      |           WHEN 2 THEN '?color=red&utm_campaign=x&size=' || CAST(o_orderkey % 3 AS VARCHAR)
      |           ELSE '?color=red&size=' || CAST(o_orderkey % 3 AS VARCHAR) || '&utm_medium=email'
      |         END AS url
      |  FROM orders WHERE o_orderkey IS NOT NULL),
      |canon AS (
      |  SELECT o_orderkey, url,
      |         'https://' ||
      |         replace(lower(regexp_extract(url, '://([^/]+)/', 1)), ':443', '') ||
      |         regexp_extract(url, '://[^/]+(/[^?]*)', 1) || '?' ||
      |         array_to_string(list_sort(list_filter(
      |           string_split(regexp_extract(url, '\?(.*)$', 1), '&'),
      |           p -> NOT starts_with(p, 'utm_'))), '&') AS canonical
      |  FROM raw)
      |SELECT canonical, CAST(count(*) AS BIGINT) AS n_raw,
      |       CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
      |       CAST(min(o_orderkey) AS BIGINT) AS first_key
      |FROM canon GROUP BY canonical
      |ORDER BY n_raw DESC, canonical ASC LIMIT 50""".stripMargin
  ) { (s, d) =>
    val raw = T.orders(s, d)
      .filter(col("o_orderkey").isNotNull)
      .select(col("o_orderkey"), concat(
        when(col("o_orderkey") % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
        when(col("o_orderkey") % 3 === 0, "Shop.Example.COM")
          .when(col("o_orderkey") % 3 === 1, "shop.example.com")
          .otherwise("SHOP.EXAMPLE.com"),
        when(col("o_orderkey") % 5 === 0, ":443").otherwise(""),
        lit("/item/"), floor(col("o_orderkey") / 10).cast("string"),
        when(col("o_orderkey") % 4 === 0,
          concat(lit("?utm_source=news&color=red&size="), (col("o_orderkey") % 3).cast("string")))
          .when(col("o_orderkey") % 4 === 1,
            concat(lit("?size="), (col("o_orderkey") % 3).cast("string"), lit("&color=red")))
          .when(col("o_orderkey") % 4 === 2,
            concat(lit("?color=red&utm_campaign=x&size="), (col("o_orderkey") % 3).cast("string")))
          .otherwise(
            concat(lit("?color=red&size="), (col("o_orderkey") % 3).cast("string"), lit("&utm_medium=email")))
      ).as("url"))
    val canon = raw.select(col("o_orderkey"), col("url"), concat(
      lit("https://"),
      regexp_replace(lower(regexp_extract(col("url"), "://([^/]+)/", 1)), ":443", ""),
      regexp_extract(col("url"), "://[^/]+(/[^?]*)", 1), lit("?"),
      expr("""array_join(array_sort(filter(split(regexp_extract(url, '\\?(.*)$', 1), '&'),
             |                             p -> NOT startswith(p, 'utm_'))), '&')""".stripMargin)
    ).as("canonical"))
    canon.groupBy(col("canonical"))
      .agg(count(lit(1)).cast("long").as("n_raw"),
        countDistinct(col("url")).cast("long").as("n_variants"),
        min(col("o_orderkey")).cast("long").as("first_key"))
      .orderBy(col("n_raw").desc, col("canonical").asc)
      .limit(50)
  }

  val all: Seq[Q] = Seq(dedupParagraph, urlCanonicalDedup)
}
