package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** HTML/boilerplate extraction (VERDICT r8 item 2) — the web-crawl
  * curation step between raw capture and every text row in this
  * library: strip script/style/comments/markup, collapse whitespace,
  * keep the main text.
  *
  * The corpus fixture is plain text, so the row synthesizes a
  * deterministic HTML wrapping per document FIRST (title/style/script/
  * nav/footer boilerplate derived from the doc's own fields — the same
  * expression in both engines), then runs the extraction chain. That
  * makes the row self-contained at any SF while still exercising real
  * markup: multi-line layout, attributes, a script body with code, a
  * CSS block, comments, and tag-adjacent whitespace.
  *
  * The regex chain is RE2-safe (DuckDB) AND java.util.regex-safe
  * (Spark): inline (?s) dotall, non-greedy bodies, character classes —
  * no lookahead/backrefs. Per-row work is O(len(html)); the operator
  * is embarrassingly parallel and whole-stage-codegen'd (regexp_replace
  * is a codegen'd native expression), which is the 100 TB shape.
  */
object HtmlOps {

  /** The synthesis + extraction, once per engine dialect. `castV` is
    * the engine's int->string cast type name.
    */
  private def htmlSql(castV: String): String =
    s"""'<html>' || chr(10) ||
       |'<head><title>' || source || '</title>' ||
       |'<style type="text/css">p { margin: ' || CAST(doc_id % 7 AS $castV) || 'px; }</style>' ||
       |'</head>' || chr(10) ||
       |'<body><script>var docId = ' || CAST(doc_id AS $castV) || '; if (docId > 1) { docId += 1; }</script>' ||
       |'<h1 class="hdr">' || upper(lang) || '</h1>' || chr(10) ||
       |'<p>' || text || '</p>' ||
       |'<!-- boilerplate ' || CAST(doc_id AS $castV) || ' ' || chr(10) || ' more -->' ||
       |'<div id="footer">footer   junk</div></body></html>'""".stripMargin

  private def extractSql(html: String, g: String): String =
    s"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  $html,
       |  '(?s)<script[^>]*>.*?</script>', ' '$g),
       |  '(?s)<style[^>]*>.*?</style>', ' '$g),
       |  '(?s)<!--.*?-->', ' '$g),
       |  '<[^>]*>', ' '$g),
       |  '[ ' || chr(10) || chr(9) || chr(13) || ']+', ' '$g))""".stripMargin
  // collapse runs AFTER tag-strip so it also swallows the single
  // spaces the tag pass inserted for adjacent tags

  val textHtmlExtract: Q = Q(
    "text_html_extract", {
      val h = htmlSql("VARCHAR")
      val ex = extractSql("h.html", ", 'g'")
      s"""WITH h AS (
         |  SELECT doc_id, ($h) AS html FROM documents),
         |x AS (
         |  SELECT doc_id, CAST(length(html) AS BIGINT) AS n_chars_html,
         |         ($ex) AS body FROM h)
         |SELECT doc_id, n_chars_html,
         |       CAST(length(body) AS BIGINT) AS n_chars_text,
         |       CAST(len(string_split(body, ' ')) AS BIGINT) AS n_words,
         |       substring(md5(body), 1, 16) AS body_hash
         |FROM x
         |ORDER BY doc_id NULLS FIRST""".stripMargin
    }
  ) { (s, d) =>
    val h = T.documents(s, d)
      .select(col("doc_id"), expr(htmlSql("STRING")).as("html"))
    h.select(col("doc_id"),
        length(col("html")).cast("long").as("n_chars_html"),
        expr(extractSql("html", "")).as("body"))
      .select(col("doc_id"), col("n_chars_html"),
        length(col("body")).cast("long").as("n_chars_text"),
        size(split(col("body"), " ")).cast("long").as("n_words"),
        substring(md5(col("body")), 1, 16).as("body_hash"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(textHtmlExtract)
}
