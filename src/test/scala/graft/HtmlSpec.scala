package graft

import org.apache.spark.sql.functions._
import graft.queries.HtmlOps

/** Semantic gate for text_html_extract: beyond the cross-engine hash,
  * the extraction must actually recover the document text — script,
  * style, comment, and markup gone; visible boilerplate retained in
  * document order; whitespace collapsed.
  */
class HtmlSpec extends SparkSpec {

  test("extraction recovers H1 + text + footer, nothing else") {
    // the synthesized page's visible text is exactly:
    //   upper(lang) + ' ' + text + ' footer junk'
    // (title lives in <head> — real extractors drop or keep it; this
    // one strips tags only, so the title string DOES survive, leading)
    val bad = HtmlOps.textHtmlExtract.fn(spark, sf())
      .join(Tables.documents(spark, sf()), "doc_id")
      .withColumn("expected",
        concat(col("source"), lit(" "), upper(col("lang")), lit(" "),
          col("text"), lit(" footer junk")))
      .withColumn("body",
        expr("trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
          "concat('<html>\n<head><title>', source, '</title>'," +
          "'<style type=\"text/css\">p { margin: ', CAST(doc_id % 7 AS STRING), 'px; }</style>'," +
          "'</head>\n<body><script>var docId = ', CAST(doc_id AS STRING), '; if (docId > 1) { docId += 1; }</script>'," +
          "'<h1 class=\"hdr\">', upper(lang), '</h1>\n<p>', text, '</p>'," +
          "'<!-- boilerplate ', CAST(doc_id AS STRING), ' \n more -->'," +
          "'<div id=\"footer\">footer   junk</div></body></html>')," +
          "'(?s)<script[^>]*>.*?</script>', ' '), '(?s)<style[^>]*>.*?</style>', ' ')," +
          "'(?s)<!--.*?-->', ' '), '<[^>]*>', ' '), '[ \n\t\r]+', ' '))"))
      .filter(col("body") =!= col("expected") ||
        substring(md5(col("body")), 1, 16) =!= col("body_hash"))
      .count()
    assert(bad == 0)
  }
}
