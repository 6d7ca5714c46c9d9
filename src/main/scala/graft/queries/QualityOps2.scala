package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-10: the published rule-based quality filter (Gopher, Rae et
  * al. 2021 §A1.1) as a decision-layer row beside text_quality's raw
  * metrics — per-rule rejection counts plus the all-rules pass count,
  * the "filter funnel" report every curation pipeline publishes.
  */
object QualityOps2 {

  /** Gopher quality rules over the documents corpus, with the
    * published thresholds: word count in [50, 100000], mean word
    * length in [3, 10], symbol-to-word ratio ('#' and '...') <= 0.1,
    * >= 80% of words contain an alphabetic char, and >= 2 distinct
    * stopwords present. The stopword list is corpus-derived (top-8
    * most frequent words, count DESC / word ASC tie-break) because the
    * synthetic vocabulary contains no English function words — the
    * documented adaptation; the rule STRUCTURE is the paper's.
    *
    * Scale shape: pass 1 derives the stopword list as a bounded top-8
    * aggregate (partial-aggregable count + TakeOrdered) broadcast back
    * as one row; pass 2 is a map-only projection of six booleans per
    * doc folded into ONE global aggregate; the funnel unpivots a
    * single-row frame. Two linear passes, no per-doc state anywhere.
    */
  val qualityGopherRules: Q = Q(
    "quality_gopher_rules",
    """WITH d AS (
      |  SELECT doc_id, text, string_split(lower(text), ' ') AS w
      |  FROM documents WHERE text IS NOT NULL),
      |wc AS (SELECT unnest(w) AS word FROM d),
      |stop AS (
      |  SELECT list(word ORDER BY cnt DESC, word ASC) AS sw FROM (
      |    SELECT word, count(*) AS cnt FROM wc WHERE word <> '' GROUP BY word
      |    ORDER BY cnt DESC, word ASC LIMIT 8)),
      |m AS (
      |  SELECT doc_id, len(d.w) AS n_words,
      |    length(replace(d.text, ' ', '')) / CAST(len(d.w) AS DOUBLE) AS mean_wlen,
      |    ((length(d.text) - length(replace(d.text, '#', ''))) +
      |     (length(d.text) - length(replace(d.text, '...', ''))) / 3)
      |      / CAST(len(d.w) AS DOUBLE) AS sym_ratio,
      |    len(list_filter(d.w, x -> regexp_matches(x, '[a-z]')))
      |      / CAST(len(d.w) AS DOUBLE) AS alpha_frac,
      |    len(list_intersect(list_distinct(d.w), s.sw)) AS n_stop
      |  FROM d CROSS JOIN stop s),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN n_words < 50 THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN n_words > 100000 THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN mean_wlen < 3 OR mean_wlen > 10 THEN 1 ELSE 0 END AS r3,
      |    CASE WHEN sym_ratio > 0.1 THEN 1 ELSE 0 END AS r4,
      |    CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END AS r5,
      |    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS r6
      |  FROM m),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(r1) AS BIGINT) AS f1, CAST(sum(r2) AS BIGINT) AS f2,
      |    CAST(sum(r3) AS BIGINT) AS f3, CAST(sum(r4) AS BIGINT) AS f4,
      |    CAST(sum(r5) AS BIGINT) AS f5, CAST(sum(r6) AS BIGINT) AS f6,
      |    CAST(sum(CASE WHEN r1 + r2 + r3 + r4 + r5 + r6 = 0 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_pass
      |  FROM f)
      |SELECT rule, n_fail, round(n_fail / CAST(n_docs AS DOUBLE), 6) AS frac
      |FROM (
      |  SELECT 'word_count_min' AS rule, f1 AS n_fail, n_docs FROM agg
      |  UNION ALL SELECT 'word_count_max', f2, n_docs FROM agg
      |  UNION ALL SELECT 'mean_word_length', f3, n_docs FROM agg
      |  UNION ALL SELECT 'symbol_word_ratio', f4, n_docs FROM agg
      |  UNION ALL SELECT 'alpha_word_frac', f5, n_docs FROM agg
      |  UNION ALL SELECT 'stopword_count', f6, n_docs FROM agg
      |  UNION ALL SELECT 'zz_pass_all', n_pass, n_docs FROM agg)
      |ORDER BY rule NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val docs = T.spreadExplodeInput(s, T.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), split(lower(col("text")), " ").as("w"))
    val top8 = docs.select(explode(col("w")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(8)
    // collect_list order is partition-dependent — re-sort by (-cnt, word)
    // inside the row so the broadcast list is deterministic
    val swRow = top8.agg(expr(
      "transform(array_sort(collect_list(struct(-cnt AS nc, word))), s -> s.word)").as("sw"))
    val m = docs.crossJoin(broadcast(swRow)).select(
      col("doc_id"),
      size(col("w")).as("n_words"),
      (length(expr("replace(text, ' ', '')")).cast("double") / size(col("w")))
        .as("mean_wlen"),
      (((length(col("text")) - length(expr("replace(text, '#', '')"))) +
        (length(col("text")) - length(expr("replace(text, '...', '')"))) / 3)
        .cast("double") / size(col("w"))).as("sym_ratio"),
      (size(expr("filter(w, x -> x rlike '[a-z]')")).cast("double") / size(col("w")))
        .as("alpha_frac"),
      size(array_intersect(array_distinct(col("w")), col("sw"))).as("n_stop"))
    val f = m.select(
      when(col("n_words") < 50, 1).otherwise(0).as("r1"),
      when(col("n_words") > 100000, 1).otherwise(0).as("r2"),
      when(col("mean_wlen") < 3 || col("mean_wlen") > 10, 1).otherwise(0).as("r3"),
      when(col("sym_ratio") > 0.1, 1).otherwise(0).as("r4"),
      when(col("alpha_frac") < 0.8, 1).otherwise(0).as("r5"),
      when(col("n_stop") < 2, 1).otherwise(0).as("r6"))
    val agg = f.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("r1")).cast("long").as("f1"), sum(col("r2")).cast("long").as("f2"),
      sum(col("r3")).cast("long").as("f3"), sum(col("r4")).cast("long").as("f4"),
      sum(col("r5")).cast("long").as("f5"), sum(col("r6")).cast("long").as("f6"),
      sum(when(col("r1") + col("r2") + col("r3") + col("r4") + col("r5") + col("r6") === 0, 1)
        .otherwise(0)).cast("long").as("n_pass"))
    agg.selectExpr(
      """stack(7,
        |  'word_count_min', f1, 'word_count_max', f2,
        |  'mean_word_length', f3, 'symbol_word_ratio', f4,
        |  'alpha_word_frac', f5, 'stopword_count', f6,
        |  'zz_pass_all', n_pass) AS (rule, n_fail)""".stripMargin,
      "n_docs")
      .select(col("rule"), col("n_fail"),
        round(col("n_fail").cast("double") / col("n_docs"), 6).as("frac"))
      .orderBy(col("rule").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(qualityGopherRules)
}
