package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 fifth wave (curation side): model-based quality
  * filtering — the logistic-regression scorer shape (fastText/FineWeb
  * quality classifiers) with fixed published weights, as the
  * inference-side counterpart of text_quality's hand-crafted signals.
  */
object CurateOps4 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Logistic-regression quality score per document over three cheap
    * features (stopword ratio, word count, digit ratio) with FIXED
    * literal weights, thresholded at p > 0.5 into a keep/drop
    * decision, reported as per-language keep rates — the model-based
    * filter every production corpus pipeline runs after the heuristic
    * gates. Features are exact-integer ratios; z is one token-mirrored
    * linear form; the only transcendental is one exp() per doc on
    * identical IEEE inputs, and the decision thresholds the ROUNDED
    * 6-dp probability so a last-ulp exp() divergence cannot flip a
    * row cross-engine. Scale: map-only scoring + one |langs|-bounded
    * aggregate; the LR weights broadcast as literals (a real model
    * would broadcast a weight vector — same plan shape).
    */
  val qualityLrScore: Q = Q(
    "quality_lr_score",
    """WITH f AS (
      |  SELECT lang,
      |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
      |         CAST(len(list_filter(string_split(lower(text), ' '),
      |                w -> list_contains(['the','a','of','and','to','in','is','it'], w)))
      |              AS BIGINT) AS n_stop,
      |         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_dig,
      |         n_chars
      |  FROM documents),
      |z AS (
      |  SELECT lang,
      |         -1.2 + 4.0 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE))
      |              + 0.01 * CAST(n_words AS DOUBLE)
      |              - 6.0 * (CAST(n_dig AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS z
      |  FROM f WHERE n_words > 0 AND n_chars > 0),
      |p AS (SELECT lang, round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
      |       round(CAST(sum(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE), 6) AS keep_rate
      |FROM p GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val f = T.documents(s, d).select(col("lang"),
      size(split(lower(col("text")), " ")).cast("long").as("n_words"),
      size(expr(
        "filter(split(lower(text), ' '), w -> w IN ('the','a','of','and','to','in','is','it'))"))
        .cast("long").as("n_stop"),
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("n_dig"),
      col("n_chars"))
    val z = f.filter(col("n_words") > 0 && col("n_chars") > 0)
      .select(col("lang"),
        (lit(-1.2) + lit(4.0) * (dbl(col("n_stop")) / dbl(col("n_words")))
          + lit(0.01) * dbl(col("n_words"))
          - lit(6.0) * (dbl(col("n_dig")) / dbl(col("n_chars")))).as("z"))
    val p = z.select(col("lang"), round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
    p.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("p") > 0.5, 1).otherwise(0)).cast("long").as("n_keep"),
        round(sum(when(col("p") > 0.5, 1).otherwise(0)).cast("double")
          / count(lit(1)).cast("double"), 6).as("keep_rate"))
      .orderBy(col("lang").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(qualityLrScore)
}
