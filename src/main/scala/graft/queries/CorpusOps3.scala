package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 third wave (corpus side): cross-language
  * vocabulary overlap — the shared-token profile that tells a corpus
  * mixer how much orthographic surface two language slices share
  * (loanwords, code-switching, contamination across lang labels).
  */
object CorpusOps3 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Pairwise language vocabulary Jaccard: distinct word sets per
    * language, intersected for every lang pair a < b. The candidate
    * generator is a DISTINCT-TOKEN equi-join on the word (the dedup
    * distinct-shingle shape — candidates ∝ shared vocabulary, never
    * corpus size); per-language vocab sizes broadcast back onto the
    * |langs|²-bounded pair table. All counts exact integers; Jaccard
    * is one rounded division.
    */
  val textVocabOverlap: Q = Q(
    "text_vocab_overlap",
    """WITH voc AS (
      |  SELECT DISTINCT lang, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |vs AS (SELECT lang, CAST(count(*) AS BIGINT) AS v FROM voc GROUP BY 1),
      |inter AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b,
      |         CAST(count(*) AS BIGINT) AS both_v
      |  FROM voc a JOIN voc b ON a.w = b.w AND a.lang < b.lang
      |  GROUP BY 1, 2)
      |SELECT lang_a, lang_b, va.v AS vocab_a, vb.v AS vocab_b, both_v,
      |       round(CAST(both_v AS DOUBLE)
      |             / CAST(va.v + vb.v - both_v AS DOUBLE), 6) AS jaccard
      |FROM inter
      |JOIN vs va ON lang_a = va.lang
      |JOIN vs vb ON lang_b = vb.lang
      |ORDER BY lang_a NULLS FIRST, lang_b NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val voc = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .distinct()
    val vs = voc.groupBy(col("lang")).agg(count(lit(1)).cast("long").as("v"))
    val a = voc.select(col("lang").as("lang_a"), col("w"))
    val b = voc.select(col("lang").as("lang_b"), col("w").as("wb"))
    val inter = a.join(b, col("w") === col("wb") && col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).cast("long").as("both_v"))
    inter
      .join(broadcast(vs.select(col("lang").as("la"), col("v").as("vocab_a"))),
        col("lang_a") === col("la"))
      .join(broadcast(vs.select(col("lang").as("lb"), col("v").as("vocab_b"))),
        col("lang_b") === col("lb"))
      .select(col("lang_a"), col("lang_b"), col("vocab_a"), col("vocab_b"), col("both_v"),
        round(dbl(col("both_v"))
          / dbl(col("vocab_a") + col("vocab_b") - col("both_v")), 6).as("jaccard"))
      .orderBy(col("lang_a").asc_nulls_first, col("lang_b").asc_nulls_first)
  }

  def all: Seq[Q] = Seq(textVocabOverlap)
}
