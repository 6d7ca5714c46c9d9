package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-16 wave: per-document lexical-concentration profiling —
  * Yule's characteristic K, the classic repetitiveness statistic the
  * corpus-level diversity rows (text_hapax_ratio's TTR is per
  * LANGUAGE) cannot see at the document grain.
  */
object CorpusOps5 {

  /** Yule's K (Yule 1944, "The Statistical Study of Literary
    * Vocabulary") per document over the house word tokenization:
    * K = 10⁴ · (Σ_t f_t² − N) / N² where f_t are the doc's word
    * frequencies and N = Σf_t the token count. K is size-invariant
    * under repetition (a doc repeating one word scores → 10⁴; fully
    * hapax text scores → 0), which is why curation pipelines use it as
    * a boilerplate/spam gate alongside text_repetition's n-gram rules.
    * Docs with N ≥ 10 (below that K is noise); global top-25 most
    * repetitive, ordered by the ROUNDED K (6 dp, text_entropy
    * precedent) with doc_id tiebreak.
    *
    * Exactness: (N, vocab, Σf²) are exact BIGINTs (Σf² ≤ N² < 2⁶³ for
    * any document under ~3·10⁹ tokens); K is ONE token-mirrored float
    * formula over them. Scale: one guarded explode pass, two
    * partial-aggregable hash aggregates keyed (doc_id, w) then doc_id,
    * TakeOrdered(25).
    */
  val textYuleK: Q = Q(
    "text_yule_k",
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
      |wc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tokens,
      |         CAST(count(*) AS BIGINT) AS vocab,
      |         CAST(sum(f * f) AS BIGINT) AS s2
      |  FROM wc GROUP BY 1)
      |SELECT doc_id, n_tokens, vocab,
      |       round(10000.0 * (s2 - n_tokens)
      |             / (CAST(n_tokens AS DOUBLE) * n_tokens), 6) AS yule_k
      |FROM agg WHERE n_tokens >= 10
      |ORDER BY yule_k DESC, doc_id ASC LIMIT 25""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput).
    // NULL text → explode of NULL emits nothing, same as unnest(NULL).
    val wc = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("f"))
    wc.groupBy(col("doc_id"))
      .agg(sum(col("f")).cast("long").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("f") * col("f")).cast("long").as("s2"))
      .filter(col("n_tokens") >= 10)
      .select(col("doc_id"), col("n_tokens"), col("vocab"),
        round(lit(10000.0) * (col("s2") - col("n_tokens"))
          / (col("n_tokens").cast("double") * col("n_tokens")), 6).as("yule_k"))
      .orderBy(col("yule_k").desc, col("doc_id").asc)
      .limit(25)
  }

  val all: Seq[Q] = Seq(textYuleK)
}
