package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}
import graft.functions.VectorOps

/** Round-16 wave: hybrid-retrieval fusion — the last missing piece of
  * the retrieval ladder (text_bm25 scores lexically, sim_cosine_topk /
  * ann_ivf_* score semantically; a production RAG retriever runs BOTH
  * and fuses the rankings).
  */
object RetrievalOps {

  // cross-engine cosine idiom shared with sim_cosine_topk (LlmOps):
  // per-element DOUBLE cast before multiply, dot / (norm_a * norm_b)
  private val duckDot =
    "list_reduce(list_transform(list_zip(e.embedding, qv.q), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y)"
  private def duckSsq(c: String) =
    s"list_reduce(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)"

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of the
    * lexical and the semantic retriever: ranking A = per-doc BM25 total
    * of the three fixed probe terms (text_bm25's formula, k1 = 1.2,
    * b = 0.75, summed over terms); ranking B = cosine similarity to the
    * vec_id = 1 query embedding (doc_id ≡ vec_id in the fixture corpus).
    * RRF(d) = Σ_r 1/(60 + rank_r(d)) over the rankings that retrieved d
    * in their top-100 (the paper's k = 60); top-25 fused docs with both
    * source ranks (NULL where a retriever missed the doc).
    *
    * Determinism: both rankings rank the ROUNDED (6 dp) score with a
    * doc_id tiebreak — a total order, so the top-100 cut and the ranks
    * are identical cross-engine; 1/(60+r) terms are exact rationals of
    * integer ranks summed in a fixed 2-term coalesce expression.
    *
    * Scale: the BM25 side is text_bm25's one-explode shape (tf/df
    * partial-aggregable, 1-row corpus aggregate broadcast-crossed); the
    * cosine side is one map pass against a broadcast query vector (the
    * codegen VectorOps kernels). Each ranking materializes via
    * TakeOrderedAndProject(100) — per-partition heads + one 100-row
    * merge, NEVER a global sort — and the row_number windows run inside
    * the 100-row frames (allowlisted, measured bound 100; the
    * eval_ndcg_rankshift device). The fusion join touches ≤ 200 rows.
    */
  val rankFusionRrf: Q = Q(
    "rank_fusion_rrf",
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |doclen AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tok),
       |corp AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                CAST(sum(dl) AS BIGINT) AS sdl FROM doclen),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(w) AS term FROM tok) t
       |  WHERE term IN ('join', 'vector', 'scan') GROUP BY 1, 2),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |bm AS (
       |  SELECT tf.doc_id,
       |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
       |               * (tf * 2.2)
       |               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
       |                              / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))),
       |               6) AS s
       |  FROM tf JOIN dft USING (term) JOIN doclen USING (doc_id) CROSS JOIN corp
       |  GROUP BY tf.doc_id),
       |ra AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r FROM bm),
       |qv AS (SELECT embedding AS q FROM embeddings
       |       WHERE vec_id = 1 AND embedding IS NOT NULL),
       |cosv AS (
       |  SELECT e.vec_id AS doc_id,
       |         round($duckDot / (sqrt(${duckSsq("e.embedding")})
       |                           * sqrt(${duckSsq("qv.q")})), 6) AS s
       |  FROM embeddings e CROSS JOIN qv WHERE e.embedding IS NOT NULL),
       |rb AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r FROM cosv),
       |fused AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |         a.r AS rank_bm25, b.r AS rank_cos,
       |         round(coalesce(1.0 / (60 + a.r), 0) + coalesce(1.0 / (60 + b.r), 0), 6) AS rrf
       |  FROM (SELECT * FROM ra WHERE r <= 100) a
       |  FULL JOIN (SELECT * FROM rb WHERE r <= 100) b ON a.doc_id = b.doc_id)
       |SELECT doc_id, rank_bm25, rank_cos, rrf
       |FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 25""".stripMargin
  ) { (s, d) =>
    // ---- ranking A: BM25 (text_bm25's formula, summed per doc) ----
    // few-file straggler guard before the term explode (r16)
    val toks = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val doclen = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val glob = doclen.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val tf = toks.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin("join", "vector", "scan"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val bm = tf.join(dft, "term").join(doclen, "doc_id").crossJoin(broadcast(glob))
      .groupBy(col("doc_id"))
      .agg(round(sum(
        log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl").cast("double")
            / (col("sdl").cast("double") / col("n").cast("double"))))),
        6).as("s"))
    // top-100 cut via TakeOrdered, rank INSIDE the 100-row frame — the
    // (s DESC, doc_id ASC) order is total so this equals the global rank
    val ra = bm.orderBy(col("s").desc, col("doc_id").asc).limit(100)
      .withColumn("r", row_number().over(Window.orderBy(col("s").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("r"))
    // ---- ranking B: cosine to the vec_id = 1 query embedding ----
    val e = T.embeddings(s, d).filter(col("embedding").isNotNull)
    val qv = e.filter(col("vec_id") === 1)
      .select(col("embedding").as("q"), sqrt(VectorOps.ssq(col("embedding"))).as("qn"))
    val cosv = e.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(VectorOps.dot(col("embedding"), col("q"))
          / (sqrt(VectorOps.ssq(col("embedding"))) * col("qn")), 6).as("s"))
    val rb = cosv.orderBy(col("s").desc, col("doc_id").asc).limit(100)
      .withColumn("r", row_number().over(Window.orderBy(col("s").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("r"))
    // ---- fusion: full outer over the two ≤100-row shortlists ----
    val fused = ra.select(col("doc_id").as("a_id"), col("r").as("rank_bm25"))
      .join(rb.select(col("doc_id").as("b_id"), col("r").as("rank_cos")),
        col("a_id") === col("b_id"), "full_outer")
      .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
        col("rank_bm25"), col("rank_cos"),
        round(coalesce(lit(1.0) / (lit(60) + col("rank_bm25")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("rank_cos")), lit(0.0)), 6).as("rrf"))
    fused.orderBy(col("rrf").desc, col("doc_id").asc).limit(25)
  }

  val all: Seq[Q] = Seq(rankFusionRrf)
}
