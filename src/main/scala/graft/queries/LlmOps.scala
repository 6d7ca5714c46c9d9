package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}
import graft.functions.{VectorOps, WeightedAvg, WInput}

/** SURVEY.md §2A group 10 — LLM-pipeline operators: dedup, text
  * normalization, tf·idf, similarity. Float discipline: list folds run
  * left-to-right in double in BOTH engines (bit-identical); anything
  * through libm (ln, sqrt ratios) is rounded to 6 dp.
  */
object LlmOps {

  /** Exact dedup keeping min event_id — row_number, NOT dropDuplicates
    * (D4: dropDuplicates keeps an arbitrary row).
    */
  val dedupExact: Q = Q(
    "dedup_exact",
    """SELECT event_id, user_id, event_type, props FROM (
      |  SELECT event_id, user_id, event_type, props,
      |         row_number() OVER (PARTITION BY user_id, event_type, props
      |                            ORDER BY event_id) AS rn
      |  FROM events
      |) WHERE rn = 1
      |ORDER BY event_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("props"))
      .orderBy(col("event_id").asc)
    T.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  /** lower → strip non-alnum → tokenize → stopword filter → counts. */
  val textNormalize: Q = Q(
    "text_normalize",
    """SELECT doc_id, lang,
      |       len(toks) AS n_tokens,
      |       len(list_distinct(toks)) AS n_distinct
      |FROM (
      |  SELECT doc_id, lang,
      |         list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
      |                     x -> x <> '' AND NOT list_contains(['spark','join','window'], x)) AS toks
      |  FROM documents
      |)
      |ORDER BY doc_id NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .withColumn("toks",
        expr("""filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ''), ' '),
                x -> x != '' AND NOT array_contains(array('spark','join','window'), x))"""))
      .select(
        col("doc_id"), col("lang"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  /** Top-20 tf·idf terms; idf = ln((N+1)/(df+1)) + 1 pinned in both
    * engines, doubles rounded to 6 dp (D2 mitigation — no decimal path
    * through ln).
    */
  val textTfidf: Q = Q(
    "text_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
      |), n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT tf.doc_id, tf.term,
      |       round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
      |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |ORDER BY score DESC, tf.doc_id ASC NULLS FIRST, tf.term ASC NULLS FIRST
      |LIMIT 20""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    val toks = T.spreadExplodeInput(s, T.documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"),
        round(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc_nulls_first, col("term").asc_nulls_first)
      .limit(20)
  }

  /** Spark-side cosine: per-pair dot via the primitive-loop kernel, the
    * two norms hoisted to one sqrt(ssq) per ROW (not per pair) — the
    * identical IEEE computation as the oracle's per-pair formulation,
    * since sqrt/fold are deterministic, at a fraction of the work.
    */
  private def sparkSim =
    round(VectorOps.dot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")), 6)

  private val duckDot =
    "list_reduce(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y)"
  private def duckSsq(c: String) =
    s"list_reduce(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)"
  private val duckCosine =
    s"round($duckDot / (sqrt(${duckSsq("a.embedding")}) * sqrt(${duckSsq("b.embedding")})), 6)"

  /** Top-10 most-similar pairs, left side bounded to vec_id < 50.
    * Brute-force baseline; the 100 TB path is LSH (§2B B6).
    */
  val simCosineTopk: Q = Q(
    "sim_cosine_topk",
    s"""SELECT a.vec_id AS a, b.vec_id AS b, $duckCosine AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.vec_id < b.vec_id AND a.vec_id < 50
       |  AND a.embedding IS NOT NULL AND b.embedding IS NOT NULL
       |ORDER BY sim DESC, a ASC NULLS FIRST, b ASC NULLS FIRST
       |LIMIT 10""".stripMargin
  ) { (s, d) =>
    // null vectors carry no similarity — excluded symmetrically in the oracle
    val e = T.embeddings(s, d).filter(col("embedding").isNotNull)
    val a = e.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
        sqrt(VectorOps.ssq(col("embedding"))).as("a_norm"))
      .filter(col("a") < 50)
    val b = e.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      sqrt(VectorOps.ssq(col("embedding"))).as("b_norm"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), sparkSim.as("sim"))
      .orderBy(col("sim").desc, col("a").asc_nulls_first, col("b").asc_nulls_first)
      .limit(10)
  }

  /** All pairs ≥ τ among the first 100 vectors (bounded self-join; the
    * scalable variant is the LSH approx join, §2B B6).
    */
  val simThresholdJoin: Q = Q(
    "sim_threshold_join",
    s"""SELECT a, b, sim FROM (
       |  SELECT a.vec_id AS a, b.vec_id AS b, $duckCosine AS sim
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id < b.vec_id AND a.vec_id < 100 AND b.vec_id < 100
       |    AND a.embedding IS NOT NULL AND b.embedding IS NOT NULL
       |) WHERE sim >= 0.2
       |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val e = T.embeddings(s, d).filter(col("vec_id") < 100)
      .filter(col("embedding").isNotNull)
    val a = e.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
      sqrt(VectorOps.ssq(col("embedding"))).as("a_norm"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      sqrt(VectorOps.ssq(col("embedding"))).as("b_norm"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), sparkSim.as("sim"))
      .filter(col("sim") >= 0.2)
      .orderBy(col("a").asc_nulls_first, col("b").asc_nulls_first)
  }

  /** Custom UDAF (Aggregator surface): quantity-weighted mean price. */
  val udafWeighted: Q = Q(
    "udaf_weighted",
    """SELECT l_returnflag,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |             / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS wavg_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag NULLS FIRST""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val wavg = udaf(WeightedAvg, implicitly[org.apache.spark.sql.Encoder[WInput]])
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_quantity"), col("l_extendedprice")), 6).as("wavg_price"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    dedupExact, textNormalize, textTfidf, simCosineTopk, simThresholdJoin, udafWeighted)
}
