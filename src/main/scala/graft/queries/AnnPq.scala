package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Product quantization (SURVEY.md §2A ANN family — the fourth leg
  * next to brute-force cosine, IVF, and sign-LSH): the 64-dim float
  * vectors are split into m=8 contiguous 8-dim subspaces, each encoded
  * as the nearest of k=16 codewords, and search runs over the CODES
  * with an asymmetric-distance lookup table — the memory/compute
  * workhorse of billion-vector search (8 bytes/vector instead of 256).
  *
  * Codebooks are DETERMINISTIC anchors (the subvectors of vec_id <
  * 16), the ann_ivf_kmeans cent0 convention, so both engines state
  * the identical codebook without a training RNG; IvfRecallSpec-style
  * recall floors are pinned in PqRecallSpec against exact L2.
  *
  * Scale posture: encoding is an equi-join against the broadcast
  * m·k=128-row codebook followed by a per-(vector, subspace) argmin —
  * O(n·m·k) work, no pair ever materialized; ADC search joins the
  * n·m code table against the |queries|·m·k broadcast LUT and
  * partial-aggregates the per-query sums — O(n·m) per query, the
  * actual PQ trick. Distances are double sums of 8 squares (~1e0
  * magnitude), so round(…,6) absorbs summation-order ulps; ranking
  * orders by the ROUNDED distance (text_entropy precedent).
  */
object AnnPq {

  private val M = 8    // subspaces
  private val SUB = 8  // dims per subspace
  private val K = 16   // codewords per subspace

  val annPqAdc: Q = Q(
    "ann_pq_adc",
    s"""WITH subs AS (
       |  SELECT vec_id, mi AS ms,
       |         list_transform(embedding[(mi*$SUB+1):(mi*$SUB+$SUB)],
       |                        x -> CAST(x AS DOUBLE)) AS sv
       |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, ${M - 1})) AS mi)
       |  WHERE embedding IS NOT NULL),
       |codebook AS (SELECT vec_id AS j, ms AS cms, sv AS cv FROM subs WHERE vec_id < $K),
       |enc AS (
       |  SELECT vec_id, ms, j AS code FROM (
       |    SELECT s.vec_id, s.ms, c.j,
       |           row_number() OVER (PARTITION BY s.vec_id, s.ms
       |             ORDER BY list_sum(list_transform(generate_series(1, $SUB),
       |                       i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) ASC,
       |                      c.j ASC) AS rn
       |    FROM subs s JOIN codebook c ON s.ms = c.cms) WHERE rn = 1),
       |lut AS (
       |  SELECT s.vec_id AS query_id, s.ms AS qms, c.j,
       |         list_sum(list_transform(generate_series(1, $SUB),
       |           i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d
       |  FROM subs s JOIN codebook c ON s.ms = c.cms
       |  WHERE s.vec_id IN (200, 300, 400)),
       |adc AS (
       |  SELECT l.query_id, e.vec_id, sum(l.d) AS adist
       |  FROM enc e JOIN lut l ON e.ms = l.qms AND e.code = l.j
       |  GROUP BY 1, 2)
       |SELECT query_id, neighbor_id, adist, rank FROM (
       |  SELECT query_id, vec_id AS neighbor_id, round(adist, 6) AS adist,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY round(adist, 6) ASC, vec_id ASC) AS rank
       |  FROM adc WHERE vec_id <> query_id) t
       |WHERE rank <= 5
       |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  ) { (s, d) =>
    // null vectors are unencodable — excluded symmetrically in the oracle.
    // Few-file straggler guard before the subvector explode (r16).
    val emb = T.spreadExplodeInput(s, T.embeddings(s, d))
      .filter(col("embedding").isNotNull)
    // (vec_id, ms, sv): the m 8-dim double subvectors of every vector
    val subs = emb.select(col("vec_id"), explode(expr(
      s"""transform(sequence(0, ${M - 1}), mi -> struct(mi AS ms,
         |  transform(slice(embedding, mi*$SUB + 1, $SUB),
         |            x -> CAST(x AS DOUBLE)) AS sv))""".stripMargin)).as("st"))
      .select(col("vec_id"), col("st.ms").as("ms"), col("st.sv").as("sv"))
    val codebook = subs.filter(col("vec_id") < K)
      .select(col("vec_id").as("j"), col("ms").as("cms"), col("sv").as("cv"))
    // codegen Σ(x−y)² kernel — same left-to-right double fold as the
    // HOF formulation and DuckDB's list_sum, so results stay
    // bit-identical while the n·m·k hot loop avoids per-element
    // interpreted lambdas (VecExpressions.DoubleVecL2Sq)
    val l2 = graft.functions.VectorOps.l2sq(col("sv"), col("cv"))
    // Argmin WITHOUT a sort: min_by over a (dist, j) struct puts a
    // struct in the agg buffer, which is not UnsafeRow-mutable — Spark
    // silently falls back to SortAggregate and sorts all n·m·k crossed
    // rows (the ann_ivf trap, round 9). Two codegen HashAggregate
    // passes instead: min(dist) per (vec_id, ms), then re-cross and
    // keep the bit-identical-minimum rows, min(j) as the tie-break —
    // the oracle's ORDER BY dist, j semantics exactly.
    val crossed = subs.join(broadcast(codebook), col("ms") === col("cms"))
    val bestD = crossed
      .groupBy(col("vec_id"), col("ms"))
      .agg(min(l2).as("best_d"))
    val enc = subs.join(bestD, Seq("vec_id", "ms"))
      .join(broadcast(codebook), col("ms") === col("cms"))
      .filter(l2 === col("best_d"))
      .groupBy(col("vec_id"), col("ms"))
      .agg(min(col("j")).as("code"))
    val lut = subs.filter(col("vec_id").isin(200L, 300L, 400L))
      .select(col("vec_id").as("query_id"), col("ms").as("qms"), col("sv"))
      .join(broadcast(codebook), col("qms") === col("cms"))
      .withColumn("d", l2)
      .select(col("query_id"), col("qms"), col("j"), col("d"))
    enc.join(broadcast(lut), col("ms") === col("qms") && col("code") === col("j"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adist0"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("adist0"), 6).as("adist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adist").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(annPqAdc)
}
