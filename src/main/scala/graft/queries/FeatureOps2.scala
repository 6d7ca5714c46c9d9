package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 sixth wave: the top principal component of the
  * embedding corpus — the whitening/compression primitive (PCA) every
  * embedding pipeline runs before indexing, built on embedding_cov's
  * exact-integer covariance machinery extended to the FULL 64×64
  * matrix.
  */
object FeatureOps2 {

  /** Top eigenvector of the quantized-embedding covariance by EIGHT
    * power-iteration steps from v₀ = (0.125, …, 0.125) — declared
    * semantics are the deterministic ALGORITHM (8 steps from a fixed
    * start), not the mathematical limit, so both engines compute the
    * same thing by construction. The corpus-scale work is the fully
    * distributed covariance pass: per-vector int8 quantization
    * (max-abs·127, embedding_cov's device — quantized ONCE before the
    * pair cross, the r9 O(d²) lambda-inlining lesson), then exact
    * BIGINT sufficient statistics per (i ≤ j) cell with map-side
    * combine. Cells are ROUNDED to 6 dp (exact decimal→double, so
    * both engines iterate the IDENTICAL matrix); the iteration runs
    * driver-side on the collected 64×64 aggregate (ivf-centroid /
    * pagerank precedent). Output: all 64 loadings (unit-normalized),
    * the Rayleigh-quotient eigenvalue, and its share of total
    * variance (trace). The 64-term sums inside the iteration differ
    * cross-engine only in accumulation order — relative error ~1e-14,
    * far inside the 6-dp round. Sign is pinned by v₀: a positive
    * projection at step 0 cannot flip from ulp noise.
    */
  val embeddingPcaTop: Q = Q(
    "embedding_pca_top",
    """WITH m AS (
      |  SELECT CAST(list_aggregate(list_transform(embedding,
      |           x -> abs(CAST(x AS DOUBLE))), 'max') AS DOUBLE) AS max_abs,
      |         embedding
      |  FROM embeddings),
      |q AS (
      |  SELECT list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 127.0
      |                           / nullif(max_abs, 0.0)) AS BIGINT)) AS qa
      |  FROM m),
      |ij AS (
      |  SELECT a.i AS i, b.i AS j
      |  FROM (SELECT CAST(range AS BIGINT) AS i FROM range(1, 65)) a,
      |       (SELECT CAST(range AS BIGINT) AS i FROM range(1, 65)) b
      |  WHERE a.i <= b.i),
      |cell AS (
      |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(qa[i]) AS BIGINT) AS si,
      |         CAST(sum(qa[j]) AS BIGINT) AS sj,
      |         CAST(sum(qa[i] * qa[j]) AS BIGINT) AS sij
      |  FROM q CROSS JOIN ij GROUP BY i, j),
      |cov AS (
      |  SELECT i, j,
      |         round(CAST(CAST(n AS DECIMAL(38,0)) * sij
      |                    - CAST(si AS DECIMAL(38,0)) * sj AS DOUBLE)
      |               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS c
      |  FROM cell),
      |cf AS (
      |  SELECT i, j, c FROM cov
      |  UNION ALL
      |  SELECT j, i, c FROM cov WHERE i <> j),
      |v0 AS (SELECT CAST(range AS BIGINT) AS i, 0.125 AS v FROM range(1, 65)),
      |v1 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v0 p ON cf.j = p.i GROUP BY cf.i),
      |v2 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v1 p ON cf.j = p.i GROUP BY cf.i),
      |v3 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v2 p ON cf.j = p.i GROUP BY cf.i),
      |v4 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v3 p ON cf.j = p.i GROUP BY cf.i),
      |v5 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v4 p ON cf.j = p.i GROUP BY cf.i),
      |v6 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v5 p ON cf.j = p.i GROUP BY cf.i),
      |v7 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v6 p ON cf.j = p.i GROUP BY cf.i),
      |v8 AS (SELECT cf.i, sum(cf.c * p.v) AS v FROM cf JOIN v7 p ON cf.j = p.i GROUP BY cf.i),
      |nrm AS (SELECT sqrt(sum(v * v)) AS nv FROM v8),
      |u AS (SELECT i, v / nv AS u FROM v8 CROSS JOIN nrm),
      |ray AS (
      |  SELECT sum(a.u * cf.c * b.u) AS lambda
      |  FROM cf JOIN u a ON cf.i = a.i JOIN u b ON cf.j = b.i),
      |tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j)
      |SELECT u.i AS dim, round(u.u, 6) AS loading,
      |       round(ray.lambda, 6) AS eigval,
      |       round(ray.lambda / tr.trace, 6) AS var_share
      |FROM u CROSS JOIN ray CROSS JOIN tr
      |ORDER BY dim""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val q = T.embeddings(s, d)
      .withColumn("max_abs",
        expr("CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)"))
      .select(expr(
        """transform(embedding,
          |          x -> CAST(round(CAST(x AS DOUBLE) * 127.0
          |                          / nullif(max_abs, CAST(0.0 AS DOUBLE))) AS BIGINT))"""
          .stripMargin).as("qa"))
    val dims = s.range(1, 65).select(col("id").as("i"))
    val ij = dims.crossJoin(s.range(1, 65).select(col("id").as("j")))
      .filter(col("i") <= col("j"))
    val cell = q.crossJoin(broadcast(ij))
      .select(col("i"), col("j"),
        expr("element_at(qa, CAST(i AS INT))").as("qi"),
        expr("element_at(qa, CAST(j AS INT))").as("qj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).cast("long").as("si"),
        sum(col("qj")).cast("long").as("sj"),
        sum(col("qi") * col("qj")).cast("long").as("sij"))
    val cov = cell.select(col("i"), col("j"),
      round((col("n").cast("decimal(38,0)") * col("sij")
        - col("si").cast("decimal(38,0)") * col("sj")).cast("double")
        / (col("n").cast("double") * col("n").cast("double")), 6).as("c"))
    // 64×64 bounded at any corpus scale — driver-side power iteration
    // on the collected aggregate (ivf-centroid / pagerank precedent)
    val upper = cov.collect()
      .filter(!_.isNullAt(2)) // n=0 cells divide to NULL on an empty corpus
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    if (upper.isEmpty) {
      Seq.empty[(Long, Double, Double, Double)]
        .toDF("dim", "loading", "eigval", "var_share")
    } else {
    val c = Array.ofDim[Double](65, 65)
    upper.foreach { case (i, j, v) => c(i)(j) = v; c(j)(i) = v }
    var v = Array.fill(65)(0.125); v(0) = 0.0
    (1 to 8).foreach { _ =>
      val nv = Array.ofDim[Double](65)
      var i = 1
      while (i <= 64) {
        var acc = 0.0; var j = 1
        while (j <= 64) { acc += c(i)(j) * v(j); j += 1 }
        nv(i) = acc; i += 1
      }
      v = nv
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val u = v.map(_ / norm)
    var lambda = 0.0
    for (i <- 1 to 64; j <- 1 to 64) lambda += u(i) * c(i)(j) * u(j)
    val trace = (1 to 64).map(i => c(i)(i)).sum
    def r6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    (1 to 64).map(i => (i.toLong, r6(u(i)), r6(lambda), r6(lambda / trace)))
      .toDF("dim", "loading", "eigval", "var_share")
      .orderBy(col("dim"))
    }
  }

  def all: Seq[Q] = Seq(embeddingPcaTop)
}
