package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Graph analytics beyond connected components (SURVEY.md §2A;
  * dedup_cluster's star contraction covers CC): weighted PageRank over
  * the nation-level trade graph. The heavy work — deriving the
  * supplier-nation → customer-nation edge aggregate from
  * lineitem⋈supplier⋈orders⋈customer — is fully distributed
  * (one shuffle per join, partial-aggregable counts); the iteration
  * then runs driver-side over the collected edge aggregate, which is
  * BOUNDED by |nations|² ≤ 625 rows at any corpus scale (the
  * ann_ivf driver-held-centroids precedent — the collect is over an
  * aggregate whose cardinality is data-model-bounded, never the
  * corpus).
  *
  * Float discipline: per-iteration scores are rounded to 12 dp on both
  * engines, which absorbs the ≤1e-15 accumulation-order noise of
  * summing ≤25 double contributions (each contribution is the same two
  * IEEE ops, (p·w)/outw, on both sides) while leaving the 8-dp
  * declared output far from the rounding boundary.
  */
object GraphQ {

  private def round12(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue

  /** 10 damped (α=0.85) weighted PageRank iterations over nation→nation
    * trade edges (weight = lineitem count). The declared semantic is
    * simplified PR — dangling nodes (no out-edges) do NOT redistribute
    * their mass — stated identically in both engines, so results
    * hash-match at every scale; on subsamples sparse enough to leave a
    * nation without suppliers the total mass is < 1 by exactly the
    * dangling leak (spec-pinned), and at sf0.01+ all 25 nations trade
    * and mass ≈ 1.
    */
  val graphPagerank: Q = Q(
    "graph_pagerank",
    """WITH RECURSIVE edges AS (
      |  SELECT sn.n_name AS src, cn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  GROUP BY 1, 2),
      |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS n FROM edges UNION SELECT DISTINCT dst FROM edges),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM (SELECT DISTINCT n FROM nodes)),
      |pr AS (
      |  SELECT 0 AS iter, n, round(1.0 / (SELECT c FROM nn), 12) AS p
      |  FROM (SELECT DISTINCT n FROM nodes)
      |  UNION ALL
      |  SELECT iter + 1, nodes2.n,
      |         round(0.15 / (SELECT c FROM nn) + 0.85 * coalesce(contrib.s, 0), 12)
      |  FROM (SELECT DISTINCT n FROM nodes) nodes2
      |  JOIN (SELECT iter FROM pr GROUP BY iter) it ON it.iter < 10
      |  LEFT JOIN (
      |    SELECT pr.iter AS ci, e.dst, sum(pr.p * e.w / o.ow) AS s
      |    FROM pr JOIN edges e ON pr.n = e.src JOIN outw o ON o.src = e.src
      |    GROUP BY 1, 2) contrib
      |  ON contrib.dst = nodes2.n AND contrib.ci = it.iter)
      |SELECT n AS nation, round(p, 8) AS pagerank
      |FROM pr WHERE iter = 10 ORDER BY nation NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val sn = T.nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = T.nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    val edgesDf = T.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    // bounded |nations|² aggregate — the one sanctioned collect shape
    val edges = edgesDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outw = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val result: Seq[(String, Double)] =
      if (n == 0) Seq.empty
      else {
        var p = nodes.map(_ -> round12(1.0 / n)).toMap
        for (_ <- 1 to 10) {
          val contrib = scala.collection.mutable.Map.empty[String, Double]
            .withDefaultValue(0.0)
          edges.foreach { case (src, dst, w) =>
            contrib(dst) += p(src) * w / outw(src)
          }
          p = nodes.map(nd => nd -> round12(0.15 / n + 0.85 * contrib(nd))).toMap
        }
        nodes.map(nd => nd -> p(nd)).toSeq
      }
    import s.implicits._
    result.toDF("nation", "pagerank")
      .select(col("nation"), round(col("pagerank"), 8).as("pagerank"))
      .orderBy(col("nation").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(graphPagerank)
}
