package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Community detection via synchronous weighted label propagation over
  * the nation-level trade graph — the graph-analytics leg the family
  * still lacked beside PageRank (GraphQ), closeness (GraphQ2), MST
  * (GraphQ3), components (dedup_cluster) and triangles/assortativity/
  * reciprocity (Stats*).
  *
  * Declared LPA semantics (every clause stated identically in both
  * engines, so results hash-match at any scale):
  *  - undirected view: weight(a,b) = w(a→b) + w(b→a);
  *  - every node also carries a ZERO-weight self-loop, which makes its
  *    own label a candidate at its true neighbor support (+0) and keeps
  *    isolated nodes alive as singleton communities;
  *  - synchronous update: label(t+1, n) = argmax over candidate labels
  *    L of Σ weight(n,m) [label(t,m) = L], tie broken by SMALLEST label
  *    key;
  *  - 4 iterations, labels initialised to each node's own key.
  *
  * Determinism device: the per-node argmax is computed as
  * max(s·32 + (31 − lab)) — one BIGINT aggregate encodes (max score,
  * then min label) exactly, so no engine-specific arg_max/max_by tie
  * behavior is involved and ALL math is integer (no float discipline
  * needed at all). 25 nation keys < 32; s ≤ Σw ≤ |lineitem|, so the
  * encoding fits BIGINT beyond 100 TB.
  *
  * Scale shape: the edge derivation (lineitem⋈supplier⋈orders⋈customer
  * grouped by nation pair) is fully distributed and partial-aggregable;
  * the iteration runs driver-side over the collected aggregate, BOUNDED
  * by |nations|² ≤ 625 rows at any corpus scale (the graph_pagerank
  * sanctioned-collect precedent).
  */
object GraphQ4 {

  /** Pure LPA iteration over a bounded symmetrized edge list —
    * driver-side by design (GraphQ4Spec pins barbell split, tie-break,
    * isolated-node survival on planted graphs).
    */
  def lpa(nodes: Seq[Int], sym: Seq[(Int, Int, Long)], iters: Int): Map[Int, Int] = {
    var lab = nodes.map(n => n -> n).toMap
    // zero-weight self-loops: own label always a candidate at +0
    val withSelf = sym ++ nodes.map(n => (n, n, 0L))
    for (_ <- 1 to iters) {
      val cur = lab
      lab = withSelf
        .map { case (a, b, w) => (a, cur(b), w) }
        .groupBy { case (a, l, _) => (a, l) }
        .toSeq // BEFORE mapping to (a, enc) pairs — a Map.map would collapse same-a entries
        .map { case ((a, l), es) => (a, es.map(_._3).sum * 32 + (31 - l)) }
        .groupBy(_._1)
        .map { case (a, encs) => a -> (31 - (encs.map(_._2).max % 32)).toInt }
    }
    lab
  }

  val graphLabelPropagation: Q = Q(
    "graph_label_propagation",
    """WITH RECURSIVE dedges AS (
      |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
      |         CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE s.s_nationkey IS NOT NULL AND c.c_nationkey IS NOT NULL
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
      |    SELECT src AS a, dst AS b, w FROM dedges
      |    UNION ALL SELECT dst, src, w FROM dedges
      |    UNION ALL SELECT n_nationkey, n_nationkey, 0 FROM nation)
      |  GROUP BY 1, 2),
      |labels AS (
      |  SELECT 0 AS iter, n_nationkey AS n, CAST(n_nationkey AS BIGINT) AS lab
      |  FROM nation
      |  UNION ALL
      |  SELECT sub.iter + 1, sub.n, 31 - (max(sub.enc) % 32)
      |  FROM (
      |    SELECT l.iter AS iter, e.a AS n, sum(e.w) * 32 + (31 - l.lab) AS enc
      |    FROM labels l JOIN sym e ON l.n = e.b
      |    WHERE l.iter < 4
      |    GROUP BY l.iter, e.a, l.lab) sub
      |  GROUP BY sub.iter, sub.n)
      |SELECT na.n_name AS nation, nb.n_name AS community
      |FROM labels l
      |JOIN nation na ON l.n = na.n_nationkey
      |JOIN nation nb ON l.lab = nb.n_nationkey
      |WHERE l.iter = 4
      |ORDER BY nation NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val dedges = T.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      // a NULL nation key is an unattributable edge — excluded symmetrically
      .filter(col("s_nationkey").isNotNull && col("c_nationkey").isNotNull)
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    // bounded |nations|² aggregate — the one sanctioned collect shape
    val es = dedges.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val sym = (es ++ es.map { case (a, b, w) => (b, a, w) })
      .groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), g) => (a, b, g.map(_._3).sum) }
      .toSeq
    val nations = T.nation(s, d).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1))
    val lab = lpa(nations.map(_._1).toSeq, sym, 4)
    val name = nations.toMap
    import s.implicits._
    nations.map { case (k, nm) => (nm, name(lab(k))) }.toSeq
      .toDF("nation", "community")
      .orderBy(col("nation").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(graphLabelPropagation)
}
