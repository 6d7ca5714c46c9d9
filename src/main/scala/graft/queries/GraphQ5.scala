package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-10 graph leg: k-core decomposition — each node's core number
  * (the largest k such that the node survives iterated deletion of all
  * nodes with degree < k) over the mean-thresholded undirected nation
  * trade graph (the graph_closeness edge derivation). Core number is
  * the standard cohesion measure the family lacked beside centrality
  * (pagerank/closeness), community (label propagation), and structure
  * counts (triangles/reciprocity/assortativity).
  */
object GraphQ5 {

  /** Pure peeling on a bounded edge list — driver-side by design (the
    * graph_pagerank sanctioned-collect precedent; the graph is
    * |nations|²-bounded at ANY corpus scale). Mirrors the oracle
    * exactly: for EACH k independently, start from the full node set
    * and run 25 peel rounds (a 25-node graph reaches its fixpoint in
    * <= 25 removals, so 25 synchronous rounds always suffice).
    */
  def kcore(nodes: Seq[Int], edges: Seq[(Int, Int)], kMax: Int = 24): Map[Int, Int] = {
    val cores = scala.collection.mutable.Map(nodes.map(_ -> 0): _*)
    for (k <- 1 to kMax) {
      var alive = nodes.toSet
      for (_ <- 1 to 25) {
        val cur = alive
        alive = cur.filter { n =>
          edges.count { case (a, b) =>
            (a == n && cur(b)) || (b == n && cur(a))
          } >= k
        }
      }
      alive.foreach(n => cores(n) = k)
    }
    cores.toMap
  }

  /** The recursive-CTE oracle carries the ALIVE SET and the EDGE LIST
    * as list columns in the iteration state (one self-reference only —
    * standard SQL's recursive-term limit; a second alive-set join would
    * need two). Spark side: the edge derivation (4 joins + threshold)
    * is fully distributed; peeling runs on the collected bounded
    * aggregate.
    */
  val graphKCore: Q = Q(
    "graph_k_core",
    """WITH RECURSIVE de AS (
      |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE s.s_nationkey IS NOT NULL AND c.c_nationkey IS NOT NULL
      |    AND s.s_nationkey <> c.c_nationkey
      |  GROUP BY 1, 2),
      |pw AS (
      |  SELECT least(src, dst) AS a, greatest(src, dst) AS b, CAST(sum(w) AS BIGINT) AS pwt
      |  FROM de GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS np, CAST(sum(pwt) AS BIGINT) AS tw FROM pw),
      |e AS (SELECT a, b FROM pw CROSS JOIN tot WHERE pwt * np > tw),
      |nodes AS (SELECT DISTINCT n FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
      |el AS (SELECT list({'a': a, 'b': b} ORDER BY a, b) AS edges FROM e),
      |nl AS (SELECT list(n ORDER BY n) AS ns FROM nodes),
      |peel(k, iter, alive, edges) AS (
      |  SELECT k, 0, nl.ns, el.edges
      |  FROM generate_series(1, 24) g(k) CROSS JOIN nl CROSS JOIN el
      |  UNION ALL
      |  SELECT k, iter + 1,
      |         list_filter(alive, n ->
      |           len(list_filter(edges, ed ->
      |             (ed.a = n AND list_contains(alive, ed.b)) OR
      |             (ed.b = n AND list_contains(alive, ed.a)))) >= k),
      |         edges
      |  FROM peel WHERE iter < 25),
      |fin AS (SELECT k, alive FROM peel WHERE iter = 25),
      |core AS (
      |  SELECT nn.n_nationkey, coalesce(max(f.k), 0) AS core
      |  FROM nation nn
      |  LEFT JOIN fin f ON list_contains(f.alive, nn.n_nationkey)
      |  GROUP BY 1)
      |SELECT n.n_name AS nation, CAST(c.core AS BIGINT) AS core
      |FROM core c JOIN nation n ON c.n_nationkey = n.n_nationkey
      |ORDER BY core DESC NULLS LAST, nation ASC NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val de = T.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      // a NULL nation key is an unattributable edge — excluded symmetrically
      .filter(col("s_nationkey").isNotNull && col("c_nationkey").isNotNull
        && col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val pw = de.groupBy(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("pwt"))
    val tot = pw.agg(count(lit(1)).as("np"), sum(col("pwt")).as("tw"))
    val e = pw.crossJoin(broadcast(tot))
      .filter(col("pwt") * col("np") > col("tw"))
      .select(col("a"), col("b"))
    // bounded |nations|² aggregate — the one sanctioned collect shape
    val edges = e.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val cores = kcore(nodes, edges)
    val nations = T.nation(s, d).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => r.getInt(0) -> r.getString(1))
    import s.implicits._
    nations.map { case (key, nm) => (nm, cores.getOrElse(key, 0).toLong) }.toSeq
      .toDF("nation", "core")
      .orderBy(col("core").desc_nulls_last, col("nation").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(graphKCore)
}
