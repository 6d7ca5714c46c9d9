package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 third wave (graph side): closeness centrality —
  * which nation sits nearest to ALL others in the trade topology
  * (graph_pagerank ranks by mass flow, graph_shortest_path measures
  * from one source; closeness summarizes every node's whole distance
  * profile).
  */
object GraphQ2 {

  /** Wasserman–Faust closeness centrality over the mean-thresholded
    * undirected trade graph: for each node u, r = |reachable|, S = Σ
    * hop distances; CC(u) = ((r−1)/(n−1))·((r−1)/S) — the
    * disconnection-robust normalization (plain 1/S inflates isolated
    * cliques). The corpus-scale work is the fully distributed 4-join
    * edge derivation; the edge list is |nations|²-bounded at ANY
    * corpus scale, so the all-sources BFS runs driver-side on the
    * collected aggregate (graph_shortest_path / GraphQ.scala:83
    * precedent). Oracle: DuckDB recursive CTE BFS from EVERY node with
    * UNION dedup + depth bound; min(d) per (src, node) = hop distance.
    */
  val graphCloseness: Q = Q(
    "graph_closeness",
    """WITH RECURSIVE de AS (
      |  SELECT sn.n_name AS src, cn.n_name AS dst, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  WHERE sn.n_name <> cn.n_name
      |  GROUP BY 1, 2),
      |pw AS (
      |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
      |         CAST(sum(w) AS BIGINT) AS pwt
      |  FROM de GROUP BY 1, 2),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS np,
      |               CAST(sum(pwt) AS BIGINT) AS tw FROM pw),
      |e AS (SELECT a, b FROM pw CROSS JOIN tot WHERE pwt * np > tw),
      |-- NOTE: a top-level UNION in a non-recursive CTE misbehaves under
      |-- WITH RECURSIVE in DuckDB 1.x (acts like UNION ALL — measured 44
      |-- vs 25 nodes); keep the set-op inside a derived table instead
      |nodes AS (SELECT DISTINCT n FROM
      |            (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
      |walk(s0, n, d) AS (
      |  SELECT n, n, 0 FROM nodes
      |  UNION
      |  SELECT w.s0, CASE WHEN w.n = e.a THEN e.b ELSE e.a END, w.d + 1
      |  FROM walk w JOIN e ON w.n = e.a OR w.n = e.b
      |  WHERE w.d < 30),
      |dist AS (
      |  SELECT s0, n, CAST(min(d) AS BIGINT) AS d
      |  FROM walk GROUP BY 1, 2),
      |prof AS (
      |  SELECT s0, CAST(count(*) AS BIGINT) AS r, CAST(sum(d) AS BIGINT) AS sd
      |  FROM dist GROUP BY 1)
      |SELECT s0 AS nation, r AS reachable, sd AS sum_dist,
      |       round(CAST((r - 1) * (r - 1) AS DOUBLE)
      |             / (CAST(n_nodes - 1 AS DOUBLE) * CAST(sd AS DOUBLE)), 6) AS closeness
      |FROM prof CROSS JOIN nn
      |ORDER BY nation NULLS FIRST""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val sn = T.nation(s, d).select(col("n_nationkey").as("snk"), col("n_name").as("src"))
    val cn = T.nation(s, d).select(col("n_nationkey").as("cnk"), col("n_name").as("dst"))
    val de = T.lineitem(s, d).select(col("l_suppkey"), col("l_orderkey"))
      .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    val pw = de.groupBy(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("pwt"))
    val tot = pw.agg(count(lit(1)).as("np"), sum(col("pwt")).cast("long").as("tw"))
    val e = pw.crossJoin(broadcast(tot))
      .filter(col("pwt") * col("np") > col("tw"))
      .select(col("a"), col("b"))
    // ≤ |nations|²/2 rows by construction — driver-side all-sources BFS
    // on the collected aggregate (graph_shortest_path precedent)
    val edges = e.collect().map(r => (r.getString(0), r.getString(1)))
    if (edges.isEmpty) {
      Seq.empty[(String, Long, Long, Double)]
        .toDF("nation", "reachable", "sum_dist", "closeness")
    } else {
      val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val nodes = adj.keySet
      val nNodes = nodes.size.toLong
      val rows = nodes.toSeq.sorted.map { src =>
        var dist = Map(src -> 0L)
        var frontier = Set(src)
        var dcur = 0L
        while (frontier.nonEmpty && dcur < 30) {
          dcur += 1
          val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
          dist ++= next.iterator.map(_ -> dcur)
          frontier = next
        }
        val r = dist.size.toLong
        val sd = dist.values.sum
        val cc = ((r - 1) * (r - 1)).toDouble / ((nNodes - 1).toDouble * sd.toDouble)
        (src, r, sd,
          new java.math.BigDecimal(cc)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      }
      rows.toDF("nation", "reachable", "sum_dist", "closeness")
        .orderBy(col("nation").asc_nulls_first)
    }
  }

  def all: Seq[Q] = Seq(graphCloseness)
}
