package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 ninth wave (graph side): the maximum spanning
  * backbone of the trade graph — the minimal edge set that keeps every
  * thresholded trading bloc connected at the strongest weights, the
  * classic network-simplification view (pagerank ranks nodes;
  * the backbone ranks which EDGES matter).
  */
object GraphQ3 {

  /** B33 — maximum-weight spanning forest via Kruskal over the
    * mean-thresholded trade edges: edges sorted (weight DESC, a, b —
    * a total order, so tie-breaks are deterministic), union-find
    * accepts an edge iff it joins two components. Rows-only: MST
    * needs union-find, which SQL cannot express (the dedup_cluster
    * star-contraction could build it distributively if the graph
    * scaled with the corpus; here the edge list is |nations|²-bounded
    * at any scale, so the forest runs driver-side on the collected
    * aggregate — the graph_shortest_path precedent). Output: accepted
    * edges with their rank + a summary-consistency flag (|forest| =
    * |nodes| − |components|, pinned in Wave9Spec against an
    * independent edge derivation).
    */
  val graphMstBackbone: Q = Q.noOracle("b33_graph_mst") { (s, d) =>
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
      .agg(sum(col("w")).cast("long").as("pwt"))
    val tot = pw.agg(count(lit(1)).as("np"), sum(col("pwt")).cast("long").as("tw"))
    val e = pw.crossJoin(broadcast(tot))
      .filter(col("pwt") * col("np") > col("tw"))
      .select(col("a"), col("b"), col("pwt"))
    // |nations|²-bounded — Kruskal driver-side on the collected aggregate
    val edges = e.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy { case (a, b, w) => (-w, a, b) }
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val accepted = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    edges.foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        parent(ra) = rb
        accepted += ((accepted.size + 1L, a, b, w))
      }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = nodes.map(find).distinct.length
    val ok = accepted.size == nodes.length - comps
    accepted.toSeq.map { case (rk, a, b, w) => (rk, a, b, w, ok) }
      .toDF("rank", "a", "b", "weight", "forest_consistent")
      .orderBy(col("rank"))
  }

  def all: Seq[Q] = Seq(graphMstBackbone)
}
