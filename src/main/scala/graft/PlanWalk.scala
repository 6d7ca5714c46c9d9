package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan walks shared by the PlanQualitySpec gates and the
  * `graft.PlanAudit` CLI. Two scale-risk classes are detected
  * STRUCTURALLY (not by string-matching the plan dump):
  *
  *  1. unpartitioned windows — WindowExec with an empty partitionSpec
  *     moves ALL rows to one partition; benign only when the input is
  *     cardinality-bounded by construction (a ≤1024-row model table, a
  *     |nations|²-bounded aggregate), fatal when it's corpus-
  *     proportional;
  *
  *  2. skew-risk shuffle joins — an equi-join keyed on a SKEWABLE id
  *     (a fact-table FK a heavy-hitter corpus concentrates: o_custkey,
  *     l_suppkey, l_partkey, user_id — the exact columns graft.SkewUp
  *     remaps; table PKs like doc_id/vec_id can't skew, they're unique)
  *     where BOTH inputs are corpus-proportional and un-reduced. That
  *     is the fact×fact pair-emitting shape that went quadratic in
  *     event_attribution under 30% skew (r11: 1.16 s → 197 s) — a
  *     one-side-aggregated join stays linear (≤1 row per key on the
  *     reduced side), and broadcast joins never shuffle the probe side
  *     on the key, so neither is flagged.
  */
object PlanWalk {

  /** FKs a heavy-hitter workload concentrates (graft.SkewUp's remap set). */
  val skewableIds: Set[String] = Set("o_custkey", "l_suppkey", "l_partkey", "user_id")

  /** Corpus-proportional tables: everything that grows with SF except
    * the classic dims (region/nation/customer/supplier/part), whose
    * skewable columns are their PRIMARY keys — unique per row, so a
    * join against them is ≤1 matched row per key even under FK skew.
    */
  val factTables: Set[String] = Set("orders", "lineitem", "events", "documents", "embeddings")

  /** Unpartitioned WindowExec nodes (each sorts its whole input on ONE
    * partition at scale).
    */
  def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] =
    p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  private def scansFact(p: SparkPlan): Boolean = p.collectFirst {
    case f: FileSourceScanExec if f.relation.location.rootPaths.exists(rp =>
      factTables.exists(t => rp.toString.contains(s"/$t.parquet"))) => ()
  }.isDefined

  /** Whether the subtree contains a cardinality-reducing barrier between
    * its scans and the join: any aggregate (per-key multiplicity
    * collapses to 1 for the grouped keys) or a limit/top-k (bounded row
    * count outright). Heuristic, not a proof — an aggregate grouped on
    * a DIFFERENT key than the join key still passes; the gate's pinned
    * expected-set in PlanQualitySpec is the review point for those.
    */
  private def reduced(p: SparkPlan): Boolean = p.collectFirst {
    case _: BaseAggregateExec => ()
    case _: GlobalLimitExec => ()
    case _: TakeOrderedAndProjectExec => ()
  }.isDefined

  private def onSkewableKey(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Option[String] =
    keys.flatMap(_.references.map(_.name)).find(skewableIds)

  /** Skew-risk joins: shuffle equi-joins (SortMergeJoin/ShuffledHashJoin
    * — the strategies that PARTITION BY the key) on a skewable id where
    * both children are fact-proportional and un-reduced. Run with
    * autoBroadcastJoinThreshold = -1 so the sf0.001 plan shows the join
    * strategy the SAME query gets at scale (tiny test inputs otherwise
    * auto-broadcast everything; explicit broadcast() hints survive,
    * which is correct — a hinted build side is small at every SF).
    */
  def skewRiskJoins(p: SparkPlan): Seq[String] = p.collect {
    case j: SortMergeJoinExec => (j: SparkPlan, j.leftKeys ++ j.rightKeys, j.left, j.right)
    case j: ShuffledHashJoinExec => (j: SparkPlan, j.leftKeys ++ j.rightKeys, j.left, j.right)
  }.flatMap { case (j, keys, l, r) =>
    onSkewableKey(keys) match {
      case Some(k) if scansFact(l) && !reduced(l) && scansFact(r) && !reduced(r) =>
        Some(s"${j.nodeName} on $k (both sides un-reduced fact scans)")
      case _ => None
    }
  }
}
