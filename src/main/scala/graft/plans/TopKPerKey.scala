package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable

/** Custom whole-operator: PER-KEY TOP-K with bounded heaps — the
  * SURVEY §4 tier-(c) exercise (custom LogicalPlan + SparkStrategy +
  * physical SparkPlan) for semantics Spark's built-ins can only
  * express wastefully. The idiomatic `row_number() OVER (PARTITION BY
  * k ORDER BY v) <= K` plan SORTS EVERY ROW of every group and
  * shuffles the full input; at 100 TB that is a full-corpus sort for a
  * K-row-per-key answer. This operator keeps an O(K) buffer per key:
  *
  *   partial TopKPerKeyExec   (map side: ≤K rows per key per partition)
  *     → Exchange on the keys (EnsureRequirements inserts it from the
  *        final's ClusteredDistribution requirement)
  *   final TopKPerKeyExec     (merge: ≤K rows per key, exact)
  *
  * so the shuffle moves at most K·parts rows per key and NOTHING is
  * ever fully sorted — the same partial/final contract hash aggregation
  * uses, applied to order statistics. Correct because top-K is a
  * semigroup: topK(A ∪ B) = topK(topK(A) ∪ topK(B)).
  *
  * Determinism: the total order is (ord DESC, tiebreak ASC), both
  * BIGINT expressions — exact integer comparisons, no float ordering.
  * Registered per-session through the PUBLIC
  * `spark.experimental.extraStrategies` hook (idempotent).
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    ord: Expression,
    tiebreak: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    ord: Expression,
    tiebreak: Expression,
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = Seq(ord, tiebreak)
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val sortProj = UnsafeProjection.create(sortExprs, childOutput)
      // per key: append, re-sort + truncate at 2K (O(1) amortized,
      // O(K) memory); once saturated, rows not beating the kth-best
      // threshold are rejected BEFORE the UnsafeRow copy — on a hot
      // key almost every row takes this no-allocation fast path
      final class KeyBuf {
        val items = new mutable.ArrayBuffer[(Long, Long, UnsafeRow)](2 * kLocal)
        private var thrO = Long.MinValue
        private var thrT = Long.MaxValue
        private var saturated = false
        private def shrink(): Unit = {
          val kept = items.sortBy(t => (-t._1, t._2)).take(kLocal)
          items.clear(); items ++= kept
          val last = kept.last
          thrO = last._1; thrT = last._2; saturated = true
        }
        def add(o: Long, t: Long, row: InternalRow): Unit = {
          if (!saturated || o > thrO || (o == thrO && t < thrT)) {
            items += ((o, t, row.copy().asInstanceOf[UnsafeRow]))
            if (items.length >= 2 * kLocal) shrink()
          }
        }
        def topK: Iterator[UnsafeRow] =
          items.sortBy(t => (-t._1, t._2)).take(kLocal).iterator.map(_._3)
      }
      val buffers = mutable.HashMap.empty[UnsafeRow, KeyBuf]
      iter.foreach { row =>
        val s = sortProj(row)
        buffers.getOrElseUpdate(keyProj(row).copy(), new KeyBuf)
          .add(s.getLong(0), s.getLong(1), row)
      }
      buffers.valuesIterator.flatMap(_.topK)
    }, preservesPartitioning = true)
  }
}

/** Custom optimizer Rule (the §4 tier-(c) `Rule[LogicalPlan]` leg):
  * COLUMN PRUNING THROUGH TopKPerKeyPlan. The node's output mirrors
  * its child, so Catalyst's own ColumnPruning — which only knows
  * built-in nodes — cannot push a projection below it: without this
  * rule, `TopKPerKey(wide_df, ...).select(two_cols)` scans every
  * column of the wide table. The rule rewrites
  * `Project(p, TopKPerKey(child))` → `Project(p, TopKPerKey(
  * Project(needed, child)))` where needed = p's references ∪ the
  * operator's own key/ord/tiebreak references, firing only when that
  * set is strictly smaller than the child's output (the no-op guard
  * that keeps the rule from looping). The pruning then cascades into
  * the parquet scan's ReadSchema (pinned in TopKPerKeySpec).
  */
object TopKColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(exprs, t: TopKPerKeyPlan) =>
      val needed = AttributeSet(exprs.flatMap(_.references)) ++
        AttributeSet((t.keys :+ t.ord :+ t.tiebreak).flatMap(_.references))
      if (needed.size < t.child.outputSet.size) {
        val kept = t.child.output.filter(needed.contains)
        Project(exprs, t.copy(child = Project(kept, t.child)))
      } else p
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKeyPlan =>
      TopKPerKeyExec(t.keys, t.ord, t.tiebreak, t.k, partial = false,
        TopKPerKeyExec(t.keys, t.ord, t.tiebreak, t.k, partial = true,
          planLater(t.child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Top-k rows per key group, ordered by (ord DESC, tiebreak ASC) —
    * both must be integral columns of `df`, and `tiebreakCol` must be
    * UNIQUE within each key group (the saturation fast-path rejects
    * exact (ord, tiebreak) ties, and without a unique tiebreak the
    * answer is nondeterministic under any formulation, window included).
    * Registers the strategy idempotently via the public
    * experimental-methods hook.
    *
    * Measured honestly (graft.TopKProbe, sf10 = 100× bench scale,
    * median-of-3): Spark 4's own `InsertWindowGroupLimit` already
    * rewrites `row_number() <= k` into a partial/final bounded
    * group-limit — the built-in window formulation is NOT the naive
    * full-sort and remains the recommended Spark-first path. This
    * operator's threshold fast-path (no UnsafeRow copy for rows below
    * the kth-best) still edges it out: 9.5 s vs 11.4 s at sf10 (1.19×)
    * — the margin is the avoided per-group sort insertion, not
    * asymptotics. Both are sub-linear across two decades.
    */
  def apply(df: DataFrame, keyCols: Seq[String], ordCol: String,
      tiebreakCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(TopKColumnPruning)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKColumnPruning
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val plan = TopKPerKeyPlan(keyCols.map(attr), attr(ordCol), attr(tiebreakCol), k, analyzed)
    org.apache.spark.sql.GraftPlanShims.ofRows(spark, plan)
  }
}
