package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, GenerateExec, GlobalLimitExec, ProjectExec, SparkPlan, TakeOrderedAndProjectExec, UnionExec}
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
  *  2. skew-risk shuffle joins — an equi-join whose key resolves (through
  *     Project/Alias lineage) to a NON-UNIQUE fact-table key column on
  *     BOTH sides, with both inputs corpus-proportional and carrying an
  *     un-reduced fact-scan path to the join. That is the fact×fact
  *     pair-emitting shape that went quadratic in event_attribution
  *     under 30% skew (r11: 1.16 s → 197 s): a hot key with multiplicity
  *     m on both sides emits m² rows. Three shapes stay LINEAR and are
  *     deliberately not flagged: a one-side-aggregated join (≤1 row per
  *     key on the reduced side), a join whose key is UNIQUE on one side
  *     (a PK — ≤1 matched row per probe, so orders⋈lineitem on orderkey
  *     is m×1), and broadcast joins (never shuffle the probe side).
  *
  * r13 hardening (VERDICT r12 item 1): join keys are resolved to their
  * ORIGIN scan columns through ProjectExec Alias chains, so
  * `withColumn("uid", col("user_id"))` or `concat(user_id, bucket)`
  * cannot slip the match; and the reduction check walks the PATH from
  * each fact scan to the join (an un-reduced fact scan joined alongside
  * an aggregated sibling branch no longer escapes).
  */
object PlanWalk {

  /** Non-unique fact-table key columns a heavy-hitter workload can
    * concentrate. The pinned MINIMUM is graft.SkewUp's remap set; the
    * gate runs on `skewableIds ++ deriveSkewableIds(...)` so a fixture
    * column that is renamed or added later cannot silently exit the
    * gate (VERDICT r12 item 4).
    */
  val skewableIds: Set[String] = Set("o_custkey", "l_suppkey", "l_partkey", "user_id")

  /** Corpus-proportional tables: everything that grows with SF except
    * the classic dims (region/nation/customer/supplier/part), whose
    * skewable columns are their PRIMARY keys — unique per row, so a
    * join against them is ≤1 matched row per key even under FK skew.
    */
  val factTables: Set[String] = Set("orders", "lineitem", "events", "documents", "embeddings")

  /** Derive the skew-candidate set from the fixture data itself: every
    * key-named column (`*_id` / `*key`) of a fact table that is
    * NON-UNIQUE in that table. Uniqueness is measured on the given sf
    * dir (sf0.001 suffices: the generators keep FK multiplicity shapes
    * across SFs). Unique columns (PKs: o_orderkey-in-orders, event_id,
    * doc_id, vec_id) can't concentrate — every key has exactly one row.
    */
  def deriveSkewableIds(spark: SparkSession, sfDir: String): Set[String] = {
    import org.apache.spark.sql.functions.{count_distinct, col, count, lit}
    val keyName = "(?i)(_id|key)$".r
    factTables.flatMap { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val keyCols = df.columns.filter(c => keyName.findFirstIn(c).isDefined)
      if (keyCols.isEmpty) Nil
      else {
        // non-uniqueness = distinct < NON-NULL count, column by column:
        // count_distinct ignores NULLs, so comparing against count(*)
        // would misclassify a unique-but-nullable key (e.g. a
        // nulled-corpus dir) as skewable (ADVICE r13). But a MOSTLY-NULL
        // key is its own skew vector even when its non-null values are
        // unique: NULL keys all hash to one partition in shuffle OUTER
        // joins (inner equi-joins drop them before the shuffle matters)
        // — so a column whose NULL fraction exceeds 1/3 also derives
        // (ADVICE r14; 1/3 of all rows on one of 32 partitions is a
        // >10x concentration, while the nulled-corpus gate fixtures
        // stay in the 10-30% band and must keep deriving by
        // multiplicity, not by NULL mass).
        val aggs = keyCols.flatMap(c =>
          Seq(count_distinct(col(c)).as(s"d_$c"), count(col(c)).as(s"n_$c"))) :+
          count(lit(1)).as("rows")
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        val rows = r.getLong(2 * keyCols.length)
        keyCols.zipWithIndex.collect {
          case (c, i)
              if r.getLong(2 * i) < r.getLong(2 * i + 1) ||
                (rows - r.getLong(2 * i + 1)).toDouble > rows / 3.0 => c
        }
      }
    }
  }

  /** Loop-invariant EXPENSIVE expressions inside higher-order-function
    * lambdas anywhere in a PHYSICAL plan — the r14 find (jstack on the
    * sf100 probe): `PushPredicateThroughProject` substitutes a
    * `split(text).as("t")` alias chain into a pushed-down filter
    * condition (e.g. `filter(size(shingles) > 0)`), leaving a Filter
    * that re-derives the tokenization with the split INLINED INSIDE
    * the shingle lambda — the document is re-split PER LAMBDA ELEMENT,
    * O(tokens²) per row. Measured 49.0 s vs 21.7 s at sf1 on the
    * 3-gram shingle count alone.
    *
    * r15 generalization (VERDICT r14 item 5): the inline-into-lambda
    * mechanism is expression-agnostic — any expensive string/parse
    * kernel an alias chain feeds into a pushed predicate gets the same
    * O(n·cost) re-evaluation — so the detector now covers the regexp
    * family (regexp_extract/_all, regexp_replace, like/rlike),
    * from_json and sentences alongside split.
    *
    * Invariance is judged against the INNERMOST enclosing lambda's OWN
    * arguments (ADVICE r14): an expression referencing only an OUTER
    * lambda's variable inside a nested lambda is still re-evaluated per
    * INNER element. An expression consuming the enclosing lambda's own
    * element is per-element work (linear, legitimate) and is not
    * flagged. The walk descends into InMemoryTableScanExec cached plans
    * (Lsh caches its hashed corpus, which is exactly where the burned
    * filter lived — a logical-plan walk sees none of it). Fix sites
    * with a cheap pre-filter (e.g. `size(split(...)) >= n`, linear) or
    * graft.functions.TextOps.let1 (lambda variables are never inlined).
    */
  def loopInvariantExpensiveInLambdas(p: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, JsonToStructs, LambdaFunction, Like, NamedLambdaVariable, RegExpExtract, RegExpExtractAll, RegExpReplace, RLike, Sentences, StringSplit}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def expensive(e: Expression): Option[String] = e match {
      case _: StringSplit      => Some("split")
      case _: RegExpExtract    => Some("regexp_extract")
      case _: RegExpExtractAll => Some("regexp_extract_all")
      case _: RegExpReplace    => Some("regexp_replace")
      case _: Like             => Some("like")
      case _: RLike            => Some("rlike")
      case _: JsonToStructs    => Some("from_json")
      case _: Sentences        => Some("sentences")
      case _                   => None
    }
    // `scope` = the innermost enclosing lambda's argument ids (None when
    // outside any lambda); `hof` = that lambda's owning HOF, for the
    // message. A hit reports ONCE per offending site: a composite of
    // invariant expensive calls (regexp_replace over split) is one
    // site, so the hit's subtree is NOT re-walked for more expensive
    // nodes (ADVICE r15 — duplicate audit noise) EXCEPT into nested
    // LambdaFunctions, which open a new scope and can hide a second,
    // independent offense.
    def walk(e: Expression, hof: Option[String], scope: Option[Set[ExprId]]): Seq[String] = {
      val hit = (scope, expensive(e)) match {
        case (Some(args), Some(nm))
            if e.collect { case v: NamedLambdaVariable => v.exprId }
              .toSet.intersect(args).isEmpty =>
          Seq(s"loop-invariant $nm ${e.sql.take(80)} inside ${hof.getOrElse("?")} lambda")
        case _ => Nil
      }
      if (hit.nonEmpty) {
        // only nested lambdas (new scopes) inside the flagged subtree;
        // TOPMOST HOFs only — walking each one recurses into anything
        // deeper, so collecting all of them would double-report
        def topHofs(x: Expression): Seq[HigherOrderFunction] = x match {
          case h: HigherOrderFunction => Seq(h)
          case _ => x.children.flatMap(topHofs)
        }
        val nested = e.children.flatMap(topHofs).flatMap(h =>
          h.functions.flatMap {
            case lf: LambdaFunction =>
              val args = lf.arguments
                .collect { case v: NamedLambdaVariable => v.exprId }.toSet
              walk(lf.function, Some(h.prettyName), Some(args))
            case _ => Nil
          })
        return hit ++ nested
      }
      val kids = e match {
        case h: HigherOrderFunction =>
          // HOF arguments (the collections) are evaluated once per row —
          // keep the current scope; each lambda body is evaluated per
          // element of ITS collection — its own args become the scope
          h.arguments.flatMap(walk(_, hof, scope)) ++
            h.functions.flatMap {
              case lf: LambdaFunction =>
                val args = lf.arguments
                  .collect { case v: NamedLambdaVariable => v.exprId }.toSet
                walk(lf.function, Some(h.prettyName), Some(args))
              case other => walk(other, hof, scope)
            }
        case _ => e.children.flatMap(walk(_, hof, scope))
      }
      hit ++ kids
    }
    p.collect { case node =>
      val here = node.expressions.flatMap(walk(_, None, None))
      val cached = node match {
        case im: InMemoryTableScanExec =>
          loopInvariantExpensiveInLambdas(im.relation.cachedPlan)
        case _ => Nil
      }
      here ++ cached
    }.flatten
  }

  /** Unpartitioned WindowExec nodes (each sorts its whole input on ONE
    * partition at scale).
    */
  def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] =
    p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  /** MEASURED input row count of every unpartitioned WindowExec in the
    * query's executed plan — the rows that actually land on the single
    * partition. Executes each window's child subtree (AQE must be OFF
    * so plain WindowExec nodes stay visible in executedPlan; the caller
    * sets the conf). This turns the allowlist's "bounded by
    * construction" prose into numbers a spec can assert (VERDICT r12
    * item 1b).
    */
  def unpartitionedWindowInputRows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.child.execute().count()
    }

  /** Partition-health audit of every GenerateExec (explode/inline/
    * posexplode/stack) INPUT in the executed plan: the MEASURED
    * per-partition row counts of the rows feeding each generator —
    * the few-file straggler detector (r15 find, now the shared
    * Tables.spreadExplodeInput guard). A healthy explode input spreads
    * its rows across ~all partitions; the pathology this surfaces is
    * `nonEmpty ≪ parts` with one partition holding ~everything (a
    * single parquet file's row groups concentrating in a handful of
    * byte-range splits) — the shape that carried the whole sf100
    * perplexity explode on ONE task for 3350 s. Executes each
    * generator's child subtree (AQE must be OFF so plain GenerateExec
    * nodes stay visible; the caller sets the conf).
    */
  def generateInputPartitionHealth(df: org.apache.spark.sql.DataFrame): Seq[String] =
    generateInputPartitionHealth(df.queryExecution.executedPlan)

  private def generateInputPartitionHealth(plan: SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    plan.collect {
      case g: GenerateExec =>
        val counts = g.child.execute()
          .mapPartitions(it => Iterator.single(it.size.toLong), preservesPartitioning = true)
          .collect()
        val parts = counts.length
        val nonEmpty = counts.count(_ > 0L)
        val mx = if (parts == 0) 0L else counts.max
        val total = counts.sum
        Seq(s"gen[${g.generator.prettyName}] parts=$parts nonEmpty=$nonEmpty max=$mx total=$total")
      // a cached frame hides its explode inside the cached plan (the
      // text_langid shape) — audit through it, as the lambda gate does
      case im: InMemoryTableScanExec =>
        generateInputPartitionHealth(im.relation.cachedPlan)
    }.flatten
  }

  private def isFactScan(f: FileSourceScanExec): Boolean =
    f.relation.location.rootPaths.exists(rp =>
      factTables.exists(t => rp.toString.contains(s"/$t.parquet")))

  /** True iff some fact-scan leaf reaches `p`'s root with NO
    * cardinality barrier (aggregate / limit / top-k) on its path. This
    * is the r13 path walk replacing the old subtree-anywhere `reduced`
    * check (ADVICE r12: an un-reduced fact scan joined alongside an
    * aggregated sibling branch on the SAME side escaped the old test).
    * Heuristic, not a proof — an aggregate grouped on a DIFFERENT key
    * than the join key still counts as a barrier; the gate's pinned
    * expected-set in PlanQualitySpec is the review point for those.
    */
  private def hasUnreducedFactPath(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec | _: GlobalLimitExec | _: TakeOrderedAndProjectExec => false
    case f: FileSourceScanExec => isFactScan(f)
    case other => other.children.exists(hasUnreducedFactPath)
  }

  /** Origin-column lineage: maps each attribute ExprId visible in `p`'s
    * subtree to the set of FILE-SCAN column names it derives from,
    * following Alias chains through ProjectExec and aggregate
    * result/grouping expressions. A derived key (`concat(user_id,
    * bucket)` aliased to `k`) maps to ALL its source columns, so the
    * skew match survives renames and composites.
    */
  private def originNames(p: SparkPlan): Map[ExprId, Set[String]] = {
    def resolveNamed(exprs: Seq[NamedExpression], child: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
      exprs.map {
        case a: Alias =>
          a.exprId -> a.child.references.toSeq.flatMap(r => child.getOrElse(r.exprId, Set(r.name))).toSet
        case attr: Attribute =>
          attr.exprId -> child.getOrElse(attr.exprId, Set(attr.name))
        case ne =>
          ne.exprId -> ne.references.toSeq.flatMap(r => child.getOrElse(r.exprId, Set(r.name))).toSet
      }.toMap
    p match {
      case f: FileSourceScanExec =>
        f.output.map(a => a.exprId -> Set(a.name)).toMap
      case proj: ProjectExec =>
        val below = originNames(proj.child)
        below ++ resolveNamed(proj.projectList, below)
      case agg: BaseAggregateExec =>
        val below = originNames(agg.child)
        below ++ resolveNamed(agg.groupingExpressions, below) ++ resolveNamed(agg.resultExpressions, below)
      // r14 lineage extensions (VERDICT r13 item 2): Generate, Expand,
      // Union and Window mint or merge ExprIds that the generic
      // children-merge below can't see through — an explode-derived
      // alias of user_id, or a key renamed inside a non-first union
      // branch, fell back to surface names and evaded the skew gate.
      case g: GenerateExec =>
        // generator output attrs (the exploded values) derive from the
        // generator's input references; pass the child map through
        val below = originNames(g.child)
        val genRefs = g.generator.references.toSeq
          .flatMap(r => below.getOrElse(r.exprId, Set(r.name))).toSet
        below ++ g.generatorOutput.map(a => a.exprId -> genRefs).toMap
      case e: ExpandExec =>
        // output attr i is produced by position i of EVERY projection
        // row (grouping-set arms) — union the origins across arms
        val below = originNames(e.child)
        below ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap(row =>
            row(i).references.toSeq.flatMap(r => below.getOrElse(r.exprId, Set(r.name)))).toSet
        }.toMap
      case u: UnionExec =>
        // Union output reuses (only) the FIRST child's ExprIds; origin
        // of output position i is the union of every branch's position-i
        // origins, so a skewable key renamed in a non-first branch still
        // resolves (ADVICE r13)
        val belows = u.children.map(c => (c, originNames(c)))
        val merged = belows.foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _._2)
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> belows.flatMap { case (c, below) =>
            val ca = c.output(i)
            below.getOrElse(ca.exprId, Set(ca.name))
          }.toSet
        }.toMap
      case w: WindowExec =>
        // output = child.output ++ windowExpression (Alias nodes over
        // window functions, whose references include the partition keys)
        val below = originNames(w.child)
        below ++ resolveNamed(w.windowExpression, below)
      case other =>
        other.children.map(originNames).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    }
  }

  private def pairEmitting(jt: org.apache.spark.sql.catalyst.plans.JoinType): Boolean = jt match {
    case org.apache.spark.sql.catalyst.plans.LeftSemi => false
    case org.apache.spark.sql.catalyst.plans.LeftAnti => false
    case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => false
    case _ => true
  }

  private def keyOrigins(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                         lineage: Map[ExprId, Set[String]]): Set[String] =
    keys.flatMap(_.references.toSeq.flatMap(a => lineage.getOrElse(a.exprId, Set(a.name)))).toSet

  /** Skew-risk joins: shuffle equi-joins (SortMergeJoin/ShuffledHashJoin
    * — the strategies that PARTITION BY the key) whose key origins hit a
    * skewable (non-unique fact) column on BOTH sides, where both
    * children carry an un-reduced fact-scan path. Run with
    * autoBroadcastJoinThreshold = -1 so the sf0.001 plan shows the join
    * strategy the SAME query gets at scale (tiny test inputs otherwise
    * auto-broadcast everything; explicit broadcast() hints survive,
    * which is correct — a hinted build side is small at every SF).
    */
  def skewRiskJoins(p: SparkPlan, ids: Set[String] = skewableIds): Seq[String] = p.collect {
    // semi/anti/existence joins emit AT MOST ONE row per probe-side row
    // regardless of build-side multiplicity — m×k collapses to m, so a
    // hot key costs linear work (tpch_q21's EXISTS/NOT-EXISTS self-joins
    // on l_orderkey are this shape). Only pair-emitting types flag.
    case j: SortMergeJoinExec if pairEmitting(j.joinType) =>
      (j: SparkPlan, j.leftKeys, j.rightKeys, j.left, j.right)
    case j: ShuffledHashJoinExec if pairEmitting(j.joinType) =>
      (j: SparkPlan, j.leftKeys, j.rightKeys, j.left, j.right)
  }.flatMap { case (j, lKeys, rKeys, l, r) =>
    if (hasUnreducedFactPath(l) && hasUnreducedFactPath(r)) {
      val lHit = keyOrigins(lKeys, originNames(l)).intersect(ids)
      val rHit = keyOrigins(rKeys, originNames(r)).intersect(ids)
      // quadratic blow-up needs multiplicity >1 on BOTH sides: a key
      // that is unique on one side (orders.o_orderkey vs lineitem.
      // l_orderkey) joins m×1 per hot key — linear, not flagged
      if (lHit.nonEmpty && rHit.nonEmpty)
        Some(s"${j.nodeName} on ${(lHit ++ rHit).toSeq.sorted.mkString("+")} (both sides un-reduced fact paths)")
      else None
    } else None
  }
}
