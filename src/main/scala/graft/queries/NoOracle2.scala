package graft.queries

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 capability rows (no DuckDB oracle — SURVEY §2B): mergeable
  * KLL quantile sketches and theta set-operation sketches through the
  * DataSketches Java API in the honest distributed shape (one sketch
  * per PARTITION via mapPartitions, small compact sketches merged at
  * the driver — the map-side-combine pattern that makes 100 TB
  * quantiles / set algebra one pass), a driver-visible AQE skew-join
  * split row (the runtime half of join_skew_salted's manual story),
  * and incremental rollup via mergeable partial-aggregate state (the
  * re-aggregation pattern behind every incremental 100 TB pipeline).
  */
object NoOracle2 {

  /** Build one theta sketch per partition of a Long column, merge the
    * ≤numPartitions compact sketches at the driver (each ≤ ~32 KB —
    * the ivf-centroid-precedent bounded collect). */
  private def thetaSketch(s: SparkSession, keys: DataFrame, c: String)
      : org.apache.datasketches.theta.CompactSketch = {
    import s.implicits._
    val parts = keys.select(col(c)).as[Long].mapPartitions { it =>
      val sk = UpdateSketch.builder().build()
      it.foreach(sk.update)
      Iterator.single(sk.compact().toByteArray)
    }(Encoders.BINARY).collect()
    val u = SetOperation.builder().buildUnion()
    parts.foreach(b => u.union(Sketches.wrapCompactSketch(Memory.wrap(b))))
    u.getResult
  }

  /** B10 depth: MERGEABLE KLL QUANTILE SKETCHES — the fixed-size,
    * associatively-mergeable structure that turns 100 TB percentiles
    * into a map-side combine (the quantile twin of b10_hll_merge's
    * distinct counts). One KllDoublesSketch(k=200) per partition over
    * order cents, merged at the driver; for each of 5 quantiles the
    * TRUE normalized rank of the estimate (count(x ≤ est)/n, exact
    * integers) must sit within 3× the sketch's normalized rank error
    * bound (~1.65% at k=200). KLL compaction is randomized, so the
    * row asserts the rank-error INVARIANT, not a pinned value —
    * exactly the guarantee the structure ships with.
    */
  val kllQuantiles: Q = Q.noOracle("b10_kll_quantiles") { (s, d) =>
    import s.implicits._
    val cents = T.orders(s, d)
      .select((T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
      // sketches aggregate VALUES; SQL aggregates skip NULLs — mirror
      // that here (and keep the Long encoder null-free)
      .filter(col("cents").isNotNull)
    val parts = cents.as[Long].mapPartitions { it =>
      val sk = KllDoublesSketch.newHeapInstance(200)
      it.foreach(v => sk.update(v.toDouble))
      Iterator.single(sk.toByteArray)
    }(Encoders.BINARY).collect()
    val merged = KllDoublesSketch.newHeapInstance(200)
    parts.foreach(b => merged.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    // empty-corpus survival: an empty KLL sketch has no quantiles
    val rows = if (merged.isEmpty) Seq.empty[(Double, Long, Long, Long, Double, Boolean)]
    else {
      val ests = qs.map(q => merged.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
      val errBound = merged.getNormalizedRankError(false)
      // exact ranks of the estimates + exact disc quantiles in ONE
      // aggregation pass over cents (r16, guide §1.2 "don't compute
      // things twice": these were two separate full-scan jobs; the
      // aggregate is the same either way, so the merged pass returns
      // identical values)
      val rankCols = ests.zipWithIndex.map { case (e, i) =>
        sum(when(col("cents") <= lit(e.toLong), 1L).otherwise(0L)).as(s"le$i")
      }
      val exactCols = qs.zipWithIndex.map { case (q, i) =>
        expr(s"CAST(percentile_disc($q) WITHIN GROUP (ORDER BY cents) AS BIGINT)")
          .as(s"ex$i")
      }
      val agg = cents.agg(count(lit(1)).as("n"),
        (rankCols ++ exactCols): _*).collect().head
      val n = agg.getLong(0)
      qs.zipWithIndex.map { case (q, i) =>
        val est = ests(i).toLong
        val trueRank = agg.getLong(i + 1).toDouble / n.toDouble
        (q, n, agg.getLong(qs.size + i + 1), est,
          math.abs(trueRank - q),
          math.abs(trueRank - q) <= 3.0 * errBound)
      }
    }
    s.createDataFrame(rows).toDF("q", "n", "exact_cents", "est_cents",
      "rank_err", "within_bound")
  }

  /** B10 depth: THETA SKETCH SET ALGEBRA — union / intersection /
    * difference over DISTINCT-key sketches, the structure that answers
    * "how many customers ordered in BOTH years?" on 100 TB without a
    * shuffle-heavy distinct join: per-partition UpdateSketches (theta
    * keeps the k smallest key hashes — order-independent, so the
    * distributed build is deterministic for fixed data), compact
    * sketches union-merged at the driver, set ops vs the EXACT counts
    * from distinct joins. Estimates must sit within 5% (k=4096 ⇒
    * ~1.6% RSE; exact below 4096 distincts).
    */
  val thetaSetops: Q = Q.noOracle("b10_theta_setops") { (s, d) =>
    // set algebra over KEYS: a NULL key is a non-member on both the
    // sketch side (unhashable) and the exact side (equi-join never
    // matches NULL) — filter it once so both sides agree
    val o = T.orders(s, d).filter(col("o_custkey").isNotNull)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    val a = o.filter(col("yr") === 1996).select(col("o_custkey"))
    val b = o.filter(col("yr") === 1997).select(col("o_custkey"))
    val skA = thetaSketch(s, a, "o_custkey")
    val skB = thetaSketch(s, b, "o_custkey")
    val est = Map(
      "union" -> SetOperation.builder().buildUnion().union(skA, skB).getEstimate,
      "intersect" -> {
        val it = SetOperation.builder().buildIntersection()
        it.intersect(skA); it.intersect(skB); it.getResult.getEstimate
      },
      "a_not_b" -> SetOperation.builder().buildANotB().aNotB(skA, skB).getEstimate)
    val da = a.distinct(); val db = b.distinct()
    val nA = da.count(); val nB = db.count()
    val inter = da.join(db, "o_custkey").count()
    val exact = Map(
      "union" -> (nA + nB - inter),
      "intersect" -> inter,
      "a_not_b" -> (nA - inter))
    val rows = Seq("union", "intersect", "a_not_b").map { op =>
      val e = est(op); val x = exact(op)
      val relErr = if (x == 0) math.abs(e) else math.abs(e - x) / x.toDouble
      (op, math.round(e), x, relErr, relErr <= 0.05)
    }
    s.createDataFrame(rows).toDF("op", "estimate", "exact", "rel_err", "ok")
  }

  /** B21: AQE SKEW-JOIN SPLIT, driver-visible — the runtime half of
    * the skew story (join_skew_salted is the manual half): a heavily
    * skewed sort-merge join (90% of lineitem-derived facts collapse
    * onto one hot key) must have its hot partition SPLIT by
    * OptimizeSkewedJoin, asserted off the executed plan's
    * SortMergeJoinExec.isSkewJoin flag — not a plan string. Thresholds
    * forced low so the fixture trips the optimization at any sf;
    * session confs restored in finally. At 100 TB this is the
    * mechanism that makes the one pathological key a scheduling
    * detail instead of a stage-killing straggler.
    */
  val aqeSkew: Q = Q.noOracle("b21_aqe_skew") { (s, d) =>
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // repartition(16) first: AQE splits a skewed partition at per-MAP-
      // CHUNK granularity, and the single-file local fixture otherwise
      // yields ONE mapper — an indivisible hot partition that
      // OptimizeSkewedJoin correctly refuses to mark (measured: 32 KB
      // hot partition, 0 skewed, one mapper). On a real cluster the
      // fact scan always has many mappers; the repartition recreates
      // that shape here.
      val facts = T.lineitem(s, d).select(
        when(col("l_orderkey") % 10 =!= 0, 7L)
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_orderkey").as("payload"))
        .repartition(16)
      val dims = s.range(0, 100).select(col("id").as("dk"),
        concat(lit("d"), col("id")).as("name"))
      // sum(payload) keeps the high-entropy payload column through the
      // join shuffle — with a count-only aggregate, column pruning
      // shrinks the shuffled rows to the near-constant key and the hot
      // partition compresses BELOW the skew threshold (measured: 1.4 KB
      // for 54k rows), so OptimizeSkewedJoin correctly sees no skew
      val joined = facts.join(dims.hint("merge"), col("k") === col("dk"))
        .groupBy(col("name")).agg(count(lit(1)).as("cnt"), sum(col("payload")).as("s"))
      val rows = joined.collect()
      val total = rows.map(_.getLong(1)).sum
      val hot = rows.find(_.getString(0) == "d7").map(_.getLong(1)).getOrElse(0L)
      val nFacts = facts.count()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def smjs(p: SparkPlan): Seq[SortMergeJoinExec] = p match {
        case a: AdaptiveSparkPlanExec => smjs(a.executedPlan)
        case qe: QueryStageExec       => smjs(qe.plan)
        case j: SortMergeJoinExec     => Seq(j) ++ j.children.flatMap(smjs)
        case other                    => other.children.flatMap(smjs)
      }
      val joins = smjs(joined.queryExecution.executedPlan)
      val row = (nFacts, total, hot, joins.size.toLong,
        joins.exists(_.isSkewJoin), total == nFacts && hot * 10 >= total * 8)
      s.createDataFrame(Seq(row)).toDF(
        "n_facts", "n_joined", "hot_key_rows", "n_smj", "skew_split", "counts_ok")
    } finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** B22: INCREMENTAL ROLLUP VIA MERGEABLE PARTIAL STATE — the
    * pattern behind every incremental 100 TB pipeline: each batch
    * writes a PARTIAL aggregate state (per-key n / Σcents — sum and
    * count are associative+commutative, so states merge by
    * re-aggregation), and merging the two batches' states must EQUAL
    * the full recompute over all rows, key for key, exactly (integer
    * sums — no float drift). New data never touches old raw rows:
    * the merge cost is proportional to the STATE, not the history.
    */
  val incrementalRollup: Q = Q.noOracle("b22_incremental_rollup") { (s, d) =>
    val run = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val o = T.orders(s, d).select(col("o_custkey"),
      year(col("o_orderdate")).as("yr"),
      (T.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
    def state(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("s"))
    state(o.filter(col("yr") <= 1994)).write.mode("overwrite")
      .parquet(s"$run/state_b1")
    state(o.filter(col("yr") > 1994)).write.mode("overwrite")
      .parquet(s"$run/state_b2")
    val merged = s.read.parquet(s"$run/state_b1")
      .unionAll(s.read.parquet(s"$run/state_b2"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("n")).cast("long").as("n"), sum(col("s")).cast("long").as("s"))
    val full = state(o)
    val cmp = merged.as("m").join(full.as("f"), Seq("o_custkey"), "full_outer")
      .select(
        count(lit(1)).as("keys"),
        coalesce(sum(when(col("m.n") === col("f.n") && col("m.s") === col("f.s"), 0L)
          .otherwise(1L)), lit(0L)).cast("long").as("mismatches"))
      .collect().head
    val row = (cmp.getLong(0), cmp.getLong(1), cmp.getLong(1) == 0L)
    s.createDataFrame(Seq(row)).toDF("keys", "mismatches", "ok")
  }

  val all: Seq[Q] = Seq(kllQuantiles, thetaSetops, aqeSkew, incrementalRollup)
}
