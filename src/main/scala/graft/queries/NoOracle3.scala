package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-8 session-3 capability rows (no DuckDB oracle — SURVEY §2B):
  * a Bloom-filter dedup PREFILTER between a historical corpus and an
  * incoming batch (the constant-memory membership screen that lets a
  * 100 TB incremental pipeline skip the history shuffle for the ~all-
  * new majority), and the columnar cache surface (InMemoryRelation)
  * with a plan-evidence assertion.
  */
object NoOracle3 {

  /** B27 — Bloom prefilter for incremental dedup: build a Bloom filter
    * over the HISTORY key set (customers who ordered before 1996),
    * probe the 1996+ batch with it, and verify the exact anti-join
    * only on the bloom-positive candidates. The structural guarantees
    * this row pins:
    *   - ZERO false negatives (every batch key actually in history
    *     tests positive) — the property that makes the prefilter safe;
    *   - the false-positive rate stays within ~5× the configured fpp
    *     (0.03) — the property that makes it USEFUL (bloom-negative
    *     rows skip the expensive verify join entirely);
    *   - prefilter path agrees with the plain anti-join key-for-key.
    * At 100 TB the history side never re-shuffles: the filter is built
    * once (one pass, mergeable per-partition builders inside
    * `stat.bloomFilter`), broadcast at a few MB, and only the
    * candidate minority reaches the exact verify join. The probe is a
    * broadcast-Bloom UDF — the Lsh.scala broadcast-set precedent: a
    * membership test no Catalyst built-in expresses (the built-in
    * BloomFilterMightContain is reserved for injected runtime filters,
    * exercised by b5_runtime_bloom).
    */
  val bloomPrefilter: Q = Q.noOracle("b27_bloom_prefilter") { (s, d) =>
    import s.implicits._
    val orders = T.orders(s, d).select(col("o_custkey"),
      year(col("o_orderdate")).as("yr"))
    val history = orders.filter(col("yr") < 1996).select(col("o_custkey")).distinct()
    val batch = orders.filter(col("yr") >= 1996).select(col("o_custkey")).distinct()
    val histN = history.count()
    // empty-corpus survival: an empty Bloom filter has no bit buffer —
    // emit the degenerate row instead of probing it
    if (histN == 0L) {
      Seq((0L, batch.count(), 0L, 0L, 0L, 0.0, true))
        .toDF("history_n", "batch_n", "truly_new", "false_neg", "false_pos",
          "fp_rate", "ok")
    } else {
    val bf = history.stat.bloomFilter("o_custkey", math.max(histN, 1L), 0.03)
    val bcBf = s.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bcBf.value.mightContainLong(k))
    try {
      val probed = batch.withColumn("cand", might(col("o_custkey"))).cache()
      try {
        // ground truth: which batch keys really are in history. history
        // keys are distinct, so the left join is multiplicity-1 and
        // count(truth) == count(probed); all five truth-side counters
        // fold into ONE aggregation job (r16, guide §1.2 — these were
        // five separate count() jobs re-walking the cached join)
        val truth = probed.join(history.withColumn("in_hist", lit(true)),
          Seq("o_custkey"), "left")
          .select(col("o_custkey"), col("cand"),
            coalesce(col("in_hist"), lit(false)).as("in_hist"))
        val tRow = truth.agg(
          count(lit(1)).as("batch_n"),
          sum(when(col("in_hist") && !col("cand"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("in_hist"), 1L).otherwise(0L)).as("tn"),
          sum(when(col("cand") && !col("in_hist"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("cand"), 1L).otherwise(0L)).as("neg")).collect().head
        val batchN = tRow.getLong(0)
        val falseNeg = tRow.getLong(1)
        val trulyNew = tRow.getLong(2)
        val falsePos = tRow.getLong(3)
        // prefilter path: bloom-negatives are new for free; candidates
        // verified by the exact anti-join (history side only sees them)
        val candKeys = probed.filter(col("cand")).select(col("o_custkey"))
        val newViaPath = tRow.getLong(4) +
          candKeys.join(history, Seq("o_custkey"), "left_anti").count()
        val fpRate = if (trulyNew == 0) 0.0 else falsePos.toDouble / trulyNew.toDouble
        Seq((histN, batchN, trulyNew, falseNeg, falsePos,
          math.rint(fpRate * 1e6) / 1e6,
          falseNeg == 0L && fpRate <= 0.15 && newViaPath == trulyNew))
          .toDF("history_n", "batch_n", "truly_new", "false_neg", "false_pos",
            "fp_rate", "ok")
      } finally probed.unpersist()
    } finally bcBf.destroy()
    }
  }

  /** B28 — columnar cache surface: persist a pruned projection
    * (3 of lineitem's 16 columns), materialize it, and pin two
    * properties off the EXECUTED plans: (1) the downstream aggregate
    * actually reads the InMemoryRelation (columnar cache hit, not a
    * re-scan — "InMemoryTableScan" in the executed plan), and
    * (2) results from the cached path equal the direct-scan recompute.
    * The cache is the interactive-warehouse surface (dashboards
    * re-aggregating one hot projection); at scale the win is that the
    * cached relation stores ONLY the projected columns — the pruning
    * decides the memory bill, which is why this row caches a
    * projection and never the raw table. Unpersisted in `finally`.
    */
  val cacheColumnar: Q = Q.noOracle("b28_cache_columnar") { (s, d) =>
    import s.implicits._
    val proj = T.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val cached = proj.cache()
    try {
      val rows = cached.count() // materialize
      val agg = cached.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
      val collected = agg.collect()
      val planStr = agg.queryExecution.executedPlan.toString()
      val usedCache = planStr.contains("InMemoryTableScan") ||
        planStr.contains("InMemoryRelation") || planStr.contains("TableCacheQueryStage")
      val direct = proj.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty")).cast("double").as("sum_qty"), count(lit(1)).as("n"))
        .collect()
      val same = collected.map(r => (r.getString(0), r.getString(1),
          r.getDouble(2), r.getLong(3))).toSet ==
        direct.map(r => (r.getString(0), r.getString(1),
          r.getDouble(2), r.getLong(3))).toSet
      Seq((rows, collected.length.toLong, usedCache, same, usedCache && same))
        .toDF("cached_rows", "agg_groups", "used_cache", "results_match", "ok")
    } finally cached.unpersist()
  }

  def all: Seq[Q] = Seq(bloomPrefilter, cacheColumnar)
}
