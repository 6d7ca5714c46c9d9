package graft

/** Automated plan-quality gate over EVERY declared query at sf0.001:
  * no accidental cartesian products, and every parquet scan prunes
  * columns (never reads a full 10+-column schema it doesn't need).
  * Catches scale regressions that correctness checks can't see.
  */
class PlanQualitySpec extends SparkSpec {

  // queries whose SEMANTICS are a cross join / all-pairs compare
  private val intendedCross = Set(
    "join_cross_small",    // literal CROSS JOIN row
    "sim_cosine_topk", "sim_threshold_join",  // bounded all-pairs compares
    "dedup_simhash",       // fingerprint all-pairs histogram
    "text_langid",         // 5-row broadcast profile cross
    "ann_ivf_topk",        // 16-row centroid assignment cross
    "ann_ivf_nprobe",      // √n-row centroid assignment cross
    "ann_ivf_kmeans",      // √n-row centroid assignment cross (Lloyd-refined)
    "ann_ivf_pq",          // min(√n,256)-row coarse assignment cross (IVFPQ)
    "ann_ivf_pq_rerank",   // same IVFPQ pipeline feeding the exact re-rank
    "subquery_scalar",     // scalar subquery joins back as a 1-row cross
    "text_tfidf",          // N-docs scalar joined as 1-row cross
    "dedup_fuzzy_levenshtein", // bounded (≤60-key) all-pairs edit distance
    "ts_gapfill_locf",     // 1-row bounds aggregate crossed into the grid generator
    "ts_resample_interp",  // same 1-row bounds cross as ts_gapfill_locf's grid
    "scd2_asof_lookup",    // 1-row bounds aggregate crossed into the probe generator
    "zorder_layout",       // 1-row min/max bounds crossed in for rank normalization
    "dq_drift_psi",        // 1-row time/value bounds crossed in for bucketing
    "dq_freshness",        // 1-row global-max aggregate crossed into the per-series frame (r6, replaced the unpartitioned window)
    "tpch_q11",            // 1-row global-total threshold crossed into the grouped frame
    "tpch_q22",            // 1-row avg-balance scalar crossed into the customer subset
    "text_bigram_logprob", // 1-row corpus-total aggregate crossed into the model join
    "rfm_segment",         // 1-row anchor + 1-row quintile-cutpoint aggregates crossed in
    "benford_digits",      // 1-row corpus-total aggregate crossed into the digit counts
    "text_bm25",           // 1-row corpus (N, Σdl) aggregate crossed into the tf/df join
    "survival_km",         // 1-row max-date aggregate crossed into the subject table
    "mutual_info",         // 1-row corpus-total aggregate crossed into the cell table
    "assoc_rules",         // 1-row basket-total aggregate crossed into the pair supports
    "stats_chi2",          // 1-row total + 1-row dims aggregates crossed into the ≤25-cell table
    "graph_triangles",     // 1-row (np, tw) threshold crossed into the |nations|²-bounded pair table
    "stats_ks",            // 1-row (n0, n1) totals crossed into the distinct-cents ECDF
    "stats_bootstrap",     // 40-row replicate table + 1-row (n, Σ) aggregate crossed into the draws
    "ts_acf",              // 6-row lag table crossed into the calendar-bounded hourly aggregate
    "text_collocations",   // 1-row corpus-total aggregates crossed into the PMI join
    "graph_shortest_path", // 1-row (np, tw) threshold cross in the edge derivation (graph_triangles' shape)
    "embedding_cov",       // 15-row (i,j) dimension-pair table crossed into the quantized corpus
    "graph_node_jaccard",  // 1-row (np, tw) threshold cross in the edge derivation (graph_triangles' shape)
    "stats_mann_whitney",  // 1-row bin-prefix/totals aggregates crossed into the rank cumulative
    "ts_theil_sen",        // pairwise non-equi self-join over the CALENDAR-BOUNDED daily aggregate + 1-row n_days cross
    "ts_downsample_lttb",  // 1-row min-epoch aggregate crossed into the hour rebase
    "b10_hll_merge",       // 1-row direct-sketch aggregate crossed against the merged sketch
    "stats_levene_bf",     // 1-row global-F aggregate crossed into the 5-row per-group profile
    "stats_jensen_shannon", // 1-row (n0, n1) totals crossed into the ≤5-row priority cells
    "ts_changepoint_mean", // 1-row (n, Σ, Σ²) totals crossed into the CALENDAR-BOUNDED daily cumulative
    "graph_assortativity", // 1-row (np, tw) threshold cross in the edge derivation (graph_triangles' shape)
    "stats_cond_entropy",  // 1-row corpus-total aggregate crossed into the ≤25-cell entropy terms
    "text_burstiness",     // 1-row doc-count aggregate crossed into the 20-row top-word table
    "dq_referential",      // 1-row orphan-count aggregate crossed into each FK edge's 1-row child count
    "mixture_temperature", // 1-row total + 1-row normalizer aggregates crossed into the |langs|-row share table
    "ts_spectral_peak",    // 4-row period table + 1-row totals crossed into the CALENDAR-BOUNDED hourly aggregate
    "ts_heatmap_hour_dow", // 1-row total crossed into the 7×24-bounded cell table
    "ts_max_deficit",      // 1-row (n, Σ) totals crossed into the CALENDAR-BOUNDED daily cumulative
    "eval_langid_kappa",   // 1-row chance-agreement aggregate crossed into the 1-row (n, diag) totals (langid pipeline inside)
    "graph_reciprocity",   // 1-row threshold + 1-row counts crossed around the |nations|²-bounded edge list
    "stats_kendall_tau",   // pairwise non-equi self-join over the CALENDAR-BOUNDED daily aggregate + 1-row n cross (ts_theil_sen's shape)
    "stats_qq",            // two 1-row decile-grid aggregates crossed (1×1)
    "ts_ccf",              // 7-row lag table crossed into the calendar-bounded hourly aggregates (ts_acf's shape)
    "graph_closeness",     // 1-row (np, tw) threshold cross in the edge derivation (graph_triangles' shape)
    "embedding_pca_top",   // 2080-row (i≤j) dimension-pair table crossed into the quantized corpus (embedding_cov's shape)
    "ts_seasonal_anomaly", // 1-row bounds/median/MAD aggregates crossed into the CALENDAR-BOUNDED hour spine (ts_gapfill_locf's idiom)
    "b33_graph_mst",       // 1-row (np, tw) threshold cross in the edge derivation (graph_triangles' shape)
    "data_split_grouped",  // 1-row leakage-audit aggregate crossed into the |splits|-row report
    "eval_ndcg_rankshift", // 1-row IDCG constant crossed into the 1-row DCG aggregate
    "ts_peak_composition", // 1-row corpus-total aggregate crossed into the 5·|types|-row peak table
    "dedup_semdedup",      // 1-row k cross + min(√n,256)-row centroid assignment cross (ann_ivf_* shape)
    "quality_gopher_rules") // 1-row top-8 stopword list crossed into the per-doc rule projection
    // join_null_safe needs no excuse: EqualNullSafe is a hash-joinable key (BroadcastHashJoin verified)
    // dedup_embedding was allowlisted through r2 (all-pairs BNLJ); it is
    // now banded sign-LSH with an equi-join — no cross join to excuse

  test("no unintended cartesian/broadcast-nested-loop joins") {
    val offenders = SparkEntry.declared.flatMap { q =>
      val plan =
        try q.fn(spark, sf()).queryExecution.sparkPlan.toString()
        catch { case e: Throwable => s"PLAN-FAILED ${e.getMessage}" }
      if ((plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          && !intendedCross.contains(q.name))
        Some(q.name)
      else None
    }
    assert(offenders.isEmpty, s"unintended cross joins in: $offenders")
  }

  test("parquet scans never read the full lineitem schema needlessly") {
    // lineitem has 11 columns; scan_count needs 0, project_expr needs 7.
    val plan = SparkEntry.queries("scan_count")(spark, sf())
      .queryExecution.sparkPlan.toString()
    assert(plan.contains("ReadSchema: struct<>"),
      s"count(*) scan must prune all columns:\n$plan")
  }

  test("no declared query scans the FULL schema of a wide table") {
    // column pruning is the cheapest 100 TB lever: a scan that reads
    // every column of lineitem (11) / events (6) / orders (6) for a
    // narrower projection is a planning bug. Width counted from the
    // ReadSchema struct of each scan node.
    val fullWidths = Map("lineitem" -> 11, "events" -> 6, "orders" -> 6)
    val scanRe = ("Location: InMemoryFileIndex[^\\n]*/(\\w+)\\.parquet[^\\n]*\\n" +
      "(?:[^\\n]*\\n)*?[^\\n]*ReadSchema: struct<([^>]*)>").r
    var nScans = 0
    val offenders = SparkEntry.declared.flatMap { q =>
      val formatted =
        try q.fn(spark, sf()).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case _: Throwable => "" }
      scanRe.findAllMatchIn(formatted).flatMap { m =>
        val (table, schema) = (m.group(1), m.group(2))
        val width = if (schema.trim.isEmpty) 0 else schema.count(_ == ':')
        if (fullWidths.contains(table)) nScans += 1
        fullWidths.get(table).collect {
          case full if width >= full => s"${q.name}: $table reads all $full columns"
        }
      }
    }
    assert(nScans > 50, s"scan matcher looks broken — only $nScans wide-table scans found")
    assert(offenders.isEmpty, s"unpruned wide scans:\n  ${offenders.mkString("\n  ")}")
  }
}
