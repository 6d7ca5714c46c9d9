package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 fourth wave: label-centroid geometry in quantized embedding
  * space, the weekday/weekend rate profile, and a zone-map pruning
  * capability row — embedding analytics, calendar seasonality, and the
  * storage-layout half of the predicate-pushdown story.
  */
object MixedOps2 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Pairwise L2 distances between per-label centroids in QUANTIZED
    * embedding space — the class-separability profile (small
    * inter-centroid distance ⇒ labels an ANN index will confuse).
    * Quantize first (embedding_quantize's oracle-pinned round parity)
    * so every per-(label, dim) sum is an EXACT BIGINT — the
    * corpus-sized float-sum trap never opens (embedding_cov
    * precedent); each centroid mean and difference is exact-input
    * IEEE; the 64-term squared-distance sum rounds at 6 dp under the
    * chi2 headroom. Scale: one posexplode pass, partial-aggregable
    * (label, dim) sums; the pairwise join runs on the
    * |labels|·64-row centroid aggregate.
    */
  val embeddingCentroidDist: Q = Q(
    "embedding_centroid_dist",
    """WITH m AS (
      |  SELECT label, embedding,
      |         CAST(list_aggregate(list_transform(embedding,
      |                x -> abs(CAST(x AS DOUBLE))), 'max') AS DOUBLE) AS max_abs
      |  FROM embeddings WHERE embedding IS NOT NULL),
      |q AS (
      |  SELECT label, list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 127.0
      |                           / nullif(max_abs, 0.0)) AS BIGINT)) AS qa
      |  FROM m),
      |dims AS (SELECT CAST(range AS BIGINT) AS dim FROM range(1, 65)),
      |c AS (
      |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(qa[dim]) AS BIGINT) AS s
      |  FROM q CROSS JOIN dims GROUP BY 1, 2),
      |p AS (
      |  SELECT a.label AS label_a, b.label AS label_b,
      |         CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
      |           - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS diff
      |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label)
      |SELECT label_a, label_b, round(sqrt(sum(diff * diff)), 6) AS dist_q
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, d) =>
    // explode the RAW floats first, quantize scalar-wise after the
    // generator: a quantizing transform() lambda would get max_abs
    // (itself an array_max lambda) INLINED per element by
    // CollapseProject — O(d²) work per vector and no codegen (the r2
    // HOF-hoisting trap; measured 68.9 s → 1.9 s at sf10 for the
    // centroid aggregate). The Generate boundary pins max_abs to one
    // evaluation per vector.
    val c = T.spreadExplodeInput(s, T.embeddings(s, d)) // few-file guard (r16)
      // posexplode would drop null vectors implicitly anyway — make the
      // exclusion explicit and mirrored in the oracle (null-sweep r9)
      .filter(col("embedding").isNotNull)
      .withColumn("max_abs",
        expr("CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)"))
      .select(col("label"), col("max_abs"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("label"), (col("p") + 1).as("dim"),
        expr("""CAST(round(CAST(x AS DOUBLE) * 127.0
                / nullif(max_abs, CAST(0.0 AS DOUBLE))) AS BIGINT)""").as("qv"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).cast("long").as("s"))
    val a = c.select(col("label").as("label_a"), col("dim"),
      (dbl(col("s")) / dbl(col("n"))).as("ma"))
    val b = c.select(col("label").as("label_b"), col("dim").as("dim_b"),
      (dbl(col("s")) / dbl(col("n"))).as("mb"))
    a.join(b, col("dim") === col("dim_b") && col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), (col("ma") - col("mb")).as("diff"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(round(sqrt(sum(col("diff") * col("diff"))), 6).as("dist_q"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Weekend vs weekday event-rate lift: events per weekend day over
    * events per weekday — the day-of-week seasonality profile beside
    * ts_seasonal_hour's hour-of-day. Day-of-week comes from pure
    * integer arithmetic on the epoch-day index (day 0 = Thursday ⇒
    * Saturday = dx%7==2, Sunday = dx%7==3) — no engine date-locale
    * surface at all. Days counted are days WITH events. One
    * partial-aggregable pass; the lift runs on a 1-row aggregate of
    * exact integers.
    */
  val tsWeekendLift: Q = Q(
    "ts_weekend_lift",
    """WITH e AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx
      |  FROM events),
      |dly AS (SELECT dx, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
      |agg AS (
      |  SELECT CAST(sum(CASE WHEN dx % 7 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS days_we,
      |         CAST(sum(CASE WHEN dx % 7 IN (2, 3) THEN 0 ELSE 1 END) AS BIGINT) AS days_wd,
      |         CAST(sum(CASE WHEN dx % 7 IN (2, 3) THEN n ELSE 0 END) AS BIGINT) AS ev_we,
      |         CAST(sum(CASE WHEN dx % 7 IN (2, 3) THEN 0 ELSE n END) AS BIGINT) AS ev_wd
      |  FROM dly)
      |SELECT days_we, days_wd, ev_we, ev_wd,
      |       round(CAST(ev_we AS DOUBLE) / CAST(days_we AS DOUBLE), 6) AS rate_we,
      |       round(CAST(ev_wd AS DOUBLE) / CAST(days_wd AS DOUBLE), 6) AS rate_wd,
      |       round((CAST(ev_we AS DOUBLE) / CAST(days_we AS DOUBLE))
      |             / (CAST(ev_wd AS DOUBLE) / CAST(days_wd AS DOUBLE)), 6) AS lift
      |FROM agg""".stripMargin
  ) { (s, d) =>
    val dly = T.events(s, d)
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"))
      .groupBy(col("dx")).agg(count(lit(1)).as("n"))
    val isWe = col("dx") % 7 === 2 || col("dx") % 7 === 3
    val agg = dly.agg(
      sum(when(isWe, 1).otherwise(0)).cast("long").as("days_we"),
      sum(when(isWe, 0).otherwise(1)).cast("long").as("days_wd"),
      sum(when(isWe, col("n")).otherwise(0)).cast("long").as("ev_we"),
      sum(when(isWe, 0).otherwise(col("n"))).cast("long").as("ev_wd"))
    agg.select(col("days_we"), col("days_wd"), col("ev_we"), col("ev_wd"),
      round(dbl(col("ev_we")) / dbl(col("days_we")), 6).as("rate_we"),
      round(dbl(col("ev_wd")) / dbl(col("days_wd")), 6).as("rate_wd"),
      round((dbl(col("ev_we")) / dbl(col("days_we")))
        / (dbl(col("ev_wd")) / dbl(col("days_wd"))), 6).as("lift"))
  }

  /** B23: ZONE-MAP (min/max) PRUNING — the storage-layout half of
    * predicate pushdown: the SAME key-range filter over the SAME rows
    * reads far fewer rows from a key-SORTED parquet layout than from a
    * shuffled one, because row-group min/max statistics let the reader
    * skip whole groups. Asserted from the executed scans'
    * numOutputRows metrics (reader output BEFORE the residual Filter),
    * with both layouts returning identical aggregates. At 100 TB,
    * sort-on-write is the cheapest 10× scan saver there is — this row
    * MEASURES it instead of asserting it. Probed finding worth
    * pinning: skipping works on the BIGINT key but Spark 4.1 does NOT
    * evaluate TIMESTAMP_NTZ row-group statistics (a date-sorted NTZ
    * layout read ALL 15000 rows under a pushed date filter; the same
    * experiment on the key read only the straddling files) — the CBO
    * NTZ gap's storage-layer sibling, so lakes on this schema should
    * zone-map on epoch-derived integers, not raw NTZ columns.
    */
  val zonemapPruning: Q = Q.noOracle("b23_zonemap_pruning") { (s, d) =>
    val run = java.nio.file.Files.createTempDirectory("graft_zonemap").toString
    val o = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"))
    o.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$run/sorted")
    o.repartition(8).write.mode("overwrite").parquet(s"$run/shuffled")
    // data-derived narrow key range (~5% of the keyspace, second decile);
    // empty-corpus survival: min/max are NULL on zero rows
    val mm = o.agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().head
    val (lo, hi) = if (mm.isNullAt(0)) (0L, 1L) else {
      val span = mm.getLong(1) - mm.getLong(0)
      val l = mm.getLong(0) + span / 5
      (l, l + math.max(span / 20, 1L))
    }
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scanRows(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => scanRows(a.executedPlan)
      case qe: QueryStageExec       => scanRows(qe.plan)
      case f: FileSourceScanExec    => f.metrics("numOutputRows").value
      case other                    => other.children.map(scanRows).sum
    }
    def probe(layout: String): (Long, Long, Long) = {
      val df = s.read.parquet(s"$run/$layout")
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("ksum"))
      val r = df.collect().head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
        scanRows(df.queryExecution.executedPlan))
    }
    val (nS, kS, readS) = probe("sorted")
    val (nR, kR, readR) = probe("shuffled")
    val total = o.count()
    val row = (total, nS, readS, readR,
      nS == nR && kS == kR,
      // sorted layout must skip at least half of what shuffled reads
      readS * 2 <= readR || (nS == 0 && readS == 0))
    s.createDataFrame(Seq(row)).toDF(
      "n_total", "n_match", "rows_read_sorted", "rows_read_shuffled",
      "results_equal", "pruning_effective")
  }

  val all: Seq[Q] = Seq(embeddingCentroidDist, tsWeekendLift, zonemapPruning)
}
