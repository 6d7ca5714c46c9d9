package graft.queries

import java.util.zip.Deflater
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 twelfth wave: deflate compression-ratio quality scoring
  * (the FineWeb/Gopher-style repetition proxy) and join-strategy
  * plan evidence under the broadcast threshold.
  */
object CurateOps3 {

  /** Per-language deflate compression profile: mean compressed/raw
    * ratio and the share of docs below 0.35 (hyper-compressible =
    * repetitive/templated — the cheap quality signal production
    * curation stacks use beside text_repetition's n-gram scorer;
    * boilerplate compresses far better than prose). Deflate(level 6)
    * is a deterministic function of the bytes, but no SQL engine
    * exposes it — a rows-only row with the executor-side work in
    * mapPartitions (one Deflater per partition, reused across docs —
    * the multimodal codec shape). Counts and byte totals are exact
    * integers; ratios are per-row doubles aggregated as bounded
    * per-lang means (row count ≤ |langs|).
    */
  val textCompressRatio: Q = Q.noOracle("text_compress_ratio") { (s, d) =>
    import s.implicits._
    val scored = T.documents(s, d)
      // null text = nothing to compress; skip (null-injected corpora —
      // the codec lambda must never see a null payload)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val deflater = new Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (lang, text) =>
          val in = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (lang, in.length.toLong, out)
        }
      }.toDF("lang", "raw_bytes", "zip_bytes")
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_bytes")).cast("long").as("raw_bytes"),
        sum(col("zip_bytes")).cast("long").as("zip_bytes"),
        round(avg(col("zip_bytes").cast("double") / col("raw_bytes").cast("double")), 6)
          .as("mean_ratio"),
        sum(when(col("zip_bytes").cast("double")
          < col("raw_bytes").cast("double") * 0.35, 1).otherwise(0))
          .cast("long").as("n_hyper_compressible"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** B26: JOIN-STRATEGY CONTROL EVIDENCE — the same
    * customer ⋈ orders equi-join planned under three broadcast
    * regimes: threshold −1 (broadcast off ⇒ sort-merge), default
    * 10 MB with the dimension under it (⇒ broadcast hash), and an
    * explicit broadcast() hint (⇒ broadcast hash regardless). Row
    * results must be identical; each regime's physical join operator
    * is read off the EXECUTED plan. At 100 TB this is the single most
    * consequential planner decision a query author controls — the row
    * proves the control surface actually responds.
    */
  val joinStrategy: Q = Q.noOracle("b26_join_strategy") { (s, d) =>
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    def joinKinds(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => joinKinds(a.executedPlan)
      case qe: QueryStageExec       => joinKinds(qe.plan)
      case j: BroadcastHashJoinExec => "broadcast_hash" +: j.children.flatMap(joinKinds)
      case j: ShuffledHashJoinExec  => "shuffled_hash" +: j.children.flatMap(joinKinds)
      case j: SortMergeJoinExec     => "sort_merge" +: j.children.flatMap(joinKinds)
      case other                    => other.children.flatMap(joinKinds)
    }
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = s.conf.getOption(key)
    def run(threshold: String, hint: Boolean): (String, Long, String) = {
      s.conf.set(key, threshold)
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val dim = if (hint) broadcast(cust) else cust
      val j = T.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val rows = j.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(t => (t._1 == null, t._1))
      val kinds = joinKinds(j.queryExecution.executedPlan).distinct.sorted
      (rows.map { case (k2, v) => s"$k2=$v" }.mkString(","),
        rows.map(_._2).sum, kinds.mkString("+"))
    }
    try {
      val (r1, n1, k1) = run("-1", hint = false)
      val (r2, n2, k2) = run("10MB", hint = false)
      val (r3, n3, k3) = run("-1", hint = true)
      val rows = Seq(
        ("threshold_off", k1, n1, r1 == r2 && n1 == n2),
        ("threshold_10mb", k2, n2, r2 == r3 && n2 == n3),
        ("explicit_hint", k3, n3,
          k1.contains("sort_merge") && k2 == "broadcast_hash" && k3 == "broadcast_hash"))
      s.createDataFrame(rows).toDF("regime", "join_operator", "n_joined", "ok")
    } finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  val all: Seq[Q] = Seq(textCompressRatio, joinStrategy)
}
