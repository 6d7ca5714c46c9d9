package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A — data-quality operations beyond the one-pass profile
  * (dq_profile): per-series freshness, distribution drift between time
  * halves, and declared-expectation violation counts. This is the
  * reference's operational home turf — monitoring-data QA before it
  * lands in the warehouse.
  */
object QualityOps {

  /** Per-series freshness: how stale is each event_type relative to
    * the newest event in the table? Staleness is measured against the
    * DATA's max (not wall clock) so the result is deterministic. The
    * global max is a 1-row aggregate OVER the per-series aggregate,
    * broadcast back in — no unpartitioned window, so even when "series"
    * is host×metric cardinality (10⁶⁺ rows on real telemetry) nothing
    * funnels through a single task (same idiom as dq_drift_psi's
    * bounds).
    */
  val dqFreshness: Q = Q(
    "dq_freshness",
    """WITH per AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         max(epoch_us(ts)) AS last_us
      |  FROM events GROUP BY event_type),
      |g AS (SELECT max(last_us) AS global_max FROM per)
      |SELECT event_type, n,
      |       CAST(last_us AS BIGINT) AS last_us,
      |       CAST((global_max - last_us) // 3600000000 AS BIGINT)
      |         AS hours_stale
      |FROM per, g
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val per = T.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(unix_micros(col("ts"))).as("last_us"))
    per
      .crossJoin(broadcast(per.agg(max(col("last_us")).as("global_max"))))
      .select(col("event_type"), col("n"), col("last_us"),
        expr("(global_max - last_us) div 3600000000").as("hours_stale"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Distribution drift between the OLD and NEW halves of the time
    * range (split at the exact integer-micros midpoint): population
    * stability index over 10 fixed-width value buckets per series,
    * Laplace-smoothed so empty buckets stay finite —
    * PSI = Σ (p−q)·ln(p/q), the standard ML-ops drift gate
    * (PSI < 0.1 stable, > 0.25 shifted). Bucket bounds come from a
    * 1-row global aggregate broadcast into the scan (allowlisted, same
    * pattern as zorder_layout); every per-bucket ratio is one exact
    * division, ln + round(…,6) as in text_tfidf. The term sum runs over
    * the FULL 0-9 bucket grid per series (observed counts left-joined
    * onto series×bucket, absent buckets = 0), so a bucket empty in both
    * halves still contributes its smoothed p−q term when the half sizes
    * differ — the documented 10-bucket smoothed PSI, not an
    * observed-buckets-only approximation. A constant-valued corpus
    * (v1 = v0) degenerates to bucket 0 instead of 0.0/0.0 NaN.
    */
  val dqDriftPsi: Q = Q(
    "dq_drift_psi",
    """WITH bounds AS (
      |  SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
      |         min(value) AS v0, max(value) AS v1
      |  FROM events),
      |bucketed AS (
      |  SELECT event_type,
      |         CASE WHEN epoch_us(ts) < (t0 + t1) // 2 THEN 0 ELSE 1 END AS half,
      |         CASE WHEN v1 = v0 THEN 0 ELSE
      |           least(9, CAST(floor((value - v0) * 10.0 / (v1 - v0)) AS BIGINT))
      |         END AS bucket
      |  FROM events, bounds),
      |cnt AS (
      |  SELECT event_type, bucket,
      |         count(*) FILTER (WHERE half = 0) AS n_old,
      |         count(*) FILTER (WHERE half = 1) AS n_new
      |  FROM bucketed GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type,
      |         CAST(sum(n_old) AS BIGINT) AS t_old,
      |         CAST(sum(n_new) AS BIGINT) AS t_new
      |  FROM cnt GROUP BY 1),
      |grid AS (
      |  SELECT tot.event_type, b.bucket, t_old, t_new,
      |         coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
      |  FROM tot CROSS JOIN (SELECT * FROM range(10) t(bucket)) b
      |  LEFT JOIN cnt ON cnt.event_type = tot.event_type
      |              AND cnt.bucket = b.bucket),
      |terms AS (
      |  SELECT event_type,
      |         (CAST(n_old + 1 AS DOUBLE) / (t_old + 10)
      |          - CAST(n_new + 1 AS DOUBLE) / (t_new + 10))
      |         * ln((CAST(n_old + 1 AS DOUBLE) / (t_old + 10))
      |              / (CAST(n_new + 1 AS DOUBLE) / (t_new + 10))) AS term,
      |         n_old, n_new
      |  FROM grid)
      |SELECT event_type, round(sum(term), 6) AS psi,
      |       CAST(sum(n_old) AS BIGINT) AS n_old,
      |       CAST(sum(n_new) AS BIGINT) AS n_new
      |FROM terms GROUP BY event_type
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val bounds = T.events(s, d).agg(
      min(unix_micros(col("ts"))).as("t0"), max(unix_micros(col("ts"))).as("t1"),
      min(col("value")).as("v0"), max(col("value")).as("v1"))
    val bucketed = T.events(s, d)
      .select(col("event_type"), col("ts"), col("value"))
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        when(unix_micros(col("ts")) < expr("(t0 + t1) div 2"), 0).otherwise(1)
          .as("half"),
        when(col("v1") === col("v0"), lit(0L)).otherwise(
          least(lit(9L),
            floor((col("value") - col("v0")) * 10.0 / (col("v1") - col("v0")))
              .cast("long"))).as("bucket"))
    val cnt = bucketed.groupBy(col("event_type").as("ck"), col("bucket").as("cb"))
      .agg(count(when(col("half") === 0, 1)).as("cn_old"),
        count(when(col("half") === 1, 1)).as("cn_new"))
    val tot = cnt.groupBy(col("ck").as("event_type"))
      .agg(sum(col("cn_old")).as("t_old"), sum(col("cn_new")).as("t_new"))
    // Full series×bucket grid: the 10-row bucket axis is a broadcast
    // literal, tot is |series| rows — the left join fills unobserved
    // buckets with 0 so their smoothed terms are not silently dropped.
    val grid = tot
      .crossJoin(broadcast(s.range(0, 10).select(col("id").as("bucket"))))
      .join(cnt, col("ck") === col("event_type") && col("cb") === col("bucket"),
        "left")
      .select(col("event_type"), col("t_old"), col("t_new"),
        coalesce(col("cn_old"), lit(0L)).as("n_old"),
        coalesce(col("cn_new"), lit(0L)).as("n_new"))
    val p = (col("n_old") + 1).cast("double") / (col("t_old") + 10)
    val q = (col("n_new") + 1).cast("double") / (col("t_new") + 10)
    grid
      .select(col("event_type"), ((p - q) * log(p / q)).as("term"),
        col("n_old"), col("n_new"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("term")), 6).as("psi"),
        sum(col("n_old")).cast("long").as("n_old"),
        sum(col("n_new")).cast("long").as("n_new"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  /** Declared-expectation checks ("Great Expectations"-style): each
    * rule is one aggregate over the table, emitted as (rule, n_checked,
    * n_violations). Rules: key non-null, key unique, the n_chars
    * column consistent with length(text), n_chars within declared
    * bounds, lang inside the declared domain. All integer counts; the
    * union of 1-row aggregates is driver-cheap at any scale because
    * each arm partial-aggregates to one row.
    */
  val dqExpectations: Q = Q(
    "dq_expectations",
    """WITH uniq AS (
      |  SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS dups,
      |         CAST(count(*) AS BIGINT) AS n_keys
      |  FROM (SELECT doc_id, count(*) AS c FROM documents GROUP BY doc_id))
      |SELECT 'doc_id_not_null' AS rule, CAST(count(*) AS BIGINT) AS n_checked,
      |       CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS n_violations
      |FROM documents
      |UNION ALL
      |SELECT 'doc_id_unique', n_keys, dups FROM uniq
      |UNION ALL
      |SELECT 'n_chars_matches_text', CAST(count(*) AS BIGINT),
      |       CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
      |FROM documents
      |UNION ALL
      |SELECT 'n_chars_in_bounds', CAST(count(*) AS BIGINT),
      |       CAST(count(*) FILTER (WHERE n_chars < 0 OR n_chars > 100000) AS BIGINT)
      |FROM documents
      |UNION ALL
      |SELECT 'lang_in_domain', CAST(count(*) AS BIGINT),
      |       CAST(count(*) FILTER (
      |         WHERE lang NOT IN ('en', 'de', 'fr', 'es', 'zh')) AS BIGINT)
      |FROM documents
      |ORDER BY rule NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val docs = T.documents(s, d)
    def arm(rule: String, checked: org.apache.spark.sql.Column,
            violations: org.apache.spark.sql.Column) =
      docs.agg(checked.as("n_checked"), violations.as("n_violations"))
        .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
    val uniq = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("dups"))
      .select(lit("doc_id_unique").as("rule"), col("n_keys").as("n_checked"),
        col("dups").as("n_violations"))
    arm("doc_id_not_null", count(lit(1)),
        count(when(col("doc_id").isNull, 1)))
      .unionByName(uniq)
      .unionByName(arm("n_chars_matches_text", count(lit(1)),
        count(when(col("n_chars") =!= length(col("text")), 1))))
      .unionByName(arm("n_chars_in_bounds", count(lit(1)),
        count(when(col("n_chars") < 0 || col("n_chars") > 100000, 1))))
      .unionByName(arm("lang_in_domain", count(lit(1)),
        count(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1))))
      .orderBy(col("rule").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(dqFreshness, dqDriftPsi, dqExpectations)
}
