package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** Round-9 eighth wave: set-completion funnel (any order) and
  * temperature-scaled mixture weights — the unordered twin of
  * funnel_steps and the α-smoothing every multilingual pretraining
  * mix applies (upsample the tail without drowning the head).
  */
object AnalyticsOps2 {

  private def dbl(c: Column): Column = c.cast("double")

  /** Unordered (set-completion) funnel: per day, users who performed
    * ALL THREE of view/click/purchase in ANY order — the engagement
    * completeness metric ordered funnels (funnel_steps, which require
    * view→click→purchase sequencing) understate. Two-level
    * aggregation, both partial-aggregable: per-(day, user) presence
    * flags via max(), then per-day counts — no window, no join, and
    * the (day, user) grain is the natural shuffle key at any scale.
    */
  val funnelUnordered: Q = Q(
    "funnel_unordered",
    """WITH e AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS dx,
      |         user_id,
      |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_v,
      |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
      |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
      |  GROUP BY 1, 2)
      |SELECT dx AS day, CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(CASE WHEN has_v + has_c + has_p = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_all3,
      |       round(CAST(sum(CASE WHEN has_v + has_c + has_p = 3 THEN 1 ELSE 0 END)
      |                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS completion
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val e = T.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("dx"),
        col("user_id"), col("event_type"))
      .groupBy(col("dx"), col("user_id"))
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0)).as("has_v"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("has_c"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_p"))
    val all3 = col("has_v") + col("has_c") + col("has_p") === 3
    e.groupBy(col("dx"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(all3, 1).otherwise(0)).cast("long").as("n_all3"),
        round(sum(when(all3, 1).otherwise(0)).cast("double")
          / count(lit(1)).cast("double"), 6).as("completion"))
      .select(col("dx").as("day"), col("n_users"), col("n_all3"), col("completion"))
      .orderBy(col("day"))
  }

  /** Temperature-scaled mixture weights (α = 0.5): q_i ∝ √p_i over
    * per-language char shares — the tail-upsampling smoothing every
    * multilingual pretraining mix applies (α = 1 keeps natural
    * proportions, α → 0 approaches uniform). √ instead of a general
    * pow keeps the scaling libm-free and exactly mirrored; shares are
    * exact-integer ratios; the ≤|langs|-term normalizer sums under the
    * 6-dp headroom. upsample = q_i/p_i > 1 flags the tail. Scale: one
    * partial-aggregable pass; everything after runs on a |langs|-row
    * aggregate.
    */
  val mixtureTemperature: Q = Q(
    "mixture_temperature",
    """WITH c AS (
      |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars_g
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(chars_g) AS BIGINT) AS total FROM c),
      |p AS (
      |  SELECT lang, chars_g, total,
      |         CAST(chars_g AS DOUBLE) / CAST(total AS DOUBLE) AS share
      |  FROM c CROSS JOIN tot),
      |z AS (SELECT CAST(sum(sqrt(share)) AS DOUBLE) AS zsum FROM p)
      |SELECT lang, chars_g,
      |       round(share, 6) AS share_raw,
      |       round(sqrt(share) / zsum, 6) AS share_temp,
      |       round((sqrt(share) / zsum) / share, 6) AS upsample
      |FROM p CROSS JOIN z ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val c = T.documents(s, d).groupBy(col("lang"))
      .agg(sum(col("n_chars")).cast("long").as("chars_g"))
    val tot = c.agg(sum(col("chars_g")).cast("long").as("total"))
    val p = c.crossJoin(broadcast(tot))
      .withColumn("share", dbl(col("chars_g")) / dbl(col("total")))
    val z = p.agg(sum(sqrt(col("share"))).cast("double").as("zsum"))
    p.crossJoin(broadcast(z))
      .select(col("lang"), col("chars_g"),
        round(col("share"), 6).as("share_raw"),
        round(sqrt(col("share")) / col("zsum"), 6).as("share_temp"),
        round((sqrt(col("share")) / col("zsum")) / col("share"), 6).as("upsample"))
      .orderBy(col("lang").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(funnelUnordered, mixtureTemperature)
}
