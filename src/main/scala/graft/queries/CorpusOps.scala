package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A — round-5 corpus-curation + product-analytics wave.
  *
  * Five oracle-checked shapes a training-data pipeline runs at 100 TB:
  * mixture rebalancing, corpus n-gram counts, a k-anonymity audit,
  * per-doc entropy scoring, and event-path mining. All are one or two
  * shuffles with map-side partial aggregation; nothing collects to the
  * driver.
  */
object CorpusOps {

  /** Data-mixture rebalancing: per-language char mass → the sampling
    * weight that moves the corpus toward a UNIFORM language mixture,
    * capped at 3.0 (never upsample a tail language more than 3×: the
    * standard guard against minority-language over-repetition).
    * weight_g = (1/n_groups) / (chars_g/total) = total/(n_groups·chars_g).
    * The global total/n_groups come from an unpartitioned window over
    * the |languages|-row AGGREGATE (bounded), not over the corpus.
    * Determinism: one int64→double division per output, least() with an
    * exact literal, round(…,6) at the edge (D-rules).
    */
  val mixtureWeights: Q = Q(
    "mixture_weights",
    """WITH by_lang AS (
      |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars_g,
      |         CAST(count(*) AS BIGINT) AS docs_g
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(chars_g) AS BIGINT) AS total,
      |               CAST(count(*) AS BIGINT) AS n_groups FROM by_lang)
      |SELECT lang, chars_g, docs_g,
      |       round(CAST(chars_g AS DOUBLE) / total, 6) AS actual_share,
      |       round(least(3.0, CAST(total AS DOUBLE) / (n_groups * chars_g)), 6)
      |         AS weight,
      |       CAST(round(chars_g * least(3.0,
      |                    CAST(total AS DOUBLE) / (n_groups * chars_g)), 0)
      |            AS BIGINT) AS expected_chars
      |FROM by_lang, tot
      |ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val byLang = T.documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("chars_g"), count(lit(1)).as("docs_g"))
    // Unpartitioned window — deliberately kept (unlike dq_freshness,
    // which was rewritten): the input is the |languages|-row AGGREGATE
    // and the language axis is bounded by the ISO code space (~200),
    // not by data volume, so the single window task sees O(100) rows
    // at any corpus scale.
    val w = Window.partitionBy()
    val weight = least(lit(3.0),
      col("total").cast("double") / (col("n_groups") * col("chars_g")))
    byLang
      .withColumn("total", sum(col("chars_g")).over(w))
      .withColumn("n_groups", count(lit(1)).over(w))
      .select(col("lang"), col("chars_g"), col("docs_g"),
        round(col("chars_g").cast("double") / col("total"), 6).as("actual_share"),
        round(weight, 6).as("weight"),
        round(col("chars_g") * weight, 0).cast("long").as("expected_chars"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** Corpus bigram counts, global top-25: THE map-side-combine shape —
    * explode word bigrams, partial-aggregate per partition, one shuffle
    * on the bigram, TakeOrderedAndProject for the top-k. (count DESC,
    * bigram ASC) is a total order, so the cut is deterministic.
    */
  val ngramTopk: Q = Q(
    "ngram_topk",
    """WITH tok AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
      |bi AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |                i -> t[i] || ' ' || t[i+1])) AS bigram
      |       FROM tok WHERE len(t) >= 2)
      |SELECT bigram, count(*) AS n FROM bi
      |GROUP BY bigram
      |ORDER BY n DESC, bigram ASC
      |LIMIT 25""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    T.spreadExplodeInput(s, T.documents(s, d))
      .select(split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |          i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""
          .stripMargin)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(25)
  }

  /** k-anonymity audit (k=5) over the quasi-identifier
    * (lang, source, n_chars div 200): per language, how many QI groups
    * exist, how many are re-identifiable (size < k), and how many docs
    * sit in them — the release-gate report a curation pipeline runs
    * before publishing a corpus. Two cheap aggregations (QI group, then
    * language), both partial-aggregable; integer-only output.
    */
  val kAnonymity: Q = Q(
    "k_anonymity",
    """WITH qi AS (
      |  SELECT lang, source, n_chars // 200 AS len_bucket,
      |         count(*) AS n
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(count(*) FILTER (WHERE n < 5) AS BIGINT) AS risky_groups,
      |       CAST(coalesce(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT)
      |         AS docs_at_risk
      |FROM qi GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.documents(s, d)
      .groupBy(col("lang"), col("source"), expr("n_chars div 200").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("n") < 5, 1)).as("risky_groups"),
        coalesce(sum(when(col("n") < 5, col("n"))), lit(0L)).cast("long")
          .as("docs_at_risk"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** Per-doc char-level Shannon entropy (bits/char), global top-25 —
    * the gibberish/compression quality gate: low entropy = repetitive
    * spam, very high = random noise. H = log2(N) − Σ k·log2(k) / N over
    * char counts k. Per-char explode is BMP-safe (split("") splits code
    * points, same as text_langid; SPARK-40194 drops the trailing empty).
    * Both engines ORDER BY the ROUNDED entropy, so the top-25 cut is
    * deterministic even where unrounded doubles differ in the last ulp.
    */
  val textEntropy: Q = Q(
    "text_entropy",
    """WITH ch AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
      |           i -> substring(text, i, 1))) AS c
      |  FROM documents WHERE length(text) > 0),
      |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
      |ent AS (
      |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars_tot,
      |         round(log2(CAST(sum(k) AS DOUBLE))
      |               - sum(k * log2(CAST(k AS DOUBLE))) / sum(k), 6) AS entropy
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_chars_tot, entropy FROM ent
      |ORDER BY entropy DESC, doc_id ASC
      |LIMIT 25""".stripMargin
  ) { (s, d) =>
    // few-file straggler guard (r16; Tables.spreadExplodeInput)
    T.spreadExplodeInput(s, T.documents(s, d))
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy(col("doc_id"), col("c"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_chars_tot"),
        round(log2(sum(col("k")).cast("double"))
          - sum(col("k") * log2(col("k").cast("double"))) / sum(col("k")), 6)
          .as("entropy"))
      .orderBy(col("entropy").desc, col("doc_id").asc)
      .limit(25)
  }

  /** Event-path mining: the top-25 3-step event-type sequences across
    * users (product-analytics "common journeys"). One window shuffle on
    * user_id with a (ts, event_id) total order inside each partition,
    * then the bigram-count shape again. At scale the window partitions
    * by user (high cardinality — parallel), never globally.
    */
  val eventPathTopk: Q = Q(
    "event_path_topk",
    """WITH seq AS (
      |  SELECT event_type,
      |         lead(event_type, 1) OVER w AS e2,
      |         lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n DESC, path ASC
      |LIMIT 25""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    T.events(s, d)
      .select(col("event_type"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"), col("e3"))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(25)
  }

  val all: Seq[Q] = Seq(mixtureWeights, ngramTopk, kAnonymity, textEntropy,
    eventPathTopk)
}
