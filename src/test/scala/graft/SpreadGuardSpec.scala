package graft

import org.apache.spark.sql.functions._

/** Pins the shared few-file explode-straggler guard
  * (Tables.spreadExplodeInput) and its partition-health detector
  * (PlanWalk.generateInputPartitionHealth) — the r15 find hoisted into
  * one helper in r16 (VERDICT r15 item 1).
  *
  * Red fixture: an UNGUARDED explode over a single-file corpus reads
  * through however few byte-range splits the file yields — at test
  * scale exactly ONE scan partition carries all 500 docs, the
  * miniature of the sf100 one-task straggler. The guarded twin must
  * spread the same rows across the session's full parallelism.
  */
class SpreadGuardSpec extends SparkSpec {

  private def withAqeOff[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def health(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Long)] =
    PlanWalk.generateInputPartitionHealth(df).map { line =>
      val kv = "(\\w+)=(\\d+)".r.findAllMatchIn(line)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
      (kv("parts").toInt, kv("nonEmpty").toInt, kv("max"))
    }

  test("RED: unguarded single-file explode concentrates on one task") {
    withAqeOff {
      val unguarded = Tables.documents(spark, sf())
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      val Seq((parts, nonEmpty, mx)) = health(unguarded)
      // the single parquet fixture file yields ONE populated input
      // partition — every exploded row's work lands on one task
      assert(nonEmpty === 1, s"expected the red fixture to concentrate (parts=$parts)")
      assert(mx === 500L)
    }
  }

  test("guard spreads a single-file corpus to the session parallelism") {
    withAqeOff {
      val guarded = Tables.spreadExplodeInput(spark, Tables.documents(spark, sf()))
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      val Seq((parts, nonEmpty, _)) = health(guarded)
      assert(parts === spark.sparkContext.defaultParallelism)
      // round-robin repartition of 500 rows over 4 partitions: all carry
      assert(nonEmpty === parts)
    }
  }

  test("guard is a NO-OP when the input already reads many files") {
    val para = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_many_").toString
    Tables.documents(spark, sf()).repartition(para * 2)
      .write.mode("overwrite").parquet(dir)
    val many = spark.read.parquet(dir)
    assume(many.inputFiles.length >= para)
    val out = Tables.spreadExplodeInput(spark, many)
    // no Repartition node added — the frame is returned as-is
    assert(out.queryExecution.logical eq many.queryExecution.logical)
  }

  test("every guarded declared row spreads its document explode at test scale") {
    // the cutover set from VERDICT r15 item 1 (+ the heavy exploders
    // added in the same sweep); each must show its corpus explode input
    // spread across the full parallelism — a future edit that drops the
    // guard re-concentrates to nonEmpty=1 and fails here
    val guarded = Seq(
      // VERDICT r15 item 1's named set
      "dedup_containment", "dedup_ngram_jaccard", "dedup_substring",
      "dedup_paragraph", "text_langid", "sample_dsir", "dedup_contamination",
      "text_bigram_logprob", "text_bpe_tokens",
      // the r16 genhealth-audit sweep: every remaining corpus-
      // proportional explode (documents / events / embeddings)
      "explode_tokens", "explode_outer_tokens", "text_tfidf", "text_rarity",
      "dedup_minhash_lsh", "eval_minhash_accuracy", "dedup_simhash",
      "dedup_simhash_banded", "dedup_incremental", "text_chunk",
      "ngram_topk", "text_entropy", "text_hapax_ratio", "text_heaps_law",
      "text_burstiness", "text_ngram_novelty", "text_vocab_overlap",
      "text_hash_features", "text_collocations", "text_bm25", "zipf_slope",
      "max_concurrency", "quality_gopher_rules", "text_subword_fertility",
      "embedding_centroid_dist", "ann_pq_adc", "dedup_embedding")
    withAqeOff {
      val para = spark.sparkContext.defaultParallelism
      val bad = guarded.flatMap { name =>
        val df = SparkEntry.queries(name)(spark, sf())
        val lines = PlanWalk.generateInputPartitionHealth(df)
        // corpus explode = the generate with the LARGEST input; profile/
        // model-side generates (≤100 rows) may legitimately stay narrow
        val kv = lines.map(l => "(\\w+)=(\\d+)".r.findAllMatchIn(l)
          .map(m => m.group(1) -> m.group(2).toLong).toMap)
        kv.sortBy(-_("total")).headOption.collect {
          case h if h("nonEmpty") < math.min(para.toLong, h("total")) =>
            s"$name: ${lines.mkString(" | ")}"
        }
      }
      assert(bad.isEmpty, s"concentrated explode inputs:\n${bad.mkString("\n")}")
    }
  }

  test("WHOLE-SURFACE gate: no declared query feeds a corpus-sized generator from one partition") {
    // the r16 genhealth sweep as a suite gate, so a FUTURE unguarded
    // explode fails here instead of waiting for the per-round CLI
    // audit. Threshold: a generator input holding ≥ 400 rows at
    // sf0.001 is corpus-proportional (full documents = 500, events =
    // 1000, embeddings = 500; every bounded-by-construction generate —
    // probe sets, literal sequences, calendar grids, dim tables — is
    // ≤ 256). Concentration = all of it on ONE partition. The post-
    // sweep expected set is EMPTY; any hit names a new unguarded row.
    withAqeOff {
      spark.catalog.clearCache()
      val offenders = SparkEntry.declared.flatMap { q =>
        val lines =
          try PlanWalk.generateInputPartitionHealth(q.fn(spark, sf()))
          catch { case e: Throwable => Seq(s"HEALTH-FAILED ${e.getMessage}") }
        lines.flatMap { l =>
          if (l.startsWith("HEALTH-FAILED")) Some(s"${q.name}: $l")
          else {
            val kv = "(\\w+)=(\\d+)".r.findAllMatchIn(l)
              .map(m => m.group(1) -> m.group(2).toLong).toMap
            if (kv("total") >= 400L && kv("nonEmpty") <= 1L) Some(s"${q.name}: $l")
            else None
          }
        }
      }
      assert(offenders.isEmpty,
        s"corpus-sized one-partition generator inputs:\n${offenders.mkString("\n")}")
    }
  }
}
