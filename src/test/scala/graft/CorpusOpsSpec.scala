package graft

import graft.queries.{CorpusOps, NoOracle}

/** Behavioral checks for the round-5 corpus-curation wave — each query
  * is recomputed brute-force on the driver from the sf0.001 corpus and
  * compared, so the semantics are pinned independently of the DuckDB
  * oracle (which could share a mistake with the Spark side).
  */
class CorpusOpsSpec extends SparkSpec {

  private def docs(): Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf())
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))

  test("mixture_weights: shares sum to 1, cap honored, uncapped rows hit uniform") {
    val rows = CorpusOps.mixtureWeights.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-6, s"shares sum ${shares.sum}")
    val n = rows.length
    rows.foreach { r =>
      val share = r.getDouble(3); val w = r.getDouble(4)
      assert(w <= 3.0 + 1e-9, s"cap violated: $w")
      if (w < 3.0 - 1e-9)
        // uncapped: weight * actual_share == uniform target share
        assert(math.abs(w * share - 1.0 / n) < 1e-4,
          s"uncapped weight $w * share $share != 1/$n")
    }
    // expected_chars == round(chars * weight) per row
    rows.foreach { r =>
      val recomputed = math.round(r.getLong(1) * r.getDouble(4))
      assert(math.abs(recomputed - r.getLong(5)) <= 1,
        s"expected_chars off for ${r.getString(0)}")
    }
  }

  test("ngram_topk equals brute-force bigram counts") {
    val brute = docs().toSeq
      .flatMap { case (_, text, _, _, _) =>
        val t = text.toLowerCase.split(" ", -1)
        if (t.length < 2) Seq.empty
        else t.sliding(2).map(_.mkString(" ")).toSeq
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (bg, n) => (-n, bg) }
      .take(25)
    val got = CorpusOps.ngramTopk.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === brute)
  }

  test("k_anonymity equals a brute-force QI audit") {
    val qi = docs().toSeq
      .groupBy { case (_, _, lang, source, nChars) => (lang, source, nChars / 200) }
      .view.mapValues(_.size.toLong).toSeq
    val brute = qi.groupBy(_._1._1).map { case (lang, groups) =>
      (lang, groups.size.toLong,
        groups.count(_._2 < 5).toLong,
        groups.filter(_._2 < 5).map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = CorpusOps.kAnonymity.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === brute)
  }

  test("text_entropy equals brute-force Shannon entropy (top-25)") {
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val brute = docs().toSeq
      .filter(_._2.nonEmpty)
      .map { case (id, text, _, _, _) =>
        val counts = text.split("", -1).filter(_.nonEmpty)
          .groupBy(identity).map(_._2.length.toDouble)
        val n = counts.sum
        val h = log2(n) - counts.map(k => k * log2(k)).sum / n
        (id, n.toLong, BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy { case (id, _, h) => (-h, id) }
      .take(25)
    val got = CorpusOps.textEntropy.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // entropy is a double sum — compare rounded values with 1-ulp slack
    assert(got.map(t => (t._1, t._2)) === brute.map(t => (t._1, t._2)))
    got.zip(brute).foreach { case (g, b) =>
      assert(math.abs(g._3 - b._3) < 2e-6, s"doc ${g._1}: ${g._3} vs ${b._3}")
    }
  }

  test("event_path_topk equals brute-force 3-step path counts") {
    val events = Tables.events(spark, sf())
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = events.toSeq
      .groupBy(_._1).values
      .flatMap { evs =>
        val ordered = evs.sortBy(e => (e._2, e._3)).map(_._4)
        if (ordered.size < 3) Seq.empty
        else ordered.sliding(3).map(_.mkString(">")).toSeq
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }
      .take(25)
    val got = CorpusOps.eventPathTopk.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === brute)
  }

  test("dedup_incremental equals brute-force batch-vs-corpus Jaccard at sf0.01") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .selectExpr("doc_id", "lower(text) AS text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, tx) => id -> shingles(tx) }.toMap
    val corpus = docs.map(_._1).filter(_ < 250)
    val batch = docs.map(_._1).filter(_ >= 250)
    val brute = batch.flatMap { b =>
      val cands = corpus.flatMap { c =>
        val i = (sh(b) & sh(c)).size
        val u = sh(b).size + sh(c).size - i
        if (u > 0 && i.toDouble / u >= 0.5)
          Some((c, BigDecimal(i.toDouble / u).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
      if (cands.isEmpty) None
      else Some(b -> cands.maxBy { case (c, j) => (j, -c) })
    }.toMap
    val got = graft.queries.LlmOpsPipeline.dedupIncremental
      .fn(spark, sf("sf0.01")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === brute)
    assert(got.nonEmpty, "no incremental dups found — threshold arm not exercised")
  }

  test("b1_json_rejects splits 8 valid / 3 rejects; extra fields are not rejects") {
    val rows = NoOracle.jsonRejects.fn(spark, sf()).collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2)))
    assert(rows.count(_._1 == "valid") === 8)
    assert(rows.count(_._1 == "reject") === 3)
    // the extra_field line (id=6) parsed fine
    assert(rows.exists(r => r._1 == "valid" && r._2.contains("6")))
    // the type-mismatch line is quarantined with its raw payload
    assert(rows.exists(r => r._1 == "reject" && r._3.contains("not-a-number")))
  }
}
