package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.{CorpusOps4, Stats8}

/** Pins for the round-12 wave: stupid-backoff perplexity scoring and
  * Benjamini–Hochberg step-up FDR.
  */
class Wave14Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("text_perplexity_sb matches a driver-side stupid-backoff recompute") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).toSeq))
    val enTok = docs.filter(_._2 == "en").flatMap(_._3)
    val c1 = enTok.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val n1 = enTok.length.toLong
    val v = c1.size.toLong
    val c2 = docs.filter(_._2 == "en")
      .flatMap(d => d._3.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (bg, g) => bg -> g.length.toLong }
    def lwQ(w1: String, w2: String): Long = {
      val s = c2.get((w1, w2)) match {
        // r14: the c >= 2 count floor (CCNet pruning) — singleton
        // training bigrams score through the backoff path
        case Some(c) if c >= 2 && c1.contains(w1) => math.log(c.toDouble / c1(w1))
        case _ => math.log(0.4 * (c1.getOrElse(w2, 0L) + 1) / math.max(n1 + v, 1L).toDouble)
      }
      // HALF_UP (away from zero), matching Spark's round() — math.round
      // is half-toward-+inf, which diverges on an exact negative .5 tie
      // (ADVICE r12; same tie class round6 already handles)
      JBD.valueOf(s * 1e6).setScale(0, RoundingMode.HALF_UP).longValueExact()
    }
    val scored = docs.flatMap { case (id, lang, t) =>
      val pairs = t.sliding(2).filter(_.size == 2).toSeq
      if (pairs.isEmpty) None
      else Some((id, lang, pairs.size.toLong, pairs.map(p => lwQ(p(0), p(1))).sum))
    }
    def meanQ(s: Long, n: Long): Long = {
      val num = 2 * s + (if (s < 0) -n else n)
      num / (2 * n) // JVM / truncates toward zero — same as Spark div
    }
    val truth = scored
      .sortBy { case (id, _, n, s) => (meanQ(s, n), s, id) }.take(25)
    val rows = CorpusOps4.textPerplexitySb.fn(spark, sf()).collect()
    assert(rows.length == truth.length)
    rows.zip(truth).foreach { case (r, (id, lang, n, s)) =>
      assert(r.getLong(0) == id, s"doc order: got ${r.getLong(0)} want $id")
      assert(Option(r.getString(1)).orNull == lang)
      assert(r.getLong(2) == n, s"doc $id n_bigrams")
      assert(r.getLong(3) == s, s"doc $id sum_lp_micros")
      val mq = meanQ(s, n)
      assert(r.getDouble(4) == mq / 1e6, s"doc $id mean_logprob")
      assert(r.getDouble(5) == round6(math.exp(-mq / 1e6)), s"doc $id ppl")
    }
    // backoff actually exercised: some non-en doc carries an out-of-model
    // bigram (otherwise the row degenerates to plain bigram surprisal)
    val nonEnPairs = docs.filter(_._2 != "en")
      .flatMap(d => d._3.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    assert(nonEnPairs.exists(p => !c2.contains(p)), "no out-of-model bigram at this sf")
    // the r14 count floor is LIVE: some scored bigram has training
    // count exactly 1, so it is pruned from the model and takes the
    // backoff path despite being a seen en bigram
    val allPairs = docs
      .flatMap(d => d._3.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    assert(allPairs.exists(p => c2.get(p).contains(1L)),
      "no singleton training bigram at this sf — the floor is untested")
  }

  test("stats_bh_fdr matches a driver-side Welch+BH recompute (step-up included)") {
    val segOf = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    val cents = Tables.orders(spark, sf())
      .select(col("o_custkey"), Tables.dec2(col("o_totalprice")) * 100).collect()
      .filter(r => !r.isNullAt(0) && segOf.contains(r.getLong(0)))
      .map(r => segOf(r.getLong(0)) -> r.getDecimal(1).longValueExact())
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val by = cents.groupBy(_._1)
    val stats = segs.map { s =>
      val xs = by(s).map(_._2)
      (s, xs.length.toLong, xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    }
    val (tn, ts, ts2) = (stats.map(_._2).sum, stats.map(_._3).sum, stats.map(_._4).sum)
    val zOf = stats.map { case (s, n, sm, s2) =>
      val (cn, cs, cs2) = (tn - n, ts - sm, ts2 - s2)
      val z = (sm.toDouble / n - cs.toDouble / cn) /
        math.sqrt((s2.toDouble - sm.toDouble * sm.toDouble / n) / (n - 1) / n
          + (cs2.toDouble - cs.toDouble * cs.toDouble / cn) / (cn - 1) / cn)
      (s, n, z)
    }
    val zStar = Map(1 -> 2.326348, 2 -> 2.053749, 3 -> 1.880794, 4 -> 1.750686, 5 -> 1.644854)
    val ranked = zOf.sortBy { case (s, _, z) => (-math.abs(z), s) }.zipWithIndex
      .map { case ((s, n, z), i) => (s, n, z, i + 1) }
    val kMax = ranked.collect { case (_, _, z, k) if math.abs(z) >= zStar(k) => k }
      .foldLeft(0)(math.max)
    val rows = Stats8.statsBhFdr.fn(spark, sf()).collect()
    assert(rows.length == 5)
    rows.zip(ranked).foreach { case (r, (s, n, z, k)) =>
      assert(r.getString(0) == s); assert(r.getLong(1) == n)
      assert(r.getDouble(2) == round6(z), s"$s z")
      assert(r.getInt(3) == k); assert(r.getDouble(4) == zStar(k))
      assert(r.getBoolean(5) == (k <= kMax), s"$s rejected")
    }
    // the step-up property is live: if any rank is rejected, EVERY lower
    // rank is too, even one whose own threshold test failed
    val rejected = rows.filter(_.getBoolean(5)).map(_.getInt(3)).sorted
    assert(rejected.sameElements(1 to rejected.length))
  }
}
