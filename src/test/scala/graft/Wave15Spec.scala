package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.{BpeOps, Stats8}

/** Pins for the round-13 wave: the deterministic two-sample
  * randomization test and per-language subword fertility.
  */
class Wave15Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def md5u32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("stats_permutation_test matches a driver-side randomization recompute") {
    val segOf = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderkey"), Tables.dec2(col("o_totalprice")) * 100)
      .collect()
      .filter(r => !r.isNullAt(0) && segOf.get(r.getLong(0))
        .exists(s => s == "AUTOMOBILE" || s == "BUILDING"))
      .map(r => (r.getLong(1), segOf(r.getLong(0)) == "AUTOMOBILE",
        if (r.isNullAt(2)) None else Some(r.getDecimal(2).longValueExact())))
    def diffOf(b: Long): (Long, Long, Double) = {
      var (sa, na, sb, nb) = (0L, 0L, 0L, 0L)
      rows.foreach { case (okey, isA, cents) =>
        val pa = if (b == 0) isA else md5u32(s"perm:$b:$okey") % 2 == 0
        if (pa) { na += 1; cents.foreach(sa += _) }
        else { nb += 1; cents.foreach(sb += _) }
      }
      (na, nb, sa.toDouble / na - sb.toDouble / nb)
    }
    val (nA, nB, diff0) = diffOf(0)
    val hits = (1L to 64L).count { b => math.abs(diffOf(b)._3) >= math.abs(diff0) }
    val got = Stats8.statsPermutationTest.fn(spark, sf()).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == nA, "n_a")
    assert(r.getLong(1) == nB, "n_b")
    assert(r.getDouble(2) == round6(diff0 / 100.0), "diff_obs")
    assert(r.getLong(3) == 64L, "r_used")
    assert(r.getDouble(4) == round6((1.0 + hits) / 65.0), "p_value")
    // add-one estimator bounds (Phipson & Smyth 2010): never 0, never > 1
    assert(r.getDouble(4) >= round6(1.0 / 65.0) && r.getDouble(4) <= 1.0)
    // the null distribution is actually exercised: not every replicate
    // can beat the observed statistic unless the groups are identical
    assert(hits < 64, "degenerate fixture: all replicates beat observed")
  }

  test("text_subword_fertility matches a driver-side BPE recompute; fertility >= 1") {
    def bpeLen(w: String): Long =
      BpeOps.MERGES.foldLeft(w.split("").toSeq) { case (toks, (l, rr)) =>
        toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == l && t == rr) acc.init :+ (l + rr)
          else acc :+ t
        }
      }.size.toLong
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).toSeq.filter(_.nonEmpty)))
    val byLang = docs.groupBy(_._2)
    val truth = byLang.map { case (lang, ds) =>
      val words = ds.flatMap(_._3)
      (lang, ds.map(_._1).distinct.size.toLong, words.size.toLong,
        words.map(bpeLen).sum)
    }.toSeq.sortBy(t => (t._1 != null, Option(t._1).getOrElse(""))) // nulls first, then asc
    val got = BpeOps.textSubwordFertility.fn(spark, sf()).collect()
    assert(got.length == truth.length)
    got.zip(truth).foreach { case (r, (lang, nd, nw, nsw)) =>
      assert(Option(r.getString(0)).orNull == lang)
      assert(r.getLong(1) == nd, s"$lang n_docs")
      assert(r.getLong(2) == nw, s"$lang n_words")
      assert(r.getLong(3) == nsw, s"$lang n_subwords")
      assert(r.getDouble(4) == round6(nsw.toDouble / nw), s"$lang fertility")
      // every word is at least one subword — fertility ≥ 1 by construction
      assert(r.getDouble(4) >= 1.0, s"$lang fertility < 1")
    }
    // the metric is non-trivial on this fixture: the anchor tokenizer
    // actually merges (fertility strictly > 1 somewhere) and languages
    // differ (the equity signal the row exists for)
    val fs = got.map(_.getDouble(4))
    assert(fs.exists(_ > 1.0) && fs.distinct.length > 1)
  }
}
