package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.CorpusOps2

/** Ground-truth pins for the round-9 corpus-statistics wave:
  * driver-side Scala recomputes over collected documents.
  */
class Corpus2Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val docs: Seq[(Long, String, String, Seq[String])] =
    Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).toLowerCase.split(" ", -1).toSeq)).toSeq

  test("text_hapax_ratio matches a driver-side recompute") {
    val expected = docs.groupBy(_._2).toSeq.map { case (lang, g) =>
      val counts = g.flatMap(_._4).groupBy(identity).map { case (w, ws) => w -> ws.size }
      val vocab = counts.size.toLong
      val tokens = counts.values.map(_.toLong).sum
      val hapax = counts.values.count(_ == 1).toLong
      (lang, vocab, tokens, hapax,
        round6(hapax.toDouble / vocab.toDouble), round6(vocab.toDouble / tokens.toDouble))
    }.sortBy(_._1)
    val got = CorpusOps2.textHapaxRatio.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
    // the synthetic corpus has a ~50-word vocabulary: hapax can be 0
    assert(got.forall(t => t._5 >= 0.0 && t._5 <= 1.0 && t._6 > 0.0 && t._6 <= 1.0))
  }

  test("text_heaps_law matches a driver-side OLS recompute, 0 < b < 1") {
    val pts = docs.groupBy(_._3).toSeq.map { case (_, g) =>
      val ws = g.flatMap(_._4)
      (math.log(ws.size.toDouble), math.log(ws.distinct.size.toDouble))
    }
    val k = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val a = math.exp((sy - b * sx) / k)
    val row = CorpusOps2.textHeapsLaw.fn(spark, sf()).collect().head
    assert(row.getLong(0) == pts.size.toLong)
    assert(math.abs(row.getDouble(1) - round6(b)) <= 1e-6)
    assert(math.abs(row.getDouble(2) - round6(a)) <= 1e-5)
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.0,
      "Heaps exponent must be in (0,1) on a natural-ish corpus")
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("text_ngram_novelty matches a driver-side anti-join recompute") {
    def bucket(id: Long): Long = java.lang.Long.parseLong(md5Hex(id.toString).take(8), 16) % 2
    val bi = docs.map { case (id, lang, _, t) =>
      (lang, bucket(id), t.sliding(2).filter(_.size == 2).map(p => p(0) + " " + p(1)).toSet)
    }
    def setOf(b: Long): Map[String, Set[String]] =
      bi.filter(_._2 == b).groupBy(_._1).map { case (l, g) => l -> g.flatMap(_._3).toSet }
    val test0 = setOf(1); val train = setOf(0)
    val expected = test0.toSeq.map { case (lang, ts) =>
      val novel = ts.diff(train.getOrElse(lang, Set.empty)).size.toLong
      (lang, ts.size.toLong, novel, round6(novel.toDouble / ts.size.toDouble))
    }.sortBy(_._1)
    val got = CorpusOps2.textNgramNovelty.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.forall(t => t._3 <= t._2))
  }

  test("text_burstiness matches a driver-side Fano recompute; function words ~1") {
    val n = docs.size.toLong
    val wt = docs.flatMap { case (id, _, _, t) =>
      t.groupBy(identity).map { case (w, g) => (w, id, g.size.toLong) }
    }.groupBy(_._1).map { case (w, g) =>
      (w, g.map(_._3).sum, g.size.toLong, g.map(c => c._3 * c._3).sum)
    }
    val top = wt.toSeq.sortBy(t => (-t._2, t._1)).take(20)
    val expected = top.map { case (w, total, df, s2) =>
      val mean = total.toDouble / n.toDouble
      val varr = (s2.toDouble - total.toDouble * total.toDouble / n.toDouble) /
        (n - 1).toDouble
      (w, total, df, round6(varr / mean))
    }
    val got = CorpusOps2.textBurstiness.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.forall(_._4 >= 0.0))
  }
}
