package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.{CorpusOps5, CurateOps9, RetrievalOps}

/** Pins for the round-16 wave: watermark detection, l-diversity,
  * reciprocal-rank fusion and Yule's K — each recomputed driver-side
  * from the raw fixture, independently of the Spark plan.
  */
class Wave16Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def md5u32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def docTokens(): Seq[(Long, Seq[String])] =
    Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect().toSeq
      .filter(!_.isNullAt(1))
      // split(-1): Spark's split keeps trailing empties like DuckDB's
      // string_split — the house tokenization, mirrored exactly
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1).toSeq))

  test("text_watermark_detect matches a driver-side green-list recompute") {
    val truth = docTokens()
      .filter(_._2.size >= 21)
      .map { case (id, w) =>
        val pairs = w.sliding(2).map(p => s"${p(0)}|${p(1)}").toSeq
        val t = pairs.size.toLong
        val g = pairs.count(p => md5u32(s"wm:$p") % 2 == 0).toLong
        (id, t, g, round6((2.0 * g - t) / math.sqrt(t.toDouble)))
      }
      .sortBy { case (id, _, _, z) => (-z, id) }
      .take(25)
    val got = CurateOps9.textWatermarkDetect.fn(spark, sf()).collect()
    assert(got.length == truth.length && got.nonEmpty)
    got.zip(truth).foreach { case (r, (id, t, g, z)) =>
      assert(r.getLong(0) == id, "doc_id")
      assert(r.getLong(1) == t, s"doc $id t_scored")
      assert(r.getLong(2) == g, s"doc $id n_green")
      assert(r.getDouble(3) == z, s"doc $id z")
      assert(r.getBoolean(4) == (z >= 4.0), s"doc $id flagged")
      assert(t >= 20 && g >= 0 && g <= t)
    }
    // the detector is exercised, not degenerate: green fractions vary
    // across docs and the top-25 z values are strictly positive (the
    // natural-corpus null puts the max of ~hundreds of N(0,1) draws
    // well above 0)
    assert(truth.map(_._3).distinct.size > 1)
    assert(got.head.getDouble(3) > 0.0)
  }

  test("privacy_l_diversity matches a driver-side QI-group recompute") {
    val rows = Tables.events(spark, sf())
      .select(col("event_type"), col("ts"), col("user_id")).collect().toSeq
      .map { r =>
        val et = if (r.isNullAt(0)) null else r.getString(0)
        val hx = if (r.isNullAt(1)) None else {
          val ts = r.getTimestamp(1)
          val micros = ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
          Some(Math.floorDiv(micros, 3600000000L))
        }
        val uid = if (r.isNullAt(2)) None else Some(r.getLong(2))
        (et, hx, uid)
      }
    val byQi = rows.groupBy(t => (t._1, t._2)).map { case (_, g) =>
      (g.head._1, g.size.toLong, g.flatMap(_._3).distinct.size.toLong)
    }.toSeq
    val truth = byQi.groupBy(_._1).map { case (et, gs) =>
      (et, gs.size.toLong, gs.count(_._3 < 3).toLong,
        gs.filter(_._3 < 3).map(_._2).sum, gs.map(_._3).min)
    }.toSeq.sortBy(t => (t._1 != null, Option(t._1).getOrElse("")))
    val got = CurateOps9.privacyLDiversity.fn(spark, sf()).collect()
    assert(got.length == truth.length && got.nonEmpty)
    got.zip(truth).foreach { case (r, (et, ng, rg, ear, ml)) =>
      assert(Option(r.getString(0)).orNull == et)
      assert(r.getLong(1) == ng, s"$et n_groups")
      assert(r.getLong(2) == rg, s"$et risky_groups")
      assert(r.getLong(3) == ear, s"$et events_at_risk")
      assert(r.getLong(4) == ml, s"$et min_l")
    }
    // the audit bites on this fixture: hour-grain groups are small
    // enough that SOME group fails l = 3 (else the row is a no-op)
    assert(got.exists(_.getLong(2) > 0), "no risky group — fixture too coarse")
  }

  test("rank_fusion_rrf matches a driver-side BM25+cosine fusion recompute") {
    val toks = docTokens()
    val terms = Set("join", "vector", "scan")
    val n = toks.size.toLong
    val sdl = toks.map(_._2.size.toLong).sum
    val avgdl = sdl.toDouble / n
    val tf = toks.flatMap { case (id, w) =>
      w.filter(terms).groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, hits) => t -> hits.size.toLong }
    val dl = toks.map(t => t._1 -> t._2.size.toLong).toMap
    val bm = tf.groupBy(_._1).map { case (id, hits) =>
      id -> round6(hits.map { case (_, t, f) =>
        math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (f * 2.2) /
          (f + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) / avgdl))
      }.sum)
    }.toSeq
    val ra = bm.sortBy { case (id, s) => (-s, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vecs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val q = vecs.find(_._1 == 1L).map(_._2)
    val cos = q.toSeq.flatMap { qv =>
      val qn = math.sqrt(dot(qv, qv))
      vecs.map { case (id, v) =>
        (id, round6(dot(v, qv) / (math.sqrt(dot(v, v)) * qn)))
      }
    }
    val rbr = cos.sortBy { case (id, s) => (-s, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val truth = (ra.keySet ++ rbr.keySet).toSeq.map { id =>
      val rrf = ra.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rbr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, ra.get(id), rbr.get(id), round6(rrf))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(25)
    val got = RetrievalOps.rankFusionRrf.fn(spark, sf()).collect()
    assert(got.length == truth.length && got.nonEmpty)
    got.zip(truth).foreach { case (r, (id, rka, rkb, s)) =>
      assert(r.getLong(0) == id, "doc_id")
      // row_number() is IntegerType in Spark (BIGINT in the oracle; the
      // driver hasher compares ints by value across widths)
      assert((if (r.isNullAt(1)) None else Some(r.getInt(1).toLong)) == rka, s"doc $id rank_bm25")
      assert((if (r.isNullAt(2)) None else Some(r.getInt(2).toLong)) == rkb, s"doc $id rank_cos")
      assert(r.getDouble(3) == s, s"doc $id rrf")
    }
    // genuine FUSION on this fixture: the top-25 contains docs from both
    // retrievers, including at least one doc only one retriever found
    assert(got.exists(!_.isNullAt(1)) && got.exists(!_.isNullAt(2)))
    assert(got.exists(r => r.isNullAt(1) || r.isNullAt(2)), "shortlists identical")
  }

  test("text_yule_k matches a driver-side frequency-spectrum recompute") {
    val truth = docTokens()
      .map { case (id, w) =>
        val f = w.groupBy(identity).map(_._2.size.toLong)
        (id, f.sum, f.size.toLong, f.map(x => x * x).sum)
      }
      .filter(_._2 >= 10)
      .map { case (id, nt, v, s2) =>
        (id, nt, v, round6(10000.0 * (s2 - nt) / (nt.toDouble * nt)))
      }
      .sortBy { case (id, _, _, k) => (-k, id) }
      .take(25)
    val got = CorpusOps5.textYuleK.fn(spark, sf()).collect()
    assert(got.length == truth.length && got.nonEmpty)
    got.zip(truth).foreach { case (r, (id, nt, v, k)) =>
      assert(r.getLong(0) == id, "doc_id")
      assert(r.getLong(1) == nt, s"doc $id n_tokens")
      assert(r.getLong(2) == v, s"doc $id vocab")
      assert(r.getDouble(3) == k, s"doc $id yule_k")
      // K's range under the declared semantic: ≥ −10⁴/N (all-hapax) and
      // ≤ 10⁴·(N−1)/N (single repeated word)
      assert(k >= -10000.0 / nt && k <= 10000.0 * (nt - 1) / nt)
    }
    // repetitiveness actually separates docs here
    assert(truth.map(_._4).distinct.size > 1)
  }
}
