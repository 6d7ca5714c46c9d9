package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.{Instant, ZoneOffset}
import java.time.temporal.ChronoUnit
import org.apache.spark.sql.functions._
import graft.queries.{PatternOps, StatsOps}

/** Ground-truth pins for the pattern/stats wave: each operator is
  * recomputed independently in driver-side Scala over collected rows
  * (decimal pinning mirrors the queries — JBD.valueOf == Spark's
  * double→decimal cast path) and compared, mostly exactly.
  */
class PatternStatsSpec extends SparkSpec {

  private def dec2(v: Double): JBD = JBD.valueOf(v).setScale(2, RoundingMode.HALF_UP)
  private def dec6(v: Double): JBD = JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)
  private def round6(v: Double): Double = dec6(v).doubleValue
  private def round4(v: Double): Double =
    JBD.valueOf(v).setScale(4, RoundingMode.HALF_UP).doubleValue

  // (user_id, instant, event_id, event_type, value), total-ordered the
  // way every event window in the repo orders: (ts, event_id)
  private lazy val events: Array[(Long, Instant, Long, String, Double)] =
    Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2),
        r.getString(3), r.getDouble(4)))

  private def ordered(rows: Seq[(Long, Instant, Long, String, Double)]) =
    rows.sortBy(r => (r._2.getEpochSecond, r._2.getNano.toLong, r._3))

  test("window_pattern_match matches a driver-side sequence scan") {
    val expected = events.groupBy(_._1).flatMap { case (u, rows) =>
      val seq = ordered(rows.toSeq)
      val triples = seq.sliding(3).filter(w => w.size == 3 &&
        w(0)._4 == "view" && w(1)._4 == "click" && w(2)._4 == "purchase").toSeq
      if (triples.isEmpty) None
      else Some(u -> (triples.size.toLong,
        triples.map(t => dec2(t(2)._5)).reduce(_ add _).doubleValue))
    }
    val got = PatternOps.windowPatternMatch.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "corpus exercised zero view>click>purchase triples")
  }

  test("gaps_islands matches a driver-side streak recompute") {
    val expected = events.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay)
        .distinct.sorted
      // islands: split where the day gap exceeds 1
      val lens = days.foldLeft(List.empty[(Long, Long)]) { // (runLen, lastDay)
        case ((len, last) :: rest, d) if d == last + 1 => (len + 1, d) :: rest
        case (acc, d)                                  => (1L, d) :: acc
      }.map(_._1)
      u -> (lens.max, lens.size.toLong, lens.sum)
    }
    val got = PatternOps.gapsIslands.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 1), "no user with more than one streak — gap logic unexercised")
  }
  test("pareto_frontier is exactly the non-dominated set (both directions)") {
    // sf0.01: 100 suppliers — sf0.001's 10 are all mutually non-dominated,
    // which would leave the dominance branch untested
    val dir = sf("sf0.01")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").cast("long"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong, dec2(r.getDouble(2))))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agg = li.groupBy(_._1).map { case (sk, rows) =>
      (sk, sup(sk), rows.map(_._2).sum, rows.map(_._3).reduce(_ add _))
    }.toSeq
    val expected = agg.filter { case (sk, nat, qty, cost) =>
      !agg.exists { case (_, bNat, bQty, bCost) =>
        bNat == nat && bQty >= qty && bCost.compareTo(cost) <= 0 &&
          (bQty > qty || bCost.compareTo(cost) < 0)
      }
    }.map { case (sk, nat, qty, cost) => (nat, sk) -> (qty, cost.doubleValue) }.toMap
    def ln(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val got = PatternOps.paretoFrontier.fn(spark, dir).collect()
      .map(r => (ln(r, 0), ln(r, 1)) -> (ln(r, 3), r.getDouble(4))).toMap
    assert(got == expected)
    // and at least one supplier per populated nation was dominated away
    assert(expected.size < agg.size, "frontier equals the whole set — dominance unexercised")
  }

  test("ts_cusum matches an exact integer-cents replay; drift flag consistent") {
    // sf0.01: the drift threshold flags 0 rows on sf0.001's sparse hours,
    // which would leave the flag untested
    val dir = sf("sf0.01")
    val events01 = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // replay in exact integers: cents per (series, hour), prefix sums,
    // denominators cleared — the same arithmetic the query declares
    val hourly = events01
      .map(e => ((e._4, e._2.truncatedTo(ChronoUnit.HOURS)), dec2(e._5)))
      .groupBy(_._1)
      .map { case ((t, h), vs) =>
        (t, h, vs.map(_._2).reduce(_ add _).movePointRight(2).longValueExact) }
      .toSeq
    val expected = hourly.groupBy(_._1).flatMap { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      val sTot = ordered.map(_._3).sum
      val n = ordered.size.toLong
      var pfx = 0L
      ordered.zipWithIndex.map { case ((_, h, cents), i) =>
        pfx += cents
        val scaled = n * pfx - (i + 1) * sTot
        (t, h) -> (scaled.toDouble / (n * 100).toDouble,
          math.abs(scaled) > 200000L * n)
      }
    }
    val got = StatsOps.tsCusum.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant) ->
        (r.getDouble(2), r.getBoolean(3)))
    assert(got.length == expected.size)
    got.foreach { case (k, (cusum, drift)) =>
      assert(expected(k)._1 == cusum, s"cusum mismatch at $k")
      assert(expected(k)._2 == drift, s"drift flag mismatch at $k")
    }
    // telescoping: the final scaled deviation n·S − n·S is EXACTLY zero
    got.groupBy(_._1._1).foreach { case (t, rows) =>
      val last = rows.maxBy(_._1._2)._2._1
      assert(last == 0.0, s"series $t final cusum $last should be exactly 0")
    }
    assert(got.exists(_._2._2) && got.exists(!_._2._2),
      "drift threshold should split the corpus, not saturate it")
  }

  test("dq_outlier_iqr matches a driver-side quantile/fence recompute") {
    val byType = events.groupBy(_._4)
    val expected = byType.map { case (t, rows) =>
      val v = rows.map(_._5).sorted
      def q(p: Double): Double = {
        val pos = p * (v.length - 1)
        val lo = pos.toInt
        val frac = pos - lo
        if (frac == 0.0) v(lo) else v(lo) + (v(lo + 1) - v(lo)) * frac
      }
      val (q1, q3) = (q(0.25), q(0.75))
      val lo = round4(q1 - (q3 - q1) * 1.5)
      val hi = round4(q3 + (q3 - q1) * 1.5)
      t -> (rows.size.toLong, rows.count(r => r._5 < lo || r._5 > hi).toLong, lo, hi)
    }
    val got = StatsOps.dqOutlierIqr.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "no outliers anywhere — fence unexercised")
  }

  test("agg_linreg matches driver-side least squares to 6 dp") {
    val byType = events.groupBy(_._4)
    val got = StatsOps.aggLinreg.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4))).toMap
    byType.foreach { case (t, rows) =>
      val xs = rows.map(r =>
        r._2.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay.toDouble - 19723.0)
      // 19723 = epochDay(2024-01-01)
      val ys = rows.map(_._5)
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val slope = sxy / sxx
      val intercept = my - slope * mx
      val r2 = (sxy * sxy) / (sxx * syy)
      val (gs, gi, gr2, gn) = got(t)
      assert(math.abs(gs - slope) < 2e-6, s"$t slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 2e-6, s"$t intercept $gi vs $intercept")
      assert(math.abs(gr2 - r2) < 2e-6, s"$t r2 $gr2 vs $r2")
      assert(gn == rows.size.toLong)
    }
  }

  test("fn_regexp matches driver-side java.util.regex recomputation") {
    val parts = Tables.part(spark, sf())
      .select(col("p_partkey"), col("p_brand"), col("p_name"), col("p_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).take(200)
    val brandRe = "Brand#([0-9]+)".r
    val expected = parts.map { case (pk, brand, name, ptype) =>
      val num = brandRe.findFirstMatchIn(brand).map(_.group(1).toInt)
      val masked = name.replaceAll("[aeiou]", "_")
      val common = "^(ECONOMY|STANDARD)".r.findFirstIn(ptype).isDefined
      val vowels = "[aeiou]".r.findAllIn(name).size.toLong
      (pk, num, masked, common, vowels)
    }.toSeq
    val got = StatsOps.fnRegexp.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getString(2), r.getBoolean(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.forall(e => !e._3.exists("aeiou".contains(_))),
      "masking left a vowel behind")
  }

  test("join_asof_nearest matches a driver-side nearest scan") {
    val byUser = events.groupBy(_._1)
    val tolUs = 3600000000L
    def us(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
    val expected = events.filter(_._4 == "purchase").flatMap { p =>
      val clicks = byUser(p._1).filter(_._4 == "click")
        .filter(c => math.abs(us(c._2) - us(p._2)) <= tolUs)
      if (clicks.isEmpty) None
      else {
        val best = clicks.minBy(c => (math.abs(us(c._2) - us(p._2)), us(c._2), c._3))
        Some(p._3 -> (p._1, best._3, math.abs(us(best._2) - us(p._2))))
      }
    }.toMap
    val got = graft.queries.Joins.joinAsofNearest.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // the bidirectional semantics must be exercised: at least one match
    // is a FORWARD click (click after the purchase), which backward
    // as-of can never produce
    val forward = events.filter(_._4 == "purchase").exists { p =>
      got.get(p._3).exists { case (_, cid, _) =>
        byUser(p._1).exists(c => c._3 == cid && c._4 == "click" &&
          (us(c._2) > us(p._2)))
      }
    }
    assert(forward, "no forward match — nearest semantics degenerate to as-of")
  }

  test("cohort_ltv matches a driver-side cumulative replay") {
    // sf0.01: sf0.001's users all first appear on one day — a single
    // cohort would leave the age arithmetic across cohorts untested
    val dir = sf("sf0.01")
    val events01 = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val firstDay = events01.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay).min
    }
    val byCohortAge = events01.filter(_._4 == "purchase")
      .groupBy(e => (firstDay(e._1),
        e._2.atZone(ZoneOffset.UTC).toLocalDate.toEpochDay - firstDay(e._1)))
      .map { case ((cohort, age), rows) =>
        (cohort, age) -> (rows.map(r => dec2(r._5)).reduce(_ add _),
          rows.map(_._1).distinct.size.toLong)
      }
    val expected = byCohortAge.groupBy(_._1._1).flatMap { case (cohort, rows) =>
      var acc = JBD.ZERO
      rows.toSeq.sortBy(_._1._2).map { case ((_, age), (rev, users)) =>
        acc = acc.add(rev)
        (cohort, age) -> (acc.doubleValue, users)
      }
    }
    val got = graft.queries.LlmOpsAnalytics.cohortLtv.fn(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.keys.map(_._1).toSet.size >= 2, "only one cohort — age math unexercised")
  }

  test("window_share_of_total: shares sum to 1 per nation and match brute force") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_suppkey").cast("long"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getLong(0), dec2(r.getDouble(1))))
    val sup = Tables.supplier(spark, sf())
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val revBySupp = li.groupBy(_._1).map { case (sk, rows) =>
      (sk, sup(sk), rows.map(_._2).reduce(_ add _)) }.toSeq
    val totByNation = revBySupp.groupBy(_._2)
      .map { case (n, rows) => n -> rows.map(_._3).reduce(_ add _) }
    val expected = revBySupp.map { case (sk, nat, rev) =>
      (nat, sk) -> (rev.doubleValue, rev.doubleValue / totByNation(nat).doubleValue)
    }.toMap
    val got = graft.queries.WindowsQ.windowShareOfTotal.fn(spark, sf()).collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got == expected)
    // shares within each nation sum to 1 (to IEEE accumulation error)
    got.groupBy(_._1._1).foreach { case (nat, rows) =>
      val s = rows.values.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-9, s"nation $nat shares sum to $s")
    }
  }

  test("text_bigram_logprob matches a driver-side LM recompute") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 2)
    val dk = docs.flatMap { case (id, t) =>
      t.sliding(2).toSeq.groupBy(identity).map { case (bg, occ) => (id, bg, occ.size.toLong) }
    }
    val ck = dk.groupBy(_._2).map { case (bg, rows) => bg -> rows.map(_._3).sum }
    val tot = ck.values.sum.toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val scored = dk.groupBy(_._1).map { case (id, rows) =>
      val m = rows.map(_._3).sum
      val s = -rows.map(r => r._3 * log2(ck(r._2) / tot)).sum / m
      (id, m, round6(s))
    }.toSeq
    val expectedTop = scored.sortBy { case (id, _, s) => (-s, id) }.take(25)
    val got = StatsOps.textBigramLogprob.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) == expectedTop.map(_._1), "top-25 doc set/order diverged")
    got.zip(expectedTop).foreach { case ((id, m, s), (eid, em, es)) =>
      assert(m == em, s"doc $id bigram count $m vs $em")
      assert(math.abs(s - es) < 2e-6, s"doc $id surprisal $s vs $es")
    }
  }
}
