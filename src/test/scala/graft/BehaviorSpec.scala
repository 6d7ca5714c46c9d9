package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.{CdcOps, MiscOps, TimeSeriesOps, LlmOpsAnalytics}

/** Behavioral specs for the round-4 operators, beyond the oracle
  * hash-compare: each test recomputes the operator's semantics
  * independently (driver-side Scala over collected rows, or an
  * alternative Spark formulation) and compares. The decimal pinning
  * mirrors the queries exactly (java BigDecimal.valueOf = Spark's
  * double→decimal cast path), so comparisons are exact, not fuzzy.
  */
class BehaviorSpec extends SparkSpec {

  private def dec2(v: Double): JBD = JBD.valueOf(v).setScale(2, RoundingMode.HALF_UP)
  private def dec6(v: Double): JBD = JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  test("cdc_merge matches an independent merge recompute on the corpus") {
    // independent recompute: compact the changelog with maxBy instead of
    // a window, resolve the arms in driver-side Scala
    val orders = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // NTZ timestamp → ISO string: lexicographic == chronological
        col("o_orderdate").cast("string").as("od"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4)))
    val latest: Map[Long, (String, JBD)] = orders
      .map { case (okey, ckey, status, tp, od) =>
        val k = if (okey % 97 == 0) -ckey else ckey
        val op = if (status == "F") "D" else "U"
        (k, op, dec2(tp), od, okey)
      }
      .groupBy(_._1)
      .map { case (k, grp) =>
        val best = grp.maxBy(g => (g._4, g._5))
        k -> (best._2, best._3)
      }
    val customers = Tables.customer(spark, sf())
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), dec2(r.getDouble(1))))
    val custKeys = customers.map(_._1).toSet
    val expected = scala.collection.mutable.Map[Long, (String, Double)]()
    customers.foreach { case (ck, bal) =>
      latest.get(ck) match {
        case None             => expected(ck) = ("kept", bal.doubleValue)
        case Some(("D", _))   => () // delete arm: key vanishes
        case Some((_, amt))   => expected(ck) = ("updated", bal.add(amt).doubleValue)
      }
    }
    latest.foreach { case (k, (op, amt)) =>
      if (!custKeys.contains(k) && op == "U") expected(k) = ("inserted", amt.doubleValue)
    }
    // arms the corpus can exercise (every customer has ≥1 order, so the
    // kept arm needs the crafted-frame test below)
    val actions = expected.values.map(_._1).toSet
    assert(Set("updated", "inserted").subsetOf(actions), s"arms seen: $actions")
    assert(latest.exists { case (k, (op, _)) => op == "D" && custKeys.contains(k) },
      "no delete arm exercised")
    assert(latest.exists { case (k, (op, _)) => op == "D" && !custKeys.contains(k) },
      "no unmatched-delete no-op exercised")

    val got = CdcOps.cdcMerge.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == expected.toMap, "merge output diverges from reference semantics")
  }

  test("cdc_merge four arms + changelog compaction on a crafted frame") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val (d1, d2) = (Timestamp.valueOf("1995-01-01 00:00:00"),
      Timestamp.valueOf("1995-06-01 00:00:00"))
    Seq( // (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate)
      (10L, 2L, "O", 5.0, d1), (11L, 2L, "O", 7.0, d2),   // matched+U: latest wins
      (12L, 3L, "O", 9.0, d1), (13L, 3L, "F", 1.0, d2),   // matched+D: deleted
      (14L, 4L, "F", 2.0, d1), (15L, 4L, "O", 3.0, d2),   // D then U: updated
      (97L, 2L, "O", 8.0, d1),                            // unmatched+U: inserted (k=-2)
      (194L, 3L, "F", 4.0, d1),                           // unmatched+D: no-op
      (20L, 5L, "F", 1.0, d2), (21L, 5L, "O", 6.0, d2))   // same-date tie → higher okey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, 50.0))
      .toDF("c_custkey", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val got = CdcOps.cdcMerge.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (-2L, "inserted", 8.0),  // never-seen key from the %97 arm
      (1L, "kept", 10.0),      // untouched snapshot row survives
      (2L, "updated", 27.0),   // 20 + latest amount 7 (not 5)
      (4L, "updated", 43.0),   // latest op U overrides the older D
      (5L, "updated", 56.0)))  // 50 + 6: okey 21 beats 20 on the same date
  }

  test("ts_anomaly_zscore: the scored point never contaminates its own baseline") {
    // exact recompute: decimal-pinned rolling sums over the 20 rows
    // STRICTLY before each point; if the query's frame included the
    // current row, every z-score (and the flagged set) would differ
    val events = Tables.events(spark, sf())
      .select("event_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getDouble(3)))
    val flaggedExp = scala.collection.mutable.Map[Long, Double]()
    events.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._3.getNanos, r._1))
      for (i <- sorted.indices) {
        val hist = sorted.slice(math.max(0, i - 20), i)
        if (hist.length >= 10) {
          val n = hist.length
          val s1 = hist.map(h => dec6(h._4)).foldLeft(JBD.ZERO)(_.add(_)).doubleValue
          val s2 = hist.map { h =>
            val d = dec6(h._4); d.multiply(d).setScale(10, RoundingMode.HALF_UP)
          }.foldLeft(JBD.ZERO)(_.add(_)).doubleValue
          val mean = s1 / n
          val std = math.sqrt(math.max(s2 / n - mean * mean, 1e-12))
          val z = (sorted(i)._4 - mean) / std
          if (math.abs(z) > 2) flaggedExp(sorted(i)._1) = z
        }
      }
    }
    val got = TimeSeriesOps.tsAnomalyZscore.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got.keySet == flaggedExp.keySet,
      s"flagged sets differ: only-spark=${got.keySet -- flaggedExp.keySet} " +
        s"only-ref=${flaggedExp.keySet -- got.keySet}")
    got.foreach { case (id, z) =>
      assert(math.abs(z - JBD.valueOf(flaggedExp(id)).setScale(6, RoundingMode.HALF_UP).doubleValue) < 1e-9,
        s"z-score mismatch for event $id")
    }
    assert(got.nonEmpty, "no anomalies flagged — test has no power")
  }

  test("ts_resample_interp: edge buckets NULL, observed kept, gaps linear") {
    val rows = TimeSeriesOps.tsResampleInterp.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (series, rs) =>
      val s = rs.sortBy(_._2.getTime)
      // grid is a dense hourly lattice
      s.sliding(2).foreach { case Array(a, b) =>
        assert(b._2.getTime - a._2.getTime == 3600000L, s"$series grid not hourly")
      case _ => ()
      }
      val obs = s.zipWithIndex.filter(_._1._3 > 0)
      assert(obs.nonEmpty, s"$series has no observations")
      val (first, last) = (obs.head._2, obs.last._2)
      s.zipWithIndex.foreach { case ((_, _, n, v), i) =>
        if (i < first || i > last) assert(v.isEmpty, s"$series edge bucket $i not NULL")
        else if (n > 0) assert(v.isDefined, s"$series observed bucket $i NULL")
      }
      // interior gaps: exact linear interpolation between the bracketing
      // observations (equal hourly spacing => frac = (k-i)/(j-i))
      obs.map(_._2).sliding(2).foreach {
        case Array(i, j) if j > i + 1 =>
          val (vi, vj) = (s(i)._4.get, s(j)._4.get)
          for (k <- i + 1 until j) {
            val expect = vi + (vj - vi) * ((k - i).toDouble / (j - i).toDouble)
            val got = s(k)._4.getOrElse(fail(s"$series gap bucket $k NULL"))
            assert(math.abs(got - expect) <= 1e-9 * math.max(1.0, math.abs(expect)),
              s"$series bucket $k: got $got expected $expect")
          }
        case _ => ()
      }
    }
  }

  test("agg_skew_twophase equals the unsalted single-phase aggregate exactly") {
    // decimal partials are exact, so salted two-phase must be
    // bit-identical to a plain groupBy — not just approximately
    val plain = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(sum(Tables.dec2(col("l_extendedprice"))).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = MiscOps.aggSkewTwophase.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("text_rarity top-25 is rank-ordered with doc_id tie-breaks") {
    val rows = LlmOpsAnalytics.textRarity.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(rows.length == 25)
    assert(rows.map(_._3).toSeq == (1 to 25), "ranks not dense 1..25")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 < b._2 || (a._2 == b._2 && a._1 < b._1),
          s"rank order violated between ${a._1} and ${b._1}")
      case _ => ()
    }
  }

  test("langid trigram extraction: short docs emit nothing, BMP text segments per char") {
    // pins the SPARK-40194 assumption (split on "" truncates the
    // trailing empty element): if size(cs) were len+1, a 2-char doc
    // would emit a bogus trigram and every trigram would shift
    import spark.implicits._
    assert(spark.range(1).select(size(split(lit("ab"), ""))).head().getInt(0) == 2,
      "split('ab','') must yield exactly 2 elements (SPARK-40194)")
    val docs = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"),
      (5L, "abcde"), (6L, "héllo")).toDF("doc_id", "text")
    val tg = docs
      .select(col("doc_id"), split(lower(col("text")), "").as("cs"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(slice(sequence(1, greatest(size(cs) - 2, 1)), 1, greatest(size(cs) - 2, 0)),
           i -> concat(cs[i - 1], cs[i], cs[i + 1]))"""))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    assert(!tg.contains(1L) && !tg.contains(2L) && !tg.contains(3L),
      "docs shorter than 3 chars must emit no trigrams")
    assert(tg(4L) == Seq("abc"))
    assert(tg(5L) == Seq("abc", "bcd", "cde"))
    assert(tg(6L) == Seq("hél", "éll", "llo"))
  }

  test("ts_anomaly_mad equals a brute-force MAD recompute; robust to the planted outlier") {
    val evs = Tables.events(spark, sf())
      .selectExpr("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val flagged = evs.groupBy(_._2).flatMap { case (et, rows) =>
      val med = medianOf(rows.map(_._3).toSeq)
      val devs = rows.map(r => (r._1, math.abs(r._3 - med)))
      val mad = medianOf(devs.map(_._2).toSeq)
      if (mad <= 0) Seq.empty[(Long, String)]
      else devs.filter(_._2 > 3 * 1.4826 * mad).map(d => (d._1, et)).toSeq
    }.toSet
    val got = graft.queries.TimeSeriesOps.tsAnomalyMad.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === flagged)
    assert(got.nonEmpty, "no anomalies flagged — threshold path not exercised")
  }

  test("ts_rolling_1h equals a brute-force sliding-window recompute") {
    val evs = Tables.events(spark, sf())
      .selectExpr("event_id", "event_type", "unix_micros(ts) AS tsu", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val brute = evs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.map { e =>
        val in = rows.filter(o => o._3 >= e._3 - 3600000000L && o._3 <= e._3)
        val sum = in.map(o => BigDecimal(o._4).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)).sum
        e._1 -> (in.length.toLong, sum.toDouble)
      }
    }.toMap
    val got = graft.queries.TimeSeriesOps.tsRolling1h.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (id, (n, s)) =>
      assert((n, s) === brute(id), s"event $id rolling stats differ")
    }
    // the RANGE frame must actually vary (not everything in one window)
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("zorder_layout buckets equal a brute-force Morton interleave and show 2-D locality") {
    def morton4(a: Long, b: Long): Long =
      (0 until 4).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))).sum
    val li = Tables.lineitem(spark, sf())
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (okMin, okMax) = (li.map(_._1).min, li.map(_._1).max)
    val (pkMin, pkMax) = (li.map(_._2).min, li.map(_._2).max)
    val brute = li.toSeq
      .groupBy { case (ok, pk) =>
        morton4((ok - okMin) * 16 / (okMax - okMin + 1),
          (pk - pkMin) * 16 / (pkMax - pkMin + 1))
      }
      .map { case (bkt, rows) =>
        bkt -> (rows.size.toLong, rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).min, rows.map(_._2).max)
      }
    val got = graft.queries.MiscOps.zorderLayout.fn(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got === brute)
    // locality: the mean per-bucket key SPAN must be far below the global
    // span on BOTH dimensions — that's the pruning win a sort-by-one-col
    // layout cannot give on its second column
    val okSpanGlobal = (li.map(_._1).max - li.map(_._1).min).toDouble
    val pkSpanGlobal = (li.map(_._2).max - li.map(_._2).min).toDouble
    val multi = got.values.filter(_._1 > 1).toSeq
    val okSpanMean = multi.map(v => (v._3 - v._2).toDouble).sum / multi.size
    val pkSpanMean = multi.map(v => (v._5 - v._4).toDouble).sum / multi.size
    assert(okSpanMean < okSpanGlobal / 4, s"orderkey span $okSpanMean vs $okSpanGlobal")
    assert(pkSpanMean < pkSpanGlobal / 4, s"partkey span $pkSpanMean vs $pkSpanGlobal")
  }

  test("native session_window equals the gaps-and-islands formulation on the corpus") {
    // the two formulations differ ONLY at the exact-30-min-gap boundary
    // (BoundarySpec pins that divergence on a crafted corpus); on real
    // µs-resolution telemetry like this corpus they must agree row-for-row
    val native = graft.queries.StreamingBatch.streamSessionNative.fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3))).toSet
    val islands = graft.queries.StreamingBatch.streamSessionBatch.fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).getTime,
        r.getTimestamp(4).getTime + 1800000L, r.getLong(2))).toSet
    assert(native === islands)
    assert(native.nonEmpty)
  }

  test("the SQL Morton interleave is a bijection on the full 16x16 rank domain") {
    // pin the QUERY's interleave expression (not the test helper): all
    // 256 (na, nb) rank pairs must map to 256 distinct z-cells in [0, 256)
    import spark.implicits._
    val sparkZ = ((0 until 4).map(i =>
      s"((shiftright(na, $i) & 1) * ${1L << (2 * i + 1)}L)") ++
      (0 until 4).map(i =>
        s"((shiftright(nb, $i) & 1) * ${1L << (2 * i)}L)")).mkString(" + ")
    val cells = (for { a <- 0 until 16; b <- 0 until 16 } yield (a.toLong, b.toLong))
      .toDF("na", "nb")
      .selectExpr(s"CAST($sparkZ AS BIGINT) AS z")
      .collect().map(_.getLong(0))
    assert(cells.distinct.length === 256)
    assert(cells.min === 0L && cells.max === 255L)
  }

  test("stream_late_events equals a brute-force per-partition watermark replay") {
    val evs = Tables.events(spark, sf())
      .selectExpr("user_id % 8 AS part", "event_id", "unix_micros(ts) AS tsu")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def arrivalKey(eventId: Long): String = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(eventId.toString.getBytes("UTF-8"))
      dig.map("%02x".format(_)).mkString.take(8)
    }
    val brute = evs.groupBy(_._1).map { case (part, rows) =>
      var wm = Long.MinValue
      var late = 0L
      rows.sortBy(e => (arrivalKey(e._2), e._2)).foreach { e =>
        if (wm != Long.MinValue && e._3 < wm - 1800000000L) late += 1
        wm = math.max(wm, e._3)
      }
      part -> (rows.size.toLong, late)
    }
    val got = graft.queries.StreamingBatch.streamLateEvents.fn(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === brute)
    assert(got.values.map(_._2).sum > 0,
      "no late events in the corpus — late arm not exercised")
  }

  test("ts_ema: first row equals the hourly mean; ema stays inside the trailing-5 envelope") {
    val rows = graft.queries.TimeSeriesOps.tsEma.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, hs) =>
      val ordered = hs.sortBy(_._2.getTime)
      assert(math.abs(ordered.head._3 - ordered.head._4) < 1e-9,
        s"$et: series start must have ema == hour_avg")
      ordered.zipWithIndex.foreach { case ((_, _, _, ema), i) =>
        val window = ordered.slice(math.max(0, i - 4), i + 1).map(_._3)
        assert(ema >= window.min - 1e-6 && ema <= window.max + 1e-6,
          s"$et@$i: ema $ema outside its trailing-5 envelope " +
            s"[${window.min}, ${window.max}]")
      }
      // smoothing must reduce hop-to-hop variance vs the raw series
      def jitter(xs: Seq[Double]): Double =
        xs.sliding(2).map(p => math.abs(p(1) - p.head)).sum
      assert(jitter(ordered.map(_._4).toSeq) < jitter(ordered.map(_._3).toSeq),
        s"$et: ema did not smooth the series")
    }
  }

  test("ts_counter_rate equals a brute-force reset-aware replay; resets exercised") {
    val evs = Tables.events(spark, sf())
      .selectExpr("event_type", "unix_micros(ts) AS tsu", "event_id", "user_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = evs.groupBy(_._1).flatMap { case (et, rows) =>
      val ordered = rows.sortBy(e => (e._2, e._3))
      var segment = 0L
      var counter = 0L
      var prev = Option.empty[Long]
      val incs = ordered.map { case (_, tsu, eid, uid) =>
        if (uid % 97 == 0) { segment += 1; counter = 0 }
        counter += eid % 7 + 1
        val inc = prev match {
          case None                  => 0L
          case Some(p) if counter >= p => counter - p
          case _                     => counter // reset: post-reset absolute
        }
        prev = Some(counter)
        (tsu / 3600000000L, inc)
      }
      incs.groupBy(_._1).map { case (hr, xs) =>
        (et, hr) -> (xs.size.toLong, xs.map(_._2).sum)
      }
    }
    val got = graft.queries.TimeSeriesOps.tsCounterRate.fn(spark, sf())
      .selectExpr("event_type", "unix_micros(hour_ts) div 3600000000 AS hr",
        "n_samples", "total_increase")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === brute)
    // the reset arm must actually fire on this corpus
    assert(evs.exists(_._4 % 97 == 0), "no reset markers in corpus")
  }

  test("event_attribution conserves purchases and revenue; every bucket is real") {
    val ev = Tables.events(spark, sf())
    val totalPurch = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    val got = graft.queries.LlmOpsAnalytics.eventAttribution.fn(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet.subsetOf(Set("click", "view", "direct")))
    assert(got.map(_._2).sum === totalPurch,
      "every purchase attributed to exactly one bucket")
    // attributed buckets must dominate on a 30-day corpus with dense
    // click/view activity — 'direct' exists but is the minority
    val attributed = got.filter(_._1 != "direct").map(_._2).sum
    assert(attributed > 0, "no purchase found a preceding touch — join broken")
    assert(got.forall(_._3 >= 0.0))
  }
}
