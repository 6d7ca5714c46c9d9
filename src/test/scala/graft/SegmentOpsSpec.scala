package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.SegmentOps

/** Ground-truth pins for the segmentation/behavioral wave: each
  * operator is recomputed independently in driver-side Scala over
  * collected rows and compared (exactly for integer outputs, at the
  * query's declared rounding for float outputs).
  */
class SegmentOpsSpec extends SparkSpec {

  private def dec2(v: Double): JBD = JBD.valueOf(v).setScale(2, RoundingMode.HALF_UP)
  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("max_concurrency matches a driver-side interval sweep") {
    val rows = Tables.events(spark, sf())
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (t, es) =>
      // (time, delta, event_id) with closes (−1) before opens (+1): the
      // same total order the query's window declares
      val pts = es.flatMap(e => Seq((e._2, 1, e._3), (e._2 + 300000000L, -1, e._3)))
        .sortBy(p => (p._1, p._2, p._3))
      var cur = 0L; var peak = 0L
      pts.foreach { p => cur += p._2; if (cur > peak) peak = cur }
      t -> ((peak, es.length.toLong))
    }
    val got = SegmentOps.maxConcurrency.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._1 > 1), "sweep never saw overlapping intervals")
  }

  test("transition_matrix: counts recompute exactly and rows condition to 1") {
    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getLong(2), r.getString(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2.getEpochSecond, e._2.getNano.toLong, e._3))
      seq.zip(seq.drop(1)).map(p => (p._1._4, p._2._4))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SegmentOps.transitionMatrix.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
    assert(got.map { case (k, v) => k -> v._1 }.toMap == expected)
    // each source row's probabilities must sum to 1 (±1e-5 for the 6-dp rounding)
    got.groupBy(_._1._1).foreach { case (src, rs) =>
      val tot = rs.map(_._2._2).sum
      assert(math.abs(tot - 1.0) < 1e-5, s"$src transition probs sum to $tot")
    }
  }

  test("gini_segment matches the rank-formula recompute in exact cents") {
    val spend = Tables.customer(spark, sf())
      .join(Tables.orders(spark, sf()),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("c_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = spend.groupBy(_._1).map { case (seg, rs) =>
      val byCust = rs.groupBy(_._2).toSeq.map { case (ck, os) =>
        (ck, os.map(o => dec2(o._3)).reduce(_ add _)
          .multiply(new JBD(100)).setScale(0).longValueExact)
      }.sortBy(c => (c._2, c._1))
      val n = byCust.size.toLong
      val stot = byCust.map(_._2).sum
      val s1 = byCust.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
      seg -> ((n, round6((2.0 * s1 - (n + 1.0) * stot) / (n.toDouble * stot))))
    }
    val got = SegmentOps.giniSegment.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (seg, (n, g)) =>
      assert(n == expected(seg)._1, s"$seg customer count")
      assert(math.abs(g - expected(seg)._2) < 2e-6, s"$seg gini $g vs ${expected(seg)._2}")
      assert(g >= 0.0 && g < 1.0, s"$seg gini out of range: $g")
    }
  }

  test("benford_digits: digits from decimal strings, shares sum to 1") {
    val prices = Tables.orders(spark, sf()).select(col("o_totalprice"))
      .collect().map(_.getDouble(0))
    val expected = prices
      .map(p => dec2(p).toPlainString.dropWhile(c => !('1' to '9').contains(c)).head - '0')
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val got = SegmentOps.benfordDigits.fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-5, "shares must sum to 1")
    // the Benford column is data-independent: log10(1+1/d)
    got.foreach(g => assert(g._4 == round6(math.log10(1.0 + 1.0 / g._1))))
  }

  test("rfm_segment: partitions all customers exactly once, value conserved") {
    val nCust = Tables.orders(spark, sf())
      .select(col("o_custkey")).distinct().count()
    val corpusCents = Tables.orders(spark, sf())
      .agg((sum(Tables.dec2(col("o_totalprice"))) * 100).cast("long"))
      .collect().head.getLong(0)
    val got = SegmentOps.rfmSegment.fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._4).sum == nCust, "every customer lands in exactly one cell")
    val totalValue = got.map(g => dec2(g._5)).reduce(_ add _)
      .multiply(new JBD(100)).setScale(0, RoundingMode.HALF_UP).longValueExact
    assert(totalValue == corpusCents, "monetary totals must conserve corpus spend")
    got.foreach { g =>
      assert(g._1 >= 1 && g._1 <= 5 && g._2 >= 1 && g._2 <= 5 && g._3 >= 1 && g._3 <= 5,
        s"scores out of 1-5: $g")
    }
    // quintile scoring against interpolated cutpoints must not collapse:
    // every score value 1..5 appears in at least one cell per dimension
    Seq(got.map(_._1), got.map(_._2), got.map(_._3)).foreach { dim =>
      assert(dim.distinct.sorted.toSeq == Seq(1, 2, 3, 4, 5),
        s"degenerate quintiles: ${dim.distinct.sorted.toSeq}")
    }
  }

  test("zipf_slope: negative rank-frequency slope, exact rank count") {
    val got = SegmentOps.zipfSlope.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val en = got("en")
    assert(en._1 <= 200)
    // the synthetic corpus is flatter than natural text (−0.19 at
    // sf0.001 vs ≈−1 for real language) but the slope must still be
    // decisively negative and finite
    assert(en._2 < -0.05 && en._2 > -3.0, s"en zipf slope implausible: ${en._2}")
  }

  test("basket_brand_pairs: pair counts recompute exactly") {
    val li = Tables.lineitem(spark, sf()).select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brand = Tables.part(spark, sf()).select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = li.map(l => (l._1, brand(l._2))).distinct
      .groupBy(_._1).toSeq.flatMap { case (_, bs) =>
        val sorted = bs.map(_._2).distinct.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.size)
          yield (sorted(i), sorted(j))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SegmentOps.basketBrandPairs.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    val top = expected.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(25)
    assert(got.toSeq == top)
  }

  test("supplier_herfindahl matches the exact-cents share recompute, bounds hold") {
    val rows = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_extendedprice"))
      .join(Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_suppkey"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (nat, rs) =>
      val cents = rs.groupBy(_._2).values.map(os =>
        os.map(o => dec2(o._3)).reduce(_ add _)
          .multiply(new JBD(100)).setScale(0).longValueExact).toSeq
      val sq = cents.map(c => BigInt(c) * BigInt(c)).sum
      val tot = cents.sum
      nat -> ((cents.size.toLong,
        round6(sq.toDouble / (tot.toDouble * tot.toDouble))))
    }
    val got = SegmentOps.supplierHerfindahl.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (nat, (n, hhi)) =>
      assert(n == expected(nat)._1, s"$nat supplier count")
      assert(math.abs(hhi - expected(nat)._2) < 2e-6, s"$nat hhi")
      // HHI is bounded by (1/n, 1] — equality at 1 only for a monopoly
      assert(hhi > 1.0 / n - 1e-9 && hhi <= 1.0, s"$nat hhi out of bounds: $hhi")
    }
  }

  test("equi_depth_hist: near-uniform deciles, all rows accounted for") {
    val got = SegmentOps.equiDepthHist.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byType = got.groupBy(_._1)
    val totals = Tables.events(spark, sf()).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { case (t, buckets) =>
      assert(buckets.map(_._3).sum == totals(t), s"$t loses rows")
      assert(buckets.map(_._2).distinct.size == buckets.size, s"$t duplicate decile")
      // equi-DEPTH: every decile within 3x of the ideal n/10 (interpolated
      // cutpoints on continuous data are near-uniform, not exact)
      val ideal = totals(t) / 10.0
      buckets.foreach { case (_, dec, n) =>
        assert(n > ideal / 3 && n < ideal * 3, s"$t decile $dec count $n vs ideal $ideal")
      }
    }
  }

  test("funnel_conversion_time: delays positive, conversions bounded by viewers") {
    val got = SegmentOps.funnelConversionTime.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val nViewers = Tables.events(spark, sf())
      .filter(col("event_type") === "view").select(col("user_id")).distinct().count()
    assert(got.map(_._2).sum <= nViewers, "more conversions than viewers")
    got.foreach { case (h, n, p50, p90) =>
      assert(h >= 0 && h <= 23, s"bad hour $h")
      assert(n > 0)
      assert(p50 >= 0 && p90 >= p50, s"hour $h: p50=$p50 p90=$p90")
    }
  }

  test("graph_pagerank: mass accounts for dangling leak, floor respected, hub up") {
    val dir = sf("sf0.01")  // dense enough that every nation trades
    val got = graft.queries.GraphQ.graphPagerank.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.length == 25, "all 25 nations must appear")
    val n = got.length
    // which nations have out-edges (supply anything)?
    val hasOut = Tables.lineitem(spark, dir).select(col("l_suppkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct().collect().map(_.getString(0)).toSet
    val mass = got.map(_._2).sum
    if (hasOut.size == n)
      // no dangling nodes ⇒ PR is a probability distribution
      assert(math.abs(mass - 1.0) < 1e-4, s"mass=$mass")
    else
      // simplified PR: dangling nodes leak their damped mass each round
      assert(mass < 1.0 && mass > 0.15 - 1e-9, s"mass=$mass, dangling=${n - hasOut.size}")
    got.foreach { case (nat, p) =>
      assert(p >= 0.15 / n - 1e-9, s"$nat below teleport floor: $p")
      assert(p < 1.0, s"$nat: $p")
    }
    // the nation with the largest weighted in-share must rank above uniform
    val inw = Tables.lineitem(spark, dir).select(col("l_orderkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val topIn = inw.maxBy(_._2)._1
    assert(got.toMap.apply(topIn) > 1.0 / n,
      s"$topIn has the largest in-weight but below-uniform pagerank")
  }

  test("ts_mom_growth: first month per nation is NULL, growth recomputes from revenue") {
    val got = graft.queries.SegmentOps.tsMomGrowth.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byNation = got.groupBy(_._1)
    byNation.foreach { case (nat, rows) =>
      val seq = rows.sortBy(_._2.getTime)
      assert(seq.head._4.isEmpty, s"$nat first month must have NULL growth")
      seq.sliding(2).foreach {
        case Array(a, b) =>
          val expect = round6((b._3 - a._3) / a._3)
          assert(b._4.isDefined && math.abs(b._4.get - expect) < 2e-6,
            s"$nat ${b._2}: ${b._4} vs $expect")
        case _ =>
      }
    }
  }

  test("cohort_stickiness: ratio in (1/days, 1], integers conserve") {
    val got = graft.queries.SegmentOps.cohortStickiness.fn(spark, sf()).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (mon, mau, sumDau, nDays, st) =>
      assert(st > 0 && st <= 1.0 + 1e-9, s"$mon stickiness out of range: $st")
      // every monthly-active user contributes ≥1 active day
      assert(sumDau >= mau, s"$mon: sum_dau $sumDau < mau $mau")
      assert(math.abs(st - round6(sumDau.toDouble / (nDays * mau))) < 1e-9)
    }
  }

  test("window_interarrival: gap count conserves (events minus first-per-user)") {
    val got = graft.queries.SegmentOps.windowInterarrival.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nEvents = Tables.events(spark, sf()).count()
    val nUsers = Tables.events(spark, sf()).select(col("user_id")).distinct().count()
    assert(got.map(_._2).sum == nEvents - nUsers,
      s"every event except each user's first contributes exactly one gap")
    got.foreach { case (t, n, p50, p90) =>
      assert(n > 0 && p50 >= 0 && p90 >= p50, s"$t: n=$n p50=$p50 p90=$p90")
    }
  }

  test("dedup_family_hist: document count conserves across family sizes") {
    val got = graft.queries.SegmentOps.dedupFamilyHist.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf()).count()
    assert(got.map(_._3).sum == nDocs, "sum of n_docs must equal the corpus")
    got.foreach { case (size, nFam, nD) => assert(nD == size * nFam) }
  }

  test("agg_weighted_median matches a driver-side cumulative-weight replay") {
    val rows = Tables.lineitem(spark, sf())
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), dec2(r.getDouble(1)), r.getDouble(2).toLong))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; 2 * cum >= tot }.get._2
      flag -> ((med.doubleValue, tot))
    }
    val got = graft.queries.AggregatesExt.aggWeightedMedian.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("ts_rolling_corr emits only full 60-minute frames, corr in [-1,1]") {
    val got = SegmentOps.tsRollingCorr.fn(spark, sf("sf0.01")).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
    assert(got.nonEmpty, "sf0.01 must produce at least one full 60-minute frame")
    got.foreach { case (m, c) =>
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range at $m: $c")
    }
  }
}
