package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.RankOps

/** Ground-truth pins for the round-8d rank/robust/downsampling wave:
  * driver-side Scala recomputes (BigInt ranks, exact pair slopes,
  * integer cross-multiplied areas) compared exactly after the queries'
  * 6-dp pins.
  */
class RankOpsSpec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val segCents: Seq[(String, Long)] = {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map { r =>
        cust(r.getLong(0)) -> JBD.valueOf(r.getDouble(1))
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
      }.toSeq
  }

  test("stats_mann_whitney matches a driver-side exact-rank recompute") {
    val x0 = segCents.filter(_._1 == "BUILDING").map(_._2)
    val x1 = segCents.filter(_._1 == "MACHINERY").map(_._2)
    val pooled = (x0 ++ x1).groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val f0 = x0.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val values = pooled.keys.toSeq.sorted
    var p = 0L; var r02 = BigInt(0); var tie3 = BigInt(0)
    values.foreach { v =>
      val ct = pooled(v)
      r02 += BigInt(f0.getOrElse(v, 0L)) * (2 * p + ct + 1)
      if (ct > 1) tie3 += BigInt(ct) * ct * ct - ct
      p += ct
    }
    val n0 = x0.size.toLong; val n1 = x1.size.toLong; val n = n0 + n1
    val u02 = r02 - BigInt(n0) * (n0 + 1)
    val u0 = u02.toDouble / 2.0
    val z = round6(((u02 - BigInt(n0) * n1).toDouble / 2.0)
      / math.sqrt(n0.toDouble * n1.toDouble / 12.0
        * ((n + 1).toDouble - tie3.toDouble / (n.toDouble * (n - 1).toDouble))))
    val row = RankOps.statsMannWhitney.fn(spark, sf()).collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(row.getDouble(2) == u0)
    assert(row.getDouble(3) == z)
    // U must lie in [0, n0*n1]
    assert(u0 >= 0.0 && u0 <= n0.toDouble * n1.toDouble)
  }

  private lazy val hourCounts: Map[Long, Long] =
    Tables.events(spark, sf()).select(col("ts")).collect()
      .map(_.getTimestamp(0).getTime / 3600000L)
      .groupBy(identity).map { case (h, g) => h -> g.size.toLong }

  test("ts_theil_sen matches a driver-side pairwise-slope recompute") {
    val daily = Tables.events(spark, sf()).select(col("ts")).collect()
      .map(_.getTimestamp(0).getTime / 86400000L)
      .groupBy(identity).map { case (d0, g) => d0 -> g.size.toLong }
      .toSeq.sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.size
    } yield (daily(j)._2 - daily(i)._2).toDouble
      / (daily(j)._1 - daily(i)._1).toDouble).sorted
    val med = slopes(math.ceil(0.5 * slopes.size).toInt - 1) // percentile_disc(0.5)
    val row = RankOps.tsTheilSen.fn(spark, sf()).collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(row.getLong(1) == slopes.size.toLong)
    assert(row.getDouble(2) == round6(med))
  }

  test("ts_downsample_lttb matches a driver-side integer-area recompute") {
    val us0 = hourCounts.keys.min
    val pts = hourCounts.toSeq.map { case (h, y) => (h - us0, y) } // x in hours
    val byBucket = pts.groupBy(_._1 / 60)
    val expected = byBucket.keys.toSeq.sorted.flatMap { k =>
      (byBucket.get(k - 1), byBucket.get(k + 1)) match {
        case (Some(pv), Some(nx)) =>
          val (cp, sxp, syp) = (pv.size.toLong, pv.map(_._1).sum, pv.map(_._2).sum)
          val (cn, sxn, syn) = (nx.size.toLong, nx.map(_._1).sum, nx.map(_._2).sum)
          val best = byBucket(k).map { case (x, y) =>
            val area2 = ((BigInt(sxp) * cn - BigInt(sxn) * cp) * (BigInt(y) * cp - syp)
              - (BigInt(sxp) - BigInt(x) * cp) * (BigInt(syn) * cp - BigInt(syp) * cn)).abs
            (area2, x, y)
          }.minBy(t => (-t._1, t._2)) // max area, then min x
          Some((k, best._2, best._3))
        case _ => None
      }
    }
    val got = RankOps.tsDownsampleLttb.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
  }

  test("stats_spearman matches a driver-side exact-rank Pearson recompute") {
    val rows = Tables.lineitem(spark, sf())
      .select(col("l_quantity"), col("l_extendedprice")).collect()
      .map { r =>
        def cents(v: Double) = JBD.valueOf(v)
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
        (cents(r.getDouble(0)), cents(r.getDouble(1)))
      }
    def rank2Map(vs: Seq[Long]): Map[Long, BigInt] = {
      val counts = vs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
      var p = 0L
      counts.keys.toSeq.sorted.map { v =>
        val r = v -> (BigInt(2) * p + counts(v) + 1)
        p += counts(v); r
      }.toMap
    }
    val rx = rank2Map(rows.map(_._1).toSeq)
    val ry = rank2Map(rows.map(_._2).toSeq)
    val n = BigInt(rows.length)
    val xs = rows.map(r => rx(r._1)); val ys = rows.map(r => ry(r._2))
    val sx = xs.sum; val sy = ys.sum
    val sxy = rows.map(r => rx(r._1) * ry(r._2)).sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val rho = round6((n * sxy - sx * sy).toDouble
      / math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
    val row = RankOps.statsSpearman.fn(spark, sf()).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getDouble(1) == rho)
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("ts_forecast_eval matches a driver-side exact-integer recompute") {
    val counts = hourCounts
    val pairs = counts.toSeq.flatMap { case (h, yhat) =>
      counts.get(h + 24).map(y => (y, yhat))
    }
    val m = pairs.size.toLong
    val sad = pairs.map(p => math.abs(p._1 - p._2)).sum
    val sdiff = pairs.map(p => p._1 - p._2).sum
    val sy = pairs.map(_._1).sum
    val row = RankOps.tsForecastEval.fn(spark, sf()).collect().head
    assert(row.getLong(0) == m)
    assert(row.getDouble(1) == round6(sad.toDouble / sy.toDouble))
    assert(row.getDouble(2) == round6(sad.toDouble / m.toDouble))
    assert(row.getDouble(3) == round6(sdiff.toDouble / m.toDouble))
    assert(row.getDouble(1) > 0.0, "naive forecast must have nonzero error on real data")
  }

  test("b10_hll_merge: merged per-nation sketches equal the global sketch, inside error bound") {
    val row = RankOps.hllMerge.fn(spark, sf()).collect().head
    assert(row.getBoolean(3), "sketch union must equal the single-pass sketch (associativity)")
    assert(row.getBoolean(4), s"estimate ${row.getLong(1)} outside 5% of exact ${row.getLong(0)}")
  }
}
