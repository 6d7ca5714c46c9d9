package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.TimeSeriesOps4

/** Pins for the round-8 session-3 second wave: driver-side recomputes
  * of the Holt recursion, the lagged cross-correlation, and the
  * interval-union coverage.
  */
class TimeSeries4Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("ts_holt matches a driver-side sequential recursion") {
    val daily = Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(r => math.floorDiv(r.getLong(0), 86400000000L))
      .groupBy(identity).map { case (d, g) => d -> g.size.toLong }
      .toSeq.sortBy(_._1).map(_._2.toDouble)
    var lvl = daily(0)
    var trd = daily(1) - daily(0)
    daily.drop(1).foreach { y =>
      val nl = 0.5 * y + 0.5 * (lvl + trd)
      trd = 0.25 * (nl - lvl) + 0.75 * trd
      lvl = nl
    }
    val row = TimeSeriesOps4.tsHolt.fn(spark, sf()).collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(math.abs(row.getDouble(1) - lvl) <= 1e-6)
    assert(math.abs(row.getDouble(2) - trd) <= 1e-6)
    assert(math.abs(row.getDouble(3) - (lvl + trd)) <= 1e-6)
    assert(math.abs(row.getDouble(4) - (lvl + 7 * trd)) <= 1e-6)
  }

  test("ts_ccf matches a driver-side per-lag Pearson recompute and includes lag 0") {
    def hourly(tpe: String): Map[Long, Long] =
      Tables.events(spark, sf()).filter(col("event_type") === tpe)
        .select(unix_micros(date_trunc("hour", col("ts")))).collect()
        .map(_.getLong(0)).groupBy(identity)
        .map { case (k, g) => k -> g.size.toLong }
    val ha = hourly("error"); val hb = hourly("purchase")
    val rows = TimeSeriesOps4.tsCcf.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.contains(0L))
    (-3L to 3L).foreach { lag =>
      val pairs = ha.toSeq.flatMap { case (us, x) =>
        hb.get(us + lag * 3600000000L).map(y => (x.toDouble, y.toDouble))
      }
      val m = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val num = m * pairs.map(p => p._1 * p._2).sum - sx * sy
      val vx = m * pairs.map(p => p._1 * p._1).sum - sx * sx
      val vy = m * pairs.map(p => p._2 * p._2).sum - sy * sy
      if (vx > 0 && vy > 0) {
        val r = num / math.sqrt(vx * vy)
        val (gm, gr) = rows(lag)
        assert(gm == pairs.size.toLong, s"lag $lag m")
        assert(math.abs(gr - round6(r)) <= 1e-6, s"lag $lag ccf")
      } else assert(!rows.contains(lag))
    }
  }

  test("interval_coverage matches a brute-force day-set union per supplier") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val orderDate = Tables.orders(spark, sf())
      .select(col("o_orderkey"), expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val ivs = Tables.lineitem(spark, sf())
      .select(col("l_suppkey"), col("l_orderkey"),
        expr("unix_micros(date_trunc('day', l_shipdate)) div 86400000000"))
      .collect().map(r => (lv(r, 0), orderDate(lv(r, 1)), lv(r, 2)))
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    // brute force: covered = |union of day sets|, raw = Σ lengths
    val perSupp = ivs.groupBy(_._1).map { case (sk, g) =>
      val covered = g.flatMap { case (_, st, en) => st to en }.toSet.size.toLong
      val raw = g.map { case (_, st, en) => en - st + 1 }.sum
      (sk, covered, raw, g.size.toLong)
    }
    val perNat = perSupp.groupBy(t => suppNat(t._1)).map { case (nat, g) =>
      nat -> (g.size.toLong, g.map(_._4).sum, g.map(_._3).sum, g.map(_._2).sum)
    }
    val rows = TimeSeriesOps4.intervalCoverage.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSupp, nIv, raw, covered) = perNat(r.getString(0))
      assert(r.getLong(1) == nSupp, s"${r.getString(0)} suppliers")
      assert(r.getLong(2) == nIv, s"${r.getString(0)} intervals")
      assert(r.getLong(3) == raw, s"${r.getString(0)} raw")
      assert(r.getLong(4) == covered, s"${r.getString(0)} covered")
      assert(r.getDouble(5) == round6(raw.toDouble / covered.toDouble))
      assert(r.getDouble(5) >= 1.0) // union can never exceed the sum
    }
  }
}
