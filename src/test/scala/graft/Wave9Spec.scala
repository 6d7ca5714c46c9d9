package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.{GraphQ3, TimeSeriesOps5}

/** Pins for the round-8 session-3 ninth wave: seasonal-adjusted MAD
  * anomalies, partial correlation, and the Kruskal backbone against an
  * independently derived edge list.
  */
class Wave9Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def pctDisc(sorted: Seq[Long], q: Double): Long =
    sorted((math.ceil(q * sorted.length) - 1).toInt.max(0))

  test("ts_seasonal_anomaly matches a dense-spine integer recompute") {
    val hours = Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(r => math.floorDiv(r.getLong(0), 3600000000L))
    val counts = hours.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    val (lo, hi) = (hours.min, hours.max)
    val dense = (lo to hi).map(h => (h, h % 24, counts.getOrElse(h, 0L)))
    val nd = dense.size.toLong / 24
    val seas = dense.groupBy(_._2).map { case (hod, g) => hod -> g.map(_._3).sum }
    val resid = dense.map { case (h, hod, y) => (h, hod, y, y * nd - seas(hod)) }
    val med = pctDisc(resid.map(_._4).sorted, 0.5)
    val dev = resid.map { case (h, hod, y, r) => (h, hod, y, r, math.abs(r - med)) }
    val mad = pctDisc(dev.map(_._5).sorted, 0.5)
    val expected = dev.filter(_._5 > 3 * mad)
      .sortBy { case (h, _, _, _, dv) => (-dv, h) }.take(20)
    val rows = TimeSeriesOps5.tsSeasonalAnomaly.fn(spark, sf()).collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (h, hod, y, res, dv)) =>
      assert(r.getLong(0) == h * 3600000000L)
      assert(r.getLong(1) == hod && r.getLong(2) == y)
      assert(r.getLong(3) == res && r.getLong(4) == dv && r.getLong(5) == mad)
    }
  }

  test("stats_partial_corr matches a driver-side recompute and bounds") {
    val daily = Tables.events(spark, sf())
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (math.floorDiv(r.getLong(0), 86400000000L), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, g) =>
        (g.count(_._2 == "view").toDouble, g.count(_._2 == "click").toDouble,
          g.count(_._2 == "purchase").toDouble)
      }
    def pearson(f: ((Double, Double, Double)) => Double,
        g: ((Double, Double, Double)) => Double): Double = {
      val n = daily.size.toDouble
      val sa = daily.map(f).sum; val sb = daily.map(g).sum
      (n * daily.map(t => f(t) * g(t)).sum - sa * sb) /
        math.sqrt((n * daily.map(t => f(t) * f(t)).sum - sa * sa) *
          (n * daily.map(t => g(t) * g(t)).sum - sb * sb))
    }
    val ryx = pearson(_._3, _._1); val ryz = pearson(_._3, _._2)
    val rxz = pearson(_._1, _._2)
    val pyx = (ryx - ryz * rxz) / math.sqrt((1 - ryz * ryz) * (1 - rxz * rxz))
    val row = TimeSeriesOps5.statsPartialCorr.fn(spark, sf()).collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(math.abs(row.getDouble(1) - ryx) <= 1e-6)
    assert(math.abs(row.getDouble(2) - ryz) <= 1e-6)
    assert(math.abs(row.getDouble(3) - rxz) <= 1e-6)
    assert(math.abs(row.getDouble(4) - pyx) <= 1e-6)
    Seq(1, 2, 3, 4, 5).foreach(i =>
      assert(row.getDouble(i) >= -1.0 && row.getDouble(i) <= 1.0))
  }

  test("b33_graph_mst matches Kruskal over independently derived edges") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val pw = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .map { case (s, c) => if (s < c) (s, c) else (c, s) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val np = pw.size.toLong; val tw = pw.values.sum
    val edges = pw.toSeq.collect { case ((a, b), w) if w * np > tw => (a, b, w) }
      .sortBy { case (a, b, w) => (-w, a, b) }
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val accepted = edges.filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; true } else false
    }
    val rows = GraphQ3.graphMstBackbone.fn(spark, sf()).collect()
    assert(rows.length == accepted.length)
    rows.zip(accepted).foreach { case (r, (a, b, w)) =>
      assert(r.getString(1) == a && r.getString(2) == b && r.getLong(3) == w)
      assert(r.getBoolean(4))
    }
    // spanning property: accepted = nodes − components
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = nodes.map(find).distinct.length
    assert(accepted.length == nodes.length - comps)
  }
}
