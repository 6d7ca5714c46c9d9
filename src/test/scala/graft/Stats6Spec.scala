package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Stats6

/** Pins for the round-9 eleventh wave. */
class Stats6Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val daily: Seq[(Long, Long)] =
    Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(r => math.floorDiv(r.getLong(0), 86400000000L))
      .groupBy(identity).map { case (d, g) => d -> g.size.toLong }
      .toSeq.sortBy(_._1)

  test("stats_runs_test matches a driver-side runs recompute") {
    val signs = daily.map(_._2).sliding(2).collect {
      case Seq(a, b) if b != a => if (b > a) 1 else -1
    }.toSeq
    val r = 1L + signs.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == -1).toLong
    val er = 2.0 * n1 * n2 / (n1 + n2).toDouble + 1.0
    val vr = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) /
      ((n1 + n2).toDouble * (n1 + n2).toDouble * (n1 + n2 - 1).toDouble)
    val row = Stats6.statsRunsTest.fn(spark, sf()).collect().head
    assert(row.getLong(0) == r && row.getLong(1) == n1 && row.getLong(2) == n2)
    assert(math.abs(row.getDouble(3) - round6(er)) <= 1e-6)
    assert(math.abs(row.getDouble(4) - round6((r.toDouble - er) / math.sqrt(vr))) <= 1e-6)
  }

  test("ts_max_deficit matches a driver-side scaled-drawdown recompute") {
    val nn = daily.size.toLong
    val s = daily.map(_._2).sum
    var cy = 0L; var peak = Long.MinValue
    var best = (Long.MinValue, Long.MaxValue) // (deficit, day)
    daily.zipWithIndex.foreach { case ((dx, y), idx) =>
      cy += y
      val c = nn * cy - (idx + 1L) * s
      if (c > peak) peak = c
      val deficit = peak - c
      if (deficit > best._1 || (deficit == best._1 && dx < best._2)) best = (deficit, dx)
    }
    val row = Stats6.tsMaxDeficit.fn(spark, sf()).collect().head
    assert(row.getLong(0) == best._2)
    assert(row.getLong(1) == best._1)
    assert(row.getDouble(2) ==
      round6(best._1.toDouble / (s.toDouble * nn.toDouble)))
    assert(row.getLong(1) >= 0L)
  }

  test("graph_reciprocity matches a driver-side recompute over independently derived edges") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val dirW = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val ne = dirW.size.toLong
    val tw = dirW.values.sum
    val e = dirW.toSeq.collect { case (k, w) if w * ne > tw => k }.toSet
    val recip = e.count { case (a, b) => e((b, a)) }.toLong
    val row = Stats6.graphReciprocity.fn(spark, sf()).collect().head
    assert(row.getLong(0) == e.size.toLong)
    assert(row.getLong(1) == recip)
    assert(row.getDouble(2) == round6(recip.toDouble / e.size.toDouble))
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }
}
