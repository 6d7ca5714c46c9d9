package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsOps2

/** Pins for the round-9 eighth wave. */
class Analytics2Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("funnel_unordered matches a driver-side set-completion recompute") {
    val evs = Tables.events(spark, sf())
      .select(unix_micros(col("ts")), col("user_id"), col("event_type")).collect()
      .map(r => (math.floorDiv(r.getLong(0), 86400000000L), r.getLong(1), r.getString(2)))
      .filter(e => Set("view", "click", "purchase")(e._3))
    val expected = evs.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((d, _), g) => (d, g.map(_._3).toSet.size == 3) }
      .groupBy(_._1).toSeq.map { case (d, g) =>
        val all3 = g.count(_._2).toLong
        (d, g.size.toLong, all3, round6(all3.toDouble / g.size.toDouble))
      }.sortBy(_._1)
    val got = AnalyticsOps2.funnelUnordered.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0L), "fixture must contain completed funnels")
  }

  test("mixture_temperature: sqrt smoothing upsamples the tail, downsamples the head") {
    val chars = Tables.documents(spark, sf())
      .select(col("lang"), col("n_chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (l, g) => l -> g.map(_._2).sum }
    val total = chars.values.sum.toDouble
    val zsum = chars.values.map(c => math.sqrt(c / total)).sum
    val rows = AnalyticsOps2.mixtureTemperature.fn(spark, sf()).collect()
    rows.foreach { r =>
      val l = r.getString(0)
      val share = chars(l) / total
      assert(r.getLong(1) == chars(l))
      assert(math.abs(r.getDouble(2) - round6(share)) <= 1e-6)
      assert(math.abs(r.getDouble(3) - round6(math.sqrt(share) / zsum)) <= 1e-6)
    }
    // α < 1 ⇒ the upsample factor is strictly decreasing in share:
    // the tail gets boosted relative to the head
    val byShare = rows.sortBy(_.getDouble(2)).map(_.getDouble(4))
    assert(byShare.zip(byShare.tail).forall(p => p._1 >= p._2))
    assert(byShare.head > 1.0, "the smallest language must be upsampled")
    // temperature shares still sum to ~1
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }
}
