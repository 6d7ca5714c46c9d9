package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Stats5

/** Ground-truth pins for the round-9 second wave: driver-side Scala
  * recomputes (maps/loops, no Spark) over collected base rows.
  */
class Stats5Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val events: Seq[(Long, Long, String, Long)] =
    Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq

  test("stats_poisson_rate matches a driver-side recompute") {
    val n1 = events.count(_._3 == "error").toLong
    val n2 = events.count(_._3 == "click").toLong
    def day(us: Long): Long = math.floorDiv(us, 86400000000L)
    val days = day(events.map(_._4).max) - day(events.map(_._4).min) + 1
    val row = Stats5.statsPoissonRate.fn(spark, sf()).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2 && row.getLong(2) == days)
    assert(row.getDouble(3) == round6(n1.toDouble / days.toDouble))
    assert(row.getDouble(4) == round6(n2.toDouble / days.toDouble))
    assert(row.getDouble(5) == round6(n1.toDouble / n2.toDouble))
    assert(row.getDouble(6) == round6((n1.toDouble - n2.toDouble)
      / math.sqrt((n1 + n2).toDouble)))
  }

  test("stats_cond_entropy matches a driver-side recompute; MI identity holds") {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => cust(r.getLong(0)) -> r.getString(1)).toSeq
    val n = pairs.size.toDouble
    val py = pairs.groupBy(_._2).view.mapValues(_.size.toDouble / n)
    val hY = -py.values.map(p => p * math.log(p)).sum
    val hYX = -pairs.groupBy(identity).map { case ((seg, _), g) =>
      val pxy = g.size.toDouble / n
      val px = pairs.count(_._1 == seg).toDouble / n
      pxy * math.log(pxy / px)
    }.sum
    val row = Stats5.statsCondEntropy.fn(spark, sf()).collect().head
    assert(row.getLong(0) == pairs.size.toLong)
    assert(math.abs(row.getDouble(1) - round6(hY)) <= 1e-6)
    assert(math.abs(row.getDouble(2) - round6(hYX)) <= 1e-6)
    assert(row.getDouble(3) == round6(
      JBD.valueOf(row.getDouble(1)).subtract(JBD.valueOf(row.getDouble(2))).doubleValue))
    // MI >= 0 and H(Y|X) <= H(Y)
    assert(row.getDouble(3) >= -1e-6 && row.getDouble(2) <= row.getDouble(1) + 1e-6)
  }

  test("ts_peak_detect matches a driver-side local-maxima recompute") {
    def hour(us: Long): Long = math.floorDiv(us, 3600000000L)
    val byType = events.groupBy(_._3)
    val expected = byType.toSeq.flatMap { case (et, evs) =>
      val counts = evs.groupBy(e => hour(e._4)).map { case (h, g) => h -> g.size.toLong }
        .toSeq.sortBy(_._1)
      val sorted = counts.map(_._2).sorted
      val med = sorted(math.ceil(0.5 * sorted.size).toInt - 1)
      counts.sliding(3).collect {
        case Seq((_, p), (h, x), (_, nx)) if x > p && x > nx && x > med =>
          (et, h, x, med)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Stats5.tsPeakDetect.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain peaks")
  }

  test("join_asof_forward matches a driver-side next-purchase scan") {
    val vp = events.filter(e => e._3 == "view" || e._3 == "purchase")
    val expected = vp.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      // order: ts, views before purchases at equal ts, then event_id
      val sorted = evs.sortBy(e => (e._4, if (e._3 == "view") 0 else 1, e._1))
      sorted.zipWithIndex.collect { case ((id, _, "view", us), i) =>
        val np = sorted.drop(i + 1).find(_._3 == "purchase")
        (id, np.map(_._1), np.map(_._4 - us))
      }
    }.sortBy(_._1)
    val got = Stats5.joinAsofForward.fn(spark, sf()).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSeq
    assert(got == expected)
    assert(got.exists(_._2.isDefined) && got.forall(_._3.forall(_ >= 0L)))
  }
}
