package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.TimeSeriesOps3

/** Pins for the round-9 tenth wave. */
class TimeSeries3Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val hourly: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf())
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), math.floorDiv(r.getLong(1), 3600000000L)))
      .groupBy(_._1).map { case (et, g) =>
        et -> g.groupBy(_._2).map { case (h, hg) => h -> hg.size.toLong }
          .toSeq.sortBy(_._1)
      }

  test("ts_bollinger matches a driver-side trailing-frame recompute") {
    val expected = hourly.toSeq.flatMap { case (et, series) =>
      series.indices.collect { case i if i >= 23 =>
        val fr = series.slice(i - 23, i + 1).map(_._2)
        val n = fr.size.toLong
        val s1 = fr.sum; val s2 = fr.map(v => v * v).sum
        val vnum = n * s2 - s1 * s1
        (et, series(i)._1, series(i)._2, n, s1, vnum)
      }.filter(_._6 > 0).map { case (et, h, y, n, s1, vnum) =>
        val m = s1.toDouble / n.toDouble
        val sd = math.sqrt(vnum.toDouble / (n.toDouble * (n - 1).toDouble))
        (et, h, y, round6(m), round6(m - 2.0 * sd), round6(m + 2.0 * sd),
          round6((y.toDouble - m) / sd))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TimeSeriesOps3.tsBollinger.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L, r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(t => t._6 > t._5), "hi > lo everywhere")
  }

  test("ts_heatmap_hour_dow matches a driver-side recompute; shares sum to 1") {
    val cells = Tables.events(spark, sf())
      .select(unix_micros(col("ts"))).collect()
      .map { r =>
        val hx = math.floorDiv(r.getLong(0), 3600000000L)
        ((hx / 24) % 7, hx % 24)
      }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val total = cells.values.sum
    val expected = cells.toSeq.map { case ((dow, hod), n) =>
      (dow, hod, n, round6(n.toDouble / total.toDouble))
    }.sortBy(t => (t._1, t._2))
    val got = TimeSeriesOps3.tsHeatmapHourDow.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
    assert(got.forall(t => t._1 >= 0 && t._1 < 7 && t._2 >= 0 && t._2 < 24))
  }
}
