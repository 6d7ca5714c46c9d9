package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Stats7

/** Pins for the round-8 session-3 first wave: driver-side recomputes of
  * Kendall tau-b, Wilcoxon signed-rank, the QQ decile map, and the
  * two-regressor OLS.
  */
class Stats7Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** (clicks, views, purchases) per day, sorted by day. */
  private lazy val daily: Seq[(Long, Long, Long, Long)] = {
    val rows = Tables.events(spark, sf())
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (math.floorDiv(r.getLong(0), 86400000000L), r.getString(1)))
    rows.groupBy(_._1).map { case (d, g) =>
      (d,
        g.count(_._2 == "click").toLong,
        g.count(_._2 == "view").toLong,
        g.count(_._2 == "purchase").toLong)
    }.toSeq.sortBy(_._1)
  }

  test("stats_kendall_tau matches a driver-side all-pairs recompute") {
    val xs = daily.map(t => (t._2, t._3))
    var c = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.size) {
      val px = xs(j)._1 - xs(i)._1
      val py = xs(j)._2 - xs(i)._2
      if (px * py > 0) c += 1
      else if (px * py < 0) disc += 1
      if (px == 0) tx += 1
      if (py == 0) ty += 1
    }
    val n = xs.size.toLong
    val n0 = n * (n - 1) / 2
    val tau = (c - disc).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val row = Stats7.statsKendallTau.fn(spark, sf()).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == c && row.getLong(2) == disc)
    assert(row.getLong(3) == tx && row.getLong(4) == ty)
    assert(math.abs(row.getDouble(5) - round6(tau)) <= 1e-6)
    assert(row.getDouble(5) >= -1.0 && row.getDouble(5) <= 1.0)
  }

  test("stats_wilcoxon matches a driver-side average-rank recompute") {
    val diffs = daily.map(t => t._2 - t._3).filter(_ != 0)
    val byAbs = diffs.groupBy(d => math.abs(d)).toSeq.sortBy(_._1)
    var prefix = 0L; var w2 = 0L; var tsum = 0L
    byAbs.foreach { case (_, g) =>
      val t = g.size.toLong
      val posT = g.count(_ > 0).toLong
      w2 += posT * (2 * prefix + t + 1) // 2·(average rank) summed over positives
      tsum += t * t * t - t
      prefix += t
    }
    val n = diffs.size.toLong
    val z = (w2.toDouble / 2.0 - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0)
    val row = Stats7.statsWilcoxon.fn(spark, sf()).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == w2 && row.getLong(2) == tsum)
    assert(math.abs(row.getDouble(3) - round6(z)) <= 1e-6)
  }

  test("stats_qq deciles are actual member cents with the percentile_disc index") {
    val byseg = Tables.customer(spark, sf())
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(Tables.orders(spark, sf()).select(col("o_custkey"), col("o_totalprice")),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"),
        (Tables.dec2(col("o_totalprice")) * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def disc(seg: String, q: Double): Long = {
      val sorted = byseg.filter(_._1 == seg).map(_._2).sorted
      sorted((math.ceil(q * sorted.length) - 1).toInt.max(0))
    }
    val rows = Stats7.statsQq.fn(spark, sf()).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val qa = disc("BUILDING", k / 10.0)
      val qb = disc("MACHINERY", k / 10.0)
      assert(r.getLong(1) == qa, s"decile $k BUILDING")
      assert(r.getLong(2) == qb, s"decile $k MACHINERY")
      assert(r.getDouble(3) == round6(qa.toDouble / qb.toDouble))
    }
    // monotone grids: deciles never decrease
    assert(rows.map(_.getLong(1)).sliding(2).forall { case Array(a, b) => a <= b })
  }

  test("stats_ols2 matches a driver-side normal-equations solve") {
    val pts = daily.map(t => (t._3.toDouble, t._2.toDouble, t._4.toDouble)) // x1=views, x2=clicks, y=purchases
    val n = pts.size.toDouble
    val sx1 = pts.map(_._1).sum; val sx2 = pts.map(_._2).sum; val sy = pts.map(_._3).sum
    val s11 = n * pts.map(p => p._1 * p._1).sum - sx1 * sx1
    val s22 = n * pts.map(p => p._2 * p._2).sum - sx2 * sx2
    val s12 = n * pts.map(p => p._1 * p._2).sum - sx1 * sx2
    val s1y = n * pts.map(p => p._1 * p._3).sum - sx1 * sy
    val s2y = n * pts.map(p => p._2 * p._3).sum - sx2 * sy
    val syy = n * pts.map(p => p._3 * p._3).sum - sy * sy
    val det = s11 * s22 - s12 * s12
    val b1 = (s22 * s1y - s12 * s2y) / det
    val b2 = (s11 * s2y - s12 * s1y) / det
    val b0 = (sy - b1 * sx1 - b2 * sx2) / n
    val r2 = (b1 * s1y + b2 * s2y) / syy
    val row = Stats7.statsOls2.fn(spark, sf()).collect().head
    assert(row.getLong(0) == pts.size.toLong)
    // driver recompute sums floats in a different order than Spark's exact
    // BIGINT sufficient statistics — compare to 1e-6, not bit-exact
    assert(math.abs(row.getDouble(1) - b0) <= 1e-6)
    assert(math.abs(row.getDouble(2) - b1) <= 1e-6)
    assert(math.abs(row.getDouble(3) - b2) <= 1e-6)
    assert(math.abs(row.getDouble(4) - r2) <= 1e-6)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }
}
