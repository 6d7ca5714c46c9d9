package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Stats4

/** Ground-truth pins for the round-9 inference/structure wave: every
  * oracle operator is recomputed independently in driver-side Scala
  * (maps, loops, BigInt — no Spark) over collected base rows and
  * compared after the same 6-dp pin the queries apply.
  */
class Stats4Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val segCents: Seq[(String, Long)] = {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map { r =>
        val cents = JBD.valueOf(r.getDouble(1))
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
        cust(r.getLong(0)) -> cents
      }.toSeq
  }

  /** One-way ANOVA from exact BigInt sufficient statistics. Returns
    * (nn, k, f, eta2) with floats entering only at the final formulas. */
  private def anovaF(groups: Map[String, Seq[Long]]): (Long, Long, Double, Double) = {
    val arms = groups.toSeq.map { case (_, xs) =>
      val n = xs.size.toLong
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum
      (n, s1, s2)
    }
    val k = arms.size.toLong
    val nn = arms.map(_._1).sum
    val g1 = arms.map(_._2).sum
    val g2 = arms.map(_._3).sum
    val ssw = arms.map { case (n, s1, s2) =>
      (BigInt(n) * s2 - s1 * s1).toDouble / n.toDouble
    }.sum
    val sst = (BigInt(nn) * g2 - g1 * g1).toDouble / nn.toDouble
    val f = ((sst - ssw) / (k - 1).toDouble) / (ssw / (nn - k).toDouble)
    val eta2 = (sst - ssw) / sst
    (nn, k, f, eta2)
  }

  test("stats_anova matches a driver-side exact-sufficient-statistics recompute") {
    val groups = segCents.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    val (nn, k, f, eta2) = anovaF(groups)
    val row = Stats4.statsAnova.fn(spark, sf()).collect().head
    assert(row.getLong(0) == nn && row.getLong(1) == k)
    assert(row.getLong(2) == k - 1 && row.getLong(3) == nn - k)
    assert(math.abs(row.getDouble(4) - round6(f)) <= 1e-6)
    assert(math.abs(row.getDouble(5) - round6(eta2)) <= 1e-6)
    assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0)
  }

  test("stats_levene_bf matches a driver-side median-deviation ANOVA recompute") {
    val groups = segCents.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    // percentile_disc(0.5): smallest element with cume fraction >= 0.5
    def med(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted(math.ceil(0.5 * sorted.size).toInt - 1)
    }
    val meds = groups.map { case (s, xs) => s -> med(xs) }
    val zGroups = groups.map { case (s, xs) => s -> xs.map(x => math.abs(x - meds(s))) }
    val (_, _, fBf, _) = anovaF(zGroups)
    val rows = Stats4.statsLeveneBf.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSeq == groups.keys.toSeq.sorted)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == groups(s).size.toLong)
      assert(r.getLong(2) == meds(s))
      val madMean = zGroups(s).map(BigInt(_)).sum.toDouble /
        (zGroups(s).size.toDouble * 100.0)
      assert(math.abs(r.getDouble(3) - round6(madMean)) <= 1e-6)
      assert(math.abs(r.getDouble(4) - round6(fBf)) <= 1e-6)
    }
  }

  test("stats_jensen_shannon matches a driver-side recompute and is bounded by ln 2") {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pris = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => cust(r.getLong(0)) -> r.getString(1))
      .filter(p => p._1 == "BUILDING" || p._1 == "MACHINERY")
    val b = pris.filter(_._1 == "BUILDING").map(_._2)
    val m = pris.filter(_._1 == "MACHINERY").map(_._2)
    val keys = (b ++ m).distinct
    val jsd = keys.map { pri =>
      val p = b.count(_ == pri).toDouble / b.size.toDouble
      val q = m.count(_ == pri).toDouble / m.size.toDouble
      val mid = (p + q) / 2.0
      (if (p > 0) 0.5 * p * math.log(p / mid) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / mid) else 0.0)
    }.sum
    val row = Stats4.statsJensenShannon.fn(spark, sf()).collect().head
    assert(row.getLong(0) == b.size.toLong && row.getLong(1) == m.size.toLong)
    assert(math.abs(row.getDouble(2) - round6(jsd)) <= 1e-6)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= math.log(2.0) + 1e-9)
    assert(row.getDouble(3) == round6(math.sqrt(row.getDouble(2))))
  }

  test("ts_changepoint_mean matches a driver-side exhaustive-split recompute") {
    val days = Tables.events(spark, sf()).select(col("ts")).collect()
      .map(_.getTimestamp(0).getTime / 86400000L)
    val dly = days.groupBy(identity).map { case (d, g) => d -> g.size.toLong }
      .toSeq.sortBy(_._1)
    val nn = dly.size.toLong
    val s = dly.map(_._2).sum
    val s2 = dly.map(c => c._2 * c._2).sum
    val sst = s2.toDouble - (s * s).toDouble / nn.toDouble
    var l1 = 0L
    val cands = dly.zipWithIndex.dropRight(1).map { case ((dx, y), idx) =>
      l1 += y
      val i = idx + 1L
      val gain = (l1 * l1).toDouble / i.toDouble +
        ((s - l1) * (s - l1)).toDouble / (nn - i).toDouble -
        (s * s).toDouble / nn.toDouble
      (dx, i, l1, gain)
    }
    val best = cands.maxBy(c => (c._4, -c._1))
    val row = Stats4.tsChangepointMean.fn(spark, sf()).collect().head
    assert(row.getLong(0) == best._1)
    assert(row.getLong(1) == best._2 && row.getLong(2) == nn - best._2)
    assert(row.getDouble(3) == round6(best._3.toDouble / best._2.toDouble))
    assert(row.getDouble(4) == round6((s - best._3).toDouble / (nn - best._2).toDouble))
    assert(row.getDouble(5) == round6(best._4 / sst))
    assert(row.getDouble(5) > 0.0 && row.getDouble(5) <= 1.0)
  }

  test("graph_assortativity matches a driver-side recompute over independently derived edges") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val pairW = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .groupBy(p => if (p._1 < p._2) (p._1, p._2) else (p._2, p._1))
      .map { case (k, g) => k -> g.size.toLong }
    val np = pairW.size.toLong
    val tw = pairW.values.sum
    val edges = pairW.toSeq.collect { case ((a, b), w) if w * np > tw => (a, b) }
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val xy = edges.flatMap { case (a, b) => Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = xy.size.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val r = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    val row = Stats4.graphAssortativity.fn(spark, sf()).collect().head
    assert(row.getLong(0) == edges.size.toLong)
    assert(row.getDouble(1) == round6(r))
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }
}
