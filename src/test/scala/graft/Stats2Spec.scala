package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.Stats2

/** Ground-truth pins for the round-8 robust-stats/graph wave: each
  * operator is recomputed independently in driver-side Scala over
  * collected rows and compared exactly (after the same 6-dp pin the
  * queries apply).
  */
class Stats2Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val segPri: Seq[(String, String)] = {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => cust(r.getLong(0)) -> r.getString(1)).toSeq
  }

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

  test("stats_chi2 matches a driver-side contingency recompute") {
    val n = segPri.size.toDouble
    val nxy = segPri.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val nx = segPri.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val ny = segPri.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val chi2 = round6(nxy.toSeq.sortBy(_._1).map { case ((sg, pr), c) =>
      val dev = c * n - nx(sg) * ny(pr)
      dev * dev / (nx(sg).toDouble * ny(pr).toDouble * n)
    }.sum)
    val dof = (nx.size - 1).toLong * (ny.size - 1).toLong
    val v = round6(math.sqrt(chi2 / (n * math.min(nx.size - 1, ny.size - 1))))
    val row = Stats2.statsChi2.fn(spark, sf()).collect().head
    assert(row.getLong(0) == segPri.size.toLong)
    assert(row.getLong(1) == dof)
    assert(row.getDouble(2) == chi2)
    assert(row.getDouble(3) == v)
    assert(chi2 >= 0.0 && dof > 0)
  }

  test("stats_welch_t matches an exact-sufficient-statistics recompute") {
    def arm(seg: String): (Long, BigInt, BigInt) = {
      val xs = segCents.filter(_._1 == seg).map(_._2)
      (xs.size.toLong, xs.map(BigInt(_)).sum,
        xs.map(c => BigInt(c) * BigInt(c)).sum)
    }
    val (n0, s10, s20) = arm("BUILDING")
    val (n1, s11, s21) = arm("MACHINERY")
    def mean(s1: BigInt, n: Long) = s1.doubleValue / n.toDouble
    def vr(n: Long, s1: BigInt, s2: BigInt) =
      (BigInt(n) * s2 - s1 * s1).doubleValue / (n.toDouble * (n - 1).toDouble)
    val (m0, m1) = (mean(s10, n0), mean(s11, n1))
    val (v0, v1) = (vr(n0, s10, s20), vr(n1, s11, s21))
    val se0 = v0 / n0; val se1 = v1 / n1
    val t = round6((m0 - m1) / math.sqrt(se0 + se1))
    val dof = round6((se0 + se1) * (se0 + se1)
      / (se0 * se0 / (n0 - 1).toDouble + se1 * se1 / (n1 - 1).toDouble))
    val row = Stats2.statsWelchT.fn(spark, sf()).collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(row.getDouble(2) == round6(m0 / 100.0))
    assert(row.getDouble(3) == round6(m1 / 100.0))
    assert(row.getDouble(4) == t)
    assert(row.getDouble(5) == dof)
    // Welch dof must land between min(n0,n1)-1 and n0+n1-2
    assert(dof >= math.min(n0, n1) - 1.0 && dof <= (n0 + n1 - 2).toDouble)
  }

  test("winsorize_stats matches a sorted-percentile_disc recompute") {
    val bySeg = segCents.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Stats2.winsorizeStats.fn(spark, sf()).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(got.keySet == bySeg.keySet)
    bySeg.foreach { case (seg, xs) =>
      val n = xs.size
      // SQL-standard percentile_disc: smallest value with cume_dist >= q
      def disc(q: Double): Long = xs(math.ceil(q * n).toInt.max(1) - 1)
      val lo = disc(0.05); val hi = disc(0.95)
      val w = xs.map(c => math.min(math.max(c, lo), hi))
      val (gn, glo, ghi, gnlo, gnhi, gmr, gmw) = got(seg)
      assert(gn == n.toLong && glo == lo && ghi == hi)
      assert(gnlo == xs.count(_ < lo).toLong && gnhi == xs.count(_ > hi).toLong)
      assert(gmr == round6(xs.map(BigInt(_)).sum.doubleValue / (n.toDouble * 100.0)))
      assert(gmw == round6(w.map(BigInt(_)).sum.doubleValue / (n.toDouble * 100.0)))
      // clamping can only pull the mean toward the interior
      assert(gmw >= lo / 100.0 - 1e-9 && gmw <= hi / 100.0 + 1e-9)
    }
  }

  test("graph_triangles matches a brute-force edge/triangle recompute") {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val supp = Tables.supplier(spark, sf())
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nation = Tables.nation(spark, sf())
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordCust = Tables.orders(spark, sf())
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairW = Tables.lineitem(spark, sf())
      .select(col("l_suppkey").cast("long"), col("l_orderkey").cast("long")).collect()
      .map(r => (nation(supp(r.getLong(0))), nation(cust(ordCust(r.getLong(1))))))
      .filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val np = pairW.size.toLong
    val tw = pairW.values.sum
    // NOT pairW.collect { ... => p }.toSet — collect on a Map producing
    // tuples rebuilds a Map, silently collapsing edges by first nation
    val edges = pairW.filter { case (_, w) => w * np > tw }.keySet
    val nodes = edges.flatMap(p => Seq(p._1, p._2))
    val deg = nodes.map(nd => nd -> edges.count(p => p._1 == nd || p._2 == nd).toLong).toMap
    val sorted = nodes.toSeq.sorted
    val tris = for {
      a <- sorted; b <- sorted if a < b && edges((a, b))
      c <- sorted if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    val triCnt = nodes.map(nd =>
      nd -> tris.count(t => t._1 == nd || t._2 == nd || t._3 == nd).toLong).toMap
    val got = Stats2.graphTriangles.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == nodes.map(nd => nd -> (deg(nd), triCnt(nd))).toMap)
    assert(edges.nonEmpty, "mean-threshold edge set is vacuous")
  }

  test("window_rolling_median matches a sliding-window replay") {
    val hourly = Tables.events(spark, sf())
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val ordered = rows.sortBy(_._2.getTime)
      ordered.zipWithIndex.map { case ((_, hr, n), i) =>
        val frame = ordered.slice(math.max(0, i - 5), i + 1).map(_._3).sorted
        val k = frame.size
        val med =
          if (k % 2 == 1) frame((k + 1) / 2 - 1).toDouble
          else (frame(k / 2 - 1).toDouble + frame(k / 2).toDouble) / 2.0
        (et, hr, n) -> med
      }
    }.toMap
    val got = Stats2.windowRollingMedian.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(got == expected)
    // the smoother must actually smooth: some frame where med != n
    assert(got.exists { case ((_, _, n), med) => med != n.toDouble })
  }
}
