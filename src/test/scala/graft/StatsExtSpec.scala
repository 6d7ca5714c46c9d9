package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.StatsExt

/** Ground-truth pins for the stats/IR wave: each operator is recomputed
  * independently in driver-side Scala over collected rows and compared
  * exactly (after the same round-6 pin the queries apply).
  */
class StatsExtSpec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("text_bm25 matches a driver-side Okapi recompute") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
    val n = docs.length.toLong
    val sdl = docs.map(_._2.size.toLong).sum
    val avgdl = sdl.toDouble / n.toDouble
    val terms = Set("join", "vector", "scan")
    val tf = docs.flatMap { case (id, ws) =>
      ws.filter(terms).groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val dl = docs.toMap.map { case (id, ws) => id -> ws.size.toLong }
    val expected = tf.filter(_._1 <= 50).map { case (id, t, f) =>
      val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
      val score = idf * (f * 2.2) /
        (f + 1.2 * (1.0 - 0.75 + 0.75 * dl(id).toDouble / avgdl))
      (id, t) -> (f, round6(score))
    }.toMap
    val got = StatsExt.textBm25.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "no probe-term hits in the doc_id <= 50 window")
  }

  test("survival_km matches a driver-side Kaplan-Meier recompute") {
    val orders = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderdate")).collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1).toLocalDate)
    val dmax = orders.map(_._2).max
    val subj = orders.groupBy(_._1).values.map { rows =>
      val ds = rows.map(_._2).sorted
      val d1 = ds.head
      val d2 = ds.find(_.isAfter(d1))
      d2 match {
        case Some(d) => (d.toEpochDay - d1.toEpochDay, 1L)
        case None    => (dmax.toEpochDay - d1.toEpochDay, 0L)
      }
    }.toSeq
    val km = subj.groupBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    // risk set n(t) = subjects with T >= t; S(t) = prod over t' <= t
    var surv = Map.empty[Long, (Long, Long, Double)] // t -> (d, n, s)
    var logAcc = 0.0
    km.foreach { case (t, _, d) =>
      val nRisk = km.filter(_._1 >= t).map(_._2).sum
      if (d > 0) {
        logAcc += math.log(math.max(1.0 - d.toDouble / nRisk.toDouble, 1e-300))
        surv += t -> (d, nRisk, round6(math.exp(logAcc)))
      } else {
        // d = 0 rows are filtered out but still shrink later risk sets;
        // they contribute ln(1) = 0 so logAcc is untouched
      }
    }
    val got = StatsExt.survivalKm.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == surv)
    assert(got.nonEmpty)
    // survival curve must be monotone non-increasing over event times
    val curve = got.toSeq.sortBy(_._1).map(_._2._3)
    assert(curve.zip(curve.drop(1)).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("ab_test_z matches a driver-side two-proportion recompute") {
    val units = Tables.events(spark, sf())
      .select(col("user_id"), col("ts").cast("date").as("d"), col("event_type"))
      .collect()
      .map(r => ((r.getLong(0), r.getAs[java.time.LocalDate](1)), r.getString(2)))
      .groupBy(_._1).toSeq
      .map { case ((u, _), rows) => (u % 2, if (rows.exists(_._2 == "purchase")) 1L else 0L) }
    val Seq((n0, x0), (n1, x1)) = Seq(0L, 1L).map { g =>
      val rs = units.filter(_._1 == g)
      (rs.size.toLong, rs.map(_._2).sum)
    }
    val p0 = x0.toDouble / n0; val p1 = x1.toDouble / n1
    val pp = (x0 + x1).toDouble / (n0 + n1).toDouble
    val z = (p0 - p1) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    val r = StatsExt.abTestZ.fn(spark, sf()).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((n0, x0, n1, x1)))
    assert(r.getDouble(4) == round6(p0) && r.getDouble(5) == round6(p1))
    assert(r.getDouble(6) == round6(z))
    // both arms must have non-degenerate conversion or z is undefined
    assert(x0 > 0 && x0 < n0 && x1 > 0 && x1 < n1)
  }

  test("mutual_info matches a driver-side recompute and is non-negative") {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .flatMap(r => cust.get(r.getLong(0)).map(seg => (seg, r.getString(1))))
    val n = pairs.length.toDouble
    val nxy = pairs.groupBy(identity).map { case (k, g) => k -> g.size.toDouble }
    val nx = pairs.groupBy(_._1).map { case (k, g) => k -> g.size.toDouble }
    val ny = pairs.groupBy(_._2).map { case (k, g) => k -> g.size.toDouble }
    // driver-side sum order differs from Spark's partial-agg order; the
    // query pins round(.,6) with ~1e-16 noise against it, so compare at 6dp
    val mi = nxy.map { case ((sx, sy), c) =>
      (c / n) * math.log((c * n) / (nx(sx) * ny(sy)))
    }.sum
    val r = StatsExt.mutualInfo.fn(spark, sf()).collect().head
    assert(r.getLong(0) == pairs.length.toLong)
    assert(math.abs(r.getDouble(1) - mi) < 1e-6)
    assert(r.getDouble(1) >= 0.0, "MI must be non-negative")
  }

  test("assoc_rules matches a driver-side apriori recompute") {
    val part = Tables.part(spark, sf())
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = Tables.lineitem(spark, sf())
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => r.getLong(0) -> part(r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val nOrders = baskets.size.toLong
    val nBrand = baskets.values.toSeq.flatten.groupBy(identity)
      .map { case (b, g) => b -> g.size.toLong }
    val nAb = baskets.values.toSeq
      .flatMap(bs => bs.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val expected = nAb.collect {
      case ((a, b), c) if 100 * c >= nOrders =>
        (a, b) -> (c, round6(c.toDouble / nBrand(a)),
          round6(c.toDouble * nOrders / (nBrand(a).toDouble * nBrand(b).toDouble)))
    }.toMap
    val got = StatsExt.assocRules.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "support threshold filtered out every brand pair")
    // lift symmetry sanity: every rule's lift is positive
    assert(got.values.forall(_._3 > 0.0))
  }
}
