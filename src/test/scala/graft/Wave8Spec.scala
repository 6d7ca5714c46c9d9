package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceOps3

/** Pins for the round-8 session-3 eighth wave: VARIANT access, month
  * clamping against java.time, and the collation collapse.
  */
class Wave8Spec extends SparkSpec {

  test("fn_variant stats match a driver-side JSON parse") {
    val evs = Tables.events(spark, sf())
      .select(col("event_type"), col("props")).collect()
      .map { r =>
        val m = """"k":\s*(-?\d+)""".r.findFirstMatchIn(r.getString(1))
        (r.getString(0), m.get.group(1).toLong)
      }
    val truth = evs.groupBy(_._1).map { case (t, g) =>
      t -> (g.length.toLong, g.map(_._2).sum, g.map(_._2).min, g.map(_._2).max)
    }
    val rows = SurfaceOps3.fnVariant.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == truth.keySet)
    rows.foreach { r =>
      val (n, s, mn, mx) = truth(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == s)
      assert(r.getLong(3) == mn && r.getLong(4) == mx)
      assert(r.getString(5) == "OBJECT<k: BIGINT>")
    }
  }

  test("fn_month_arith clamping agrees with java.time plusMonths") {
    val dates = Tables.orders(spark, sf())
      .select(to_date(col("o_orderdate"))).collect()
      .map(_.getDate(0).toLocalDate)
    val truth = dates.groupBy(d => d.plusMonths(1).withDayOfMonth(1)).map {
      case (m, g) =>
        m -> (g.length.toLong,
          g.count(d => d.plusMonths(1).getDayOfMonth != d.getDayOfMonth).toLong,
          g.count(d => d == d.withDayOfMonth(d.lengthOfMonth)).toLong)
    }
    val rows = SurfaceOps3.fnMonthArith.fn(spark, sf()).collect()
    assert(rows.map(_.getDate(0).toLocalDate).toSet == truth.keySet)
    rows.foreach { r =>
      val (n, clamped, eom) = truth(r.getDate(0).toLocalDate)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == clamped, s"${r.getDate(0)} clamped")
      assert(r.getLong(3) == eom)
    }
    // leap-year clamp must actually occur in the data (Jan 29-31 orders exist)
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("fn_collation halves distinct counts under UTF8_LCASE") {
    val rows = SurfaceOps3.fnCollation.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // at tiny SF not every (%10 base, case parity) pair exists; the
      // invariant is ci ≤ raw ≤ 2·ci with ci capped by the 10 bases
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= 2 * r.getLong(3),
        s"${r.getString(0)}: raw ${r.getLong(2)} vs ci ${r.getLong(3)}")
      assert(r.getLong(3) <= 10L)
    }
    // the collation must actually collapse something somewhere
    assert(rows.map(r => r.getLong(2) - r.getLong(3)).sum > 0)
  }
}
