package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.SurfaceOps2

/** Pins for the round-8 session-3 seventh wave: native regr_* family
  * vs an exact driver recompute, codec strings vs java.util ground
  * truth, and the TakeOrderedAndProject plan guarantee.
  */
class Wave7Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("agg_regr_native matches an exact sufficient-statistics recompute") {
    val daily = Tables.events(spark, sf())
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (math.floorDiv(r.getLong(0), 86400000000L), r.getString(1)))
      .groupBy(_._1).toSeq.map { case (_, g) =>
        (g.count(_._2 == "view").toDouble, g.count(_._2 == "purchase").toDouble)
      }
    val n = daily.size.toDouble
    val sx = daily.map(_._1).sum; val sy = daily.map(_._2).sum
    val sxx = daily.map(p => p._1 * p._1).sum
    val sxy = daily.map(p => p._1 * p._2).sum
    val syy = daily.map(p => p._2 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = sy / n - slope * sx / n
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val row = SurfaceOps2.aggRegrNative.fn(spark, sf()).collect().head
    assert(row.getLong(0) == daily.size.toLong)
    assert(math.abs(row.getDouble(1) - sx / n) <= 1e-6)
    assert(math.abs(row.getDouble(2) - sy / n) <= 1e-6)
    assert(math.abs(row.getDouble(3) - slope) <= 1e-6)
    assert(math.abs(row.getDouble(4) - intercept) <= 1e-6)
    assert(math.abs(row.getDouble(5) - r2) <= 1e-6)
  }

  test("fn_binary_codec agrees with java.util Base64/hex and round-trips") {
    val rows = SurfaceOps2.fnBinaryCodec.fn(spark, sf()).collect()
    assert(rows.length > 0)
    val names = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val n = names(r.getLong(0))
      assert(r.getString(1) ==
        java.util.Base64.getEncoder.encodeToString(n.getBytes("UTF-8")))
      assert(r.getString(2) ==
        n.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString)
      assert(r.getBoolean(3))
    }
  }

  test("b32_take_ordered: top-k plan, no global sort, window-rank agreement") {
    val row = SurfaceOps2.takeOrdered.fn(spark, sf()).collect().head
    assert(row.getBoolean(1), "no TakeOrderedAndProject in plan")
    assert(!row.getBoolean(2), "global sort planned for a LIMIT query")
    assert(row.getBoolean(3) && row.getBoolean(4))
  }
}
