package graft

import org.apache.spark.sql.functions._
import graft.queries.TimeSeriesOps6

/** Pin for the round-8 session-3 twelfth wave: the burst automaton
  * against a driver-side sequential DP recompute.
  */
class Wave12Spec extends SparkSpec {

  test("ts_burst_detect matches a driver-side two-state DP recompute") {
    val hours = Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(r => math.floorDiv(r.getLong(0), 3600000000L))
    val counts = hours.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    val (lo, hi) = (hours.min, hours.max)
    val ys = (lo to hi).map(h => counts.getOrElse(h, 0L).toDouble)
    val n = ys.size.toDouble
    val mu0 = ys.sum / n; val mu1 = 3.0 * ys.sum / n
    def r9(x: Double): Double =
      new java.math.BigDecimal(x).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val l0 = r9(math.log(mu0)); val l1 = r9(math.log(mu1))
    var c0 = mu0 - ys.head * l0
    var c1 = 5.0 + mu1 - ys.head * l1
    val labels = scala.collection.mutable.ArrayBuffer(if (c1 < c0) 1 else 0)
    ys.drop(1).foreach { y =>
      val nc0 = math.min(c0, c1) + (mu0 - y * l0)
      val nc1 = math.min(c1, c0 + 5.0) + (mu1 - y * l1)
      c0 = nc0; c1 = nc1
      labels += (if (c1 < c0) 1 else 0)
    }
    // episodes from the label run-lengths
    val episodes = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)]()
    var i = 0
    while (i < labels.size) {
      if (labels(i) == 1) {
        var j = i
        while (j + 1 < labels.size && labels(j + 1) == 1) j += 1
        val slice = (i to j).map(k => ys(k).toLong)
        episodes += (((lo + i) * 3600000000L, (lo + j) * 3600000000L,
          (j - i + 1).toLong, slice.sum, slice.max))
        i = j + 1
      } else i += 1
    }
    val rows = TimeSeriesOps6.tsBurstDetect.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == episodes.toSeq)
    // at sf0.001 the ~1.4 events/hour series never clears the γ entry
    // cost — zero episodes IS the correct answer there (the sf0.01
    // oracle run fires on the Jan-12 16:00 spike); sanity holds either way
    rows.foreach { case (s0, e0, nh, ne, pk) =>
      assert(e0 >= s0 && nh >= 1 && ne >= pk && pk > 0)
    }
    // the driver-side DP must have labeled every hour of the spine
    assert(labels.size == ys.size)
  }
}
