package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.EvalOps

/** Pins for the round-8 session-3 thirteenth wave: MinHash estimator
  * calibration monotonicity and the peak-composition shares.
  */
class Wave13Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("eval_minhash_accuracy: calibrated and monotone in signature agreement") {
    val rows = EvalOps.evalMinhashAccuracy.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, est, n, avg) =>
      assert(k >= 0 && k <= 8)
      assert(est == round6(k.toDouble / 8.0))
      assert(n > 0)
      assert(avg >= 0.0 && avg <= 1.0)
    }
    // average exact Jaccard must rise with the agreement level
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._4 <= hi._4,
        s"calibration not monotone: k=${lo._1}→${lo._4} vs k=${hi._1}→${hi._4}")
      case _ =>
    }
    // full-agreement candidates must be near-duplicates
    sorted.lastOption.foreach { case (k, _, _, avg) =>
      if (k == 8) assert(avg >= 0.8, s"k=8 pairs averaged only $avg")
    }
  }

  test("ts_peak_composition matches driver-side shares on the top-5 hours") {
    val evs = Tables.events(spark, sf())
      .select(unix_micros(col("ts")), col("event_type")).collect()
      .map(r => (math.floorDiv(r.getLong(0), 3600000000L), r.getString(1)))
    val byHour = evs.groupBy(_._1).map { case (h, g) => h -> g.length.toLong }
    val peaks = byHour.toSeq.sortBy { case (h, n) => (-n, h) }.take(5)
    val overall = evs.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val nn = evs.length.toLong
    val rows = EvalOps.tsPeakComposition.fn(spark, sf()).collect()
    assert(rows.map(_.getLong(0)).distinct.length == peaks.length)
    rows.foreach { r =>
      val h = r.getLong(0) / 3600000000L
      val t = r.getString(1)
      val nHour = byHour(h)
      val nCell = evs.count(e => e._1 == h && e._2 == t).toLong
      assert(peaks.exists(_._1 == h), s"hour $h not a peak")
      assert(r.getLong(2) == nCell && r.getLong(3) == nHour)
      assert(r.getDouble(4) == round6(nCell.toDouble / nHour))
      assert(r.getDouble(5) == round6(overall(t).toDouble / nn))
      assert(math.abs(r.getDouble(6) -
        round6((nCell.toDouble / nHour) / (overall(t).toDouble / nn))) <= 1e-6)
    }
  }
}
