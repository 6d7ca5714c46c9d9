package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.{Instant, ZoneId}
import org.apache.spark.sql.functions._
import graft.queries.{CurateOps4, SurfaceOps}

/** Pins for the round-8 session-3 fifth wave: tz conversion against
  * java.time ground truth, try_* null semantics, the multi-agg pivot
  * grid, and the LR quality scorer.
  */
class Wave5Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("fn_timezone offsets match java.time rules and expose both DST regimes") {
    val micros = Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0))
    def offsets(zone: String, shiftDays: Long): Map[Long, Long] =
      micros.map { us =>
        val t = Instant.ofEpochSecond((us + shiftDays * 86400000000L) / 1000000L)
        ZoneId.of(zone).getRules.getOffset(t).getTotalSeconds.toLong / 3600L
      }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rows = SurfaceOps.fnTimezone.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    for ((zone, zn) <- Seq("America/New_York", "Australia/Sydney").map(z => (z, z));
         (period, shift) <- Seq(("jan", 0L), ("spring", 69L))) {
      offsets(zone, shift).foreach { case (off, n) =>
        assert(rows((period, zn, off)) == n, s"$period $zone offset $off")
      }
    }
    // spring window must straddle a transition in BOTH zones
    assert(rows.keys.count(k => k._1 == "spring" && k._2 == "America/New_York") == 2)
    assert(rows.keys.count(k => k._1 == "spring" && k._2 == "Australia/Sydney") == 2)
  }

  test("expr_try_arith nulls exactly at the documented boundaries") {
    val ks = Tables.orders(spark, sf()).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val rows = SurfaceOps.exprTryArith.fn(spark, sf()).collect()
      .map(r => r.getLong(0) -> r).toMap
    (0L to 2L).foreach { g =>
      val grp = ks.filter(_ % 3 == g)
      val r = rows(g)
      assert(r.getLong(1) == grp.length.toLong)
      assert(r.getLong(2) == grp.count(_ > 0).toLong, "try_add nulls")
      assert(r.getLong(3) == grp.count(_ >= 2).toLong, "try_multiply nulls")
      assert(r.getLong(4) == (if (g == 0) grp.length.toLong else 0L), "try_divide nulls")
      if (g == 0) assert(r.isNullAt(5) && r.isNullAt(6))
      else assert(!r.isNullAt(5) && r.getDouble(5) <= r.getDouble(6))
    }
  }

  test("pivot_multi_agg equals a driver-side two-measure crosstab") {
    val data = Tables.lineitem(spark, sf())
      .select(col("l_returnflag"), col("l_linestatus"),
        Tables.dec2(col("l_quantity"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2)))
    val rows = SurfaceOps.pivotMultiAgg.fn(spark, sf()).collect()
    rows.foreach { r =>
      val rf = r.getString(0)
      def cell(ls: String) = {
        val g = data.filter(t => t._1 == rf && t._2 == ls)
        (g.map(_._3.doubleValue).sum, g.length.toLong)
      }
      val (fs, fn) = cell("F"); val (os, on) = cell("O")
      assert(math.abs(r.getDouble(1) - fs) < 1e-6 && r.getLong(2) == fn)
      assert(math.abs(r.getDouble(3) - os) < 1e-6 && r.getLong(4) == on)
    }
    assert(rows.map(_.getString(0)).sorted.sameElements(Array("A", "N", "R")))
  }

  test("quality_lr_score matches a driver-side LR recompute") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), col("text"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val perLang = docs.groupBy(_._1).map { case (lang, g) =>
      val ps = g.flatMap { case (_, text, nChars) =>
        val words = text.toLowerCase.split(" ", -1)
        if (words.length == 0 || nChars == 0) None
        else {
          val nStop = words.count(stop)
          val nDig = text.count(_.isDigit)
          val z = -1.2 + 4.0 * (nStop.toDouble / words.length) +
            0.01 * words.length - 6.0 * (nDig.toDouble / nChars)
          Some(round6(1.0 / (1.0 + math.exp(-z))))
        }
      }
      lang -> (ps.length.toLong, ps.count(_ > 0.5).toLong)
    }
    val rows = CurateOps4.qualityLrScore.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == perLang.keySet)
    rows.foreach { r =>
      val (n, keep) = perLang(r.getString(0))
      assert(r.getLong(1) == n, s"${r.getString(0)} n")
      assert(r.getLong(2) == keep, s"${r.getString(0)} keep")
      assert(r.getDouble(3) == round6(keep.toDouble / n.toDouble))
    }
    // the filter must actually discriminate at sf0.001
    assert(rows.map(_.getLong(2)).sum > 0)
  }
}
