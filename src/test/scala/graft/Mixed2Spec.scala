package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.MixedOps2

/** Ground-truth pins for the round-9 fourth wave. */
class Mixed2Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("embedding_centroid_dist matches a driver-side quantize-and-average recompute") {
    val rows = Tables.embeddings(spark, sf())
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    // HALF_UP (away from zero on negatives) — matches both engines'
    // round(); math.round would differ at -x.5
    val quant = rows.map { case (l, v) =>
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      (l, v.map(x => JBD.valueOf(x.toDouble * 127.0 / maxAbs)
        .setScale(0, RoundingMode.HALF_UP).longValue))
    }
    val centroids = quant.groupBy(_._1).map { case (l, g) =>
      val n = g.size.toDouble
      l -> (0 until 64).map(i => g.map(_._2(i)).sum.toDouble / n).toArray
    }
    val expected = centroids.keys.toSeq.sorted.combinations(2).map { case Seq(a, b) =>
      val d2 = (0 until 64).map { i =>
        val diff = centroids(a)(i) - centroids(b)(i); diff * diff
      }.sum
      (a, b, round6(math.sqrt(d2)))
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = MixedOps2.embeddingCentroidDist.fn(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 1e-6, s"${g._1}-${g._2}: ${g._3} vs ${e._3}")
    }
    assert(got.forall(_._3 > 0.0), "distinct label centroids must be separated")
  }

  test("ts_weekend_lift matches a driver-side epoch-day recompute") {
    val days = Tables.events(spark, sf()).select(unix_micros(col("ts"))).collect()
      .map(r => math.floorDiv(r.getLong(0), 86400000000L))
    val dly = days.groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    def isWe(d: Long): Boolean = d % 7 == 2 || d % 7 == 3
    val daysWe = dly.keys.count(isWe).toLong
    val daysWd = dly.keys.count(!isWe(_)).toLong
    val evWe = dly.filter(kv => isWe(kv._1)).values.sum
    val evWd = dly.filter(kv => !isWe(kv._1)).values.sum
    val row = MixedOps2.tsWeekendLift.fn(spark, sf()).collect().head
    assert(row.getLong(0) == daysWe && row.getLong(1) == daysWd)
    assert(row.getLong(2) == evWe && row.getLong(3) == evWd)
    assert(row.getDouble(4) == round6(evWe.toDouble / daysWe.toDouble))
    assert(row.getDouble(5) == round6(evWd.toDouble / daysWd.toDouble))
    assert(row.getDouble(6) == round6(
      (evWe.toDouble / daysWe.toDouble) / (evWd.toDouble / daysWd.toDouble)))
  }

  test("b23_zonemap_pruning: sorted layout reads at most half of shuffled; results equal") {
    val row = MixedOps2.zonemapPruning.fn(spark, sf()).collect().head
    assert(row.getLong(1) > 0L, "probe key range must match rows")
    assert(row.getBoolean(4), "layouts must agree on the answer")
    assert(row.getBoolean(5),
      s"no pruning: sorted=${row.getLong(2)} shuffled=${row.getLong(3)}")
    assert(row.getLong(3) == row.getLong(0), "shuffled layout must read everything")
  }
}
