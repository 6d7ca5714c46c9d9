package graft

import org.apache.spark.sql.functions._

/** ann_pq_adc ground truth: the ADC top-5 is replayed exactly from a
  * driver-side PQ recompute, and the PQ shortlist quality is pinned —
  * the exact-L2 top-5 must be substantially contained in the ADC
  * top-50 (the re-rank shortlist a real PQ pipeline feeds to exact
  * scoring). Measured 0.8 recall on this corpus; floor 0.6.
  */
class PqRecallSpec extends SparkSpec {

  private val M = 8; private val S = 8; private val K = 16
  private val queries = Seq(200L, 300L, 400L)

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def subv(v: Array[Double], m: Int): Array[Double] =
    v.slice(m * S, m * S + S)

  private def l2(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** code assignment per (vector, subspace): nearest anchor, ties → lowest id */
  private lazy val codes: Map[Long, Array[Int]] = {
    val anchors = (0 until K).map(j => vecs(j.toLong))
    vecs.map { case (id, v) =>
      id -> Array.tabulate(M) { m =>
        (0 until K).minBy(j => (l2(subv(v, m), subv(anchors(j), m)), j))
      }
    }
  }

  private def adcDistances(q: Long): Seq[(Long, Double)] = {
    val anchors = (0 until K).map(j => vecs(j.toLong))
    val lut = Array.tabulate(M, K)((m, j) => l2(subv(vecs(q), m), subv(anchors(j), m)))
    vecs.keys.filter(_ != q).map { id =>
      id -> codes(id).zipWithIndex.map { case (c, m) => lut(m)(c) }.sum
    }.toSeq
  }

  test("ann_pq_adc top-5 matches the driver-side PQ replay exactly") {
    val got = graft.queries.AnnPq.annPqAdc.fn(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == queries.size * 5)
    queries.foreach { q =>
      val expected = adcDistances(q)
        .map { case (id, d) => (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, d) => (d, id) }.take(5)
      val mine = got.filter(_._1 == q).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(mine == expected, s"query $q: $mine vs $expected")
    }
  }

  test("exact-L2 top-5 is recalled by the ADC top-50 shortlist (floor 0.6)") {
    val recalls = queries.map { q =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .map(id => id -> l2(vecs(q), vecs(id)))
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      val shortlist = adcDistances(q)
        .sortBy { case (id, d) => (d, id) }.take(50).map(_._1).toSet
      exact.intersect(shortlist).size / 5.0
    }
    recalls.foreach(r => assert(r >= 0.6, s"recalls=$recalls"))
  }
}
