package graft

import org.apache.spark.sql.functions._

/** ann_ivf_pq ground truth: the full IVFPQ pipeline (coarse cosine
  * assignment → residual PQ codes → nprobe ADC) is replayed exactly
  * driver-side and the Spark row must match it; separately the
  * end-to-end quality is pinned — the exact-cosine top-5 must be
  * substantially recalled by the IVFPQ ADC top-50 shortlist even
  * though only nprobe=8 of the ⌈√n⌉ buckets are probed.
  */
class IvfPqRecallSpec extends SparkSpec {

  private val M = 8; private val S = 8; private val K = 16; private val NPROBE = 8
  private val queries = Seq(200L, 300L, 400L)

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private lazy val kC: Int =
    math.min(math.ceil(math.sqrt(vecs.size.toDouble)).toLong, 256L).toInt

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def subv(v: Array[Double], m: Int): Array[Double] =
    v.slice(m * S, m * S + S)
  private def l2(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def minus(a: Array[Double], b: Array[Double]): Array[Double] =
    a.zip(b).map { case (x, y) => x - y }

  private lazy val cents: Seq[(Long, Array[Double])] =
    (0L until kC.toLong).map(j => j -> vecs(j))

  private def assign(v: Array[Double]): Long =
    cents.minBy { case (cid, c) => (-cos(v, c), cid) }._1

  private lazy val resid: Map[Long, (Long, Array[Double])] =
    vecs.map { case (id, v) =>
      val cid = assign(v)
      id -> (cid, minus(v, vecs(cid)))
    }

  // codewords come from the first 16 NON-centroid vectors — a
  // centroid's own residual is zero (it assigns to itself)
  private lazy val anchors: Seq[Array[Double]] =
    (0 until K).map(j => resid(kC.toLong + j)._2)

  private lazy val codes: Map[Long, Array[Int]] =
    resid.map { case (id, (_, r)) =>
      id -> Array.tabulate(M) { m =>
        (0 until K).minBy(j => (l2(subv(r, m), subv(anchors(j), m)), j))
      }
    }

  /** ADC distances for q over vectors in its probed buckets. */
  private def adcDistances(q: Long): Seq[(Long, Double)] = {
    val probed = cents.sortBy { case (cid, c) => (-cos(vecs(q), c), cid) }
      .take(NPROBE).map(_._1).toSet
    val luts: Map[Long, Array[Array[Double]]] = probed.map { cid =>
      val qr = minus(vecs(q), vecs(cid))
      cid -> Array.tabulate(M, K)((m, j) => l2(subv(qr, m), subv(anchors(j), m)))
    }.toMap
    vecs.keys.filter(id => id != q && probed.contains(resid(id)._1)).map { id =>
      val lut = luts(resid(id)._1)
      id -> codes(id).zipWithIndex.map { case (c, m) => lut(m)(c) }.sum
    }.toSeq
  }

  test("ann_ivf_pq top-5 matches the driver-side IVFPQ replay exactly") {
    val got = graft.queries.AnnIvfPq.annIvfPq.fn(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == queries.size * 5)
    queries.foreach { q =>
      val expected = adcDistances(q)
        .map { case (id, d) =>
          (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, d) => (d, id) }.take(5)
      val mine = got.filter(_._1 == q).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(mine == expected, s"query $q: $mine vs $expected")
    }
  }

  test("ann_ivf_pq_rerank top-5 matches the driver-side two-stage replay exactly") {
    val got = graft.queries.AnnIvfPq.annIvfPqRerank.fn(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == queries.size * 5)
    queries.foreach { q =>
      val shortlist = adcDistances(q)
        .map { case (id, d) =>
          (id, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, d) => (d, id) }.take(50).map(_._1)
      val expected = shortlist
        .map(id => id -> cos(vecs(q), vecs(id)))
        .sortBy { case (id, c) => (-c, id) }.take(5)
        .map { case (id, c) =>
          (id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val mine = got.filter(_._1 == q).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(mine == expected, s"query $q: $mine vs $expected")
    }
  }

  test("in-bucket exact top-5 is recalled by the IVFPQ ADC top-50 shortlist") {
    // Probe recall (which buckets nprobe reaches) is ann_ivf_nprobe's
    // concern and is pinned in IvfRecallSpec; THIS gate isolates what
    // PQ adds — the quantization loss of the 8-byte codes — by
    // comparing against the exact-L2 top-5 over the SAME probed
    // candidate set the ADC scores (ADC approximates raw L2:
    // ‖(x−c) − (q−c)‖² = ‖x−q‖² within a shared bucket; cosine is the
    // coarse router's metric, not the scorer's — PqRecallSpec's
    // convention).
    val recalls = queries.map { q =>
      val candidates = adcDistances(q)
      val exact = candidates
        .map { case (id, _) => id -> l2(vecs(q), vecs(id)) }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
      val shortlist = candidates
        .sortBy { case (id, d) => (d, id) }.take(50).map(_._1).toSet
      exact.intersect(shortlist).size / 5.0
    }
    info(s"in-bucket recalls=$recalls")
    recalls.foreach(r => assert(r >= 0.6, s"recalls=$recalls"))
  }
}
