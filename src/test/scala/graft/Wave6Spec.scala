package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.{FeatureOps2, NoOracle4}

/** Pins for the round-8 session-3 sixth wave: top principal component
  * against an independent driver-side recompute, and the AQE
  * partition-coalescing evidence row.
  */
class Wave6Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("embedding_pca_top matches an independent quantize→cov→power recompute") {
    val vecs = Tables.embeddings(spark, sf())
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val q = vecs.map { v =>
      val m = v.map(math.abs).max
      v.map(x => math.round(x * 127.0 / m).toDouble)
    }
    val n = q.length.toDouble
    val d = 64
    val c = Array.ofDim[Double](d + 1, d + 1)
    for (i <- 1 to d; j <- i to d) {
      var sij = 0.0; var si = 0.0; var sj = 0.0
      q.foreach { v => sij += v(i - 1) * v(j - 1); si += v(i - 1); sj += v(j - 1) }
      val cov = round6((n * sij - si * sj) / (n * n))
      c(i)(j) = cov; c(j)(i) = cov
    }
    var v = Array.fill(d + 1)(0.125); v(0) = 0.0
    (1 to 8).foreach { _ =>
      val nv = Array.ofDim[Double](d + 1)
      for (i <- 1 to d) { var a = 0.0; for (j <- 1 to d) a += c(i)(j) * v(j); nv(i) = a }
      v = nv
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val u = v.map(_ / norm)
    val rows = FeatureOps2.embeddingPcaTop.fn(spark, sf()).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      assert(math.abs(r.getDouble(1) - u(i)) <= 2e-6, s"dim $i loading")
    }
    // unit norm of the reported loadings
    val s2 = rows.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(s2 - 1.0) <= 1e-4)
    // Rayleigh quotient positive and consistent with var_share
    val eig = rows.head.getDouble(2); val share = rows.head.getDouble(3)
    assert(eig > 0 && share > 0 && share <= 1.0)
    val trace = (1 to d).map(i => c(i)(i)).sum
    assert(math.abs(share - eig / trace) <= 1e-4)
  }

  test("b31_aqe_coalesce: AQE reads fewer post-shuffle partitions, same results") {
    val row = NoOracle4.aqeCoalesce.fn(spark, sf()).collect().head
    assert(row.getBoolean(2), "plan not marked coalesced")
    assert(row.getLong(1) > 0 && row.getLong(1) < row.getLong(0),
      s"AQE read ${row.getLong(1)} vs static ${row.getLong(0)}")
    assert(row.getBoolean(3) && row.getBoolean(4))
  }
}
