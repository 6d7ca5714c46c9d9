package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.CurateOps2

/** Pins for the round-9 sampling/streaming wave. */
class Curate2Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sample_weighted_topk matches a driver-side A-Res recompute") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      g.map { case (id, _, w) =>
        val u = java.lang.Long.parseLong(md5Hex(id.toString).take(8), 16) / 4294967296.0
        val k = JBD.valueOf(math.log(u) / w.toDouble)
          .setScale(6, RoundingMode.HALF_UP).doubleValue
        (id, w, k)
      }.sortBy(t => (-t._3, t._1)).take(5).zipWithIndex
        .map { case ((id, w, _), i) => (lang, (i + 1).toLong, id, w) }
    }.sortBy(t => (t._1, t._2))
    val got = CurateOps2.sampleWeightedTopk.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue, r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // longer docs must be overrepresented: sampled mean length > corpus mean
    val corpusMean = docs.map(_._3).sum.toDouble / docs.size
    val sampleMean = got.map(_._4).sum.toDouble / got.size
    assert(sampleMean > corpusMean,
      s"weighting has no effect: sample $sampleMean vs corpus $corpusMean")
  }

  test("b24_watermark_metrics: late batch dropped, metric surfaced, window stable") {
    val row = CurateOps2.watermarkMetrics.fn(spark, sf()).collect().head
    assert(row.getLong(1) == 1L, "exactly the first window must have closed")
    assert(row.getLong(2) == 20L, "closed window must keep its on-time count")
    assert(row.getLong(3) >= 1L, "watermark drop must surface in the metric")
    assert(row.getBoolean(4))
  }
}
