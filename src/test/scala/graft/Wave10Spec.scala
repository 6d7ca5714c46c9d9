package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.CurateOps5

/** Pins for the round-8 session-3 tenth wave: grouped-split leakage
  * guarantee and the NDCG computation.
  */
class Wave10Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("data_split_grouped: md5-deterministic, zero leakage, complete partition") {
    val users = Tables.events(spark, sf()).select(col("user_id")).collect()
      .map(_.getLong(0))
    def split(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val b = java.lang.Long.parseLong(h.take(4).map(x => f"${x & 0xff}%02x").mkString, 16) % 10
      if (b < 8) "train" else if (b < 9) "val" else "test"
    }
    val truth = users.groupBy(split).map { case (s, g) =>
      s -> (g.length.toLong, g.distinct.length.toLong)
    }
    val rows = CurateOps5.dataSplitGrouped.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == truth.keySet)
    rows.foreach { r =>
      val (ne, nu) = truth(r.getString(0))
      assert(r.getLong(1) == ne, s"${r.getString(0)} events")
      assert(r.getLong(2) == nu, s"${r.getString(0)} users")
      assert(r.getLong(3) == 0L, "leaked users")
    }
    assert(rows.map(_.getLong(1)).sum == users.length.toLong)
  }

  test("eval_ndcg_rankshift matches a driver-side NDCG recompute") {
    val rev = Tables.lineitem(spark, sf())
      .select(col("l_suppkey"),
        (Tables.dec2(col("l_extendedprice")) * 100).cast("long"),
        col("l_shipdate").cast("timestamp")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant.toString >= "2000-01-01"))
    val bySupp = rev.groupBy(_._1).map { case (sk, g) =>
      (sk, g.map(_._2).sum, g.filter(_._3).map(_._2).sum)
    }.toSeq
    val truthRank = bySupp.sortBy(t => (-t._2, t._1)).map(_._1).zipWithIndex
      .map { case (sk, i) => sk -> (i + 1) }.toMap
    val sysTop = bySupp.sortBy(t => (-t._3, t._1)).map(_._1).take(10)
    val dcg = sysTop.zipWithIndex.map { case (sk, i) =>
      val rel = if (truthRank(sk) <= 10) 11 - truthRank(sk) else 0
      rel / (math.log(i + 2) / math.log(2))
    }.sum
    val idcg = (1 to 10).map(r => (11 - r) / (math.log(r + 1) / math.log(2))).sum
    val overlap = sysTop.count(sk => truthRank(sk) <= 10).toLong
    val row = CurateOps5.evalNdcgRankshift.fn(spark, sf()).collect().head
    assert(math.abs(row.getDouble(0) - dcg) <= 1e-6)
    assert(math.abs(row.getDouble(1) - idcg) <= 1e-6)
    assert(math.abs(row.getDouble(2) - dcg / idcg) <= 1e-6)
    assert(row.getLong(3) == overlap)
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= 1.0)
  }
}
