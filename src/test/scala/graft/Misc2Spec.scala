package graft

import org.apache.spark.sql.functions._
import graft.queries.MiscOps2

/** Ground-truth pins for the round-9 warehouse-audit wave (all
  * exact-integer semantics — recomputes are plain Scala counts).
  */
class Misc2Spec extends SparkSpec {

  test("dq_referential: child counts match the tables; fixture has no orphans") {
    val rows = MiscOps2.dqReferential.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq ==
      Seq("customer->nation", "lineitem->orders", "lineitem->part",
        "orders->customer", "supplier->nation"))
    val nCust = Tables.customer(spark, sf()).count()
    val nLine = Tables.lineitem(spark, sf()).count()
    val byFk = rows.map(r => r._1 -> r).toMap
    assert(byFk("customer->nation")._2 == nCust)
    assert(byFk("lineitem->orders")._2 == nLine)
    assert(rows.forall(r => r._3 == 0L && r._4), "driver fixture must be orphan-free")
  }

  test("join_null_safe: NULL groups match each other; counts tie to a driver recompute") {
    val cust = Tables.customer(spark, sf())
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_nationkey")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getAs[Number](2).longValue))
    def side(segs: Set[String]): Map[Option[Long], Long] =
      cust.filter(c => segs(c._1))
        .map(c => if (c._2 < 0) None else Some(c._3))
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val a = side(Set("BUILDING", "AUTOMOBILE"))
    val b = side(Set("MACHINERY", "HOUSEHOLD"))
    val expected = a.keySet.intersect(b.keySet).toSeq
      .map(k => (k, a(k), b(k)))
      .sortBy(_._1.map(_.toString).getOrElse("")) // NULLS FIRST ~ None sorts first via ""
    val got = MiscOps2.joinNullSafe.fn(spark, sf()).collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getAs[Number](0).longValue),
        r.getLong(1), r.getLong(2))
    }.toSeq
    assert(got.toSet == expected.toSet)
    assert(got.exists(_._1.isEmpty), "the NULL<=>NULL group must match")
    assert(got.head._1.isEmpty, "NULLS FIRST ordering")
  }

  test("agg_bitwise_agg matches a driver-side fold and is partitioning-independent") {
    val evs = Tables.events(spark, sf())
      .select(col("event_type"), (col("user_id") % 256).as("f")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = evs.groupBy(_._1).map { case (et, g) =>
      val fs = g.map(_._2)
      (et, fs.reduce(_ | _), fs.reduce(_ & _), fs.reduce(_ ^ _), fs.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = MiscOps2.aggBitwise2.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("window_nth_value: third_cents is NULL for rn<3 and the rank-3 value after") {
    val rows = MiscOps2.windowNthValue.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue, r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val bySeg = rows.groupBy(_._1)
    bySeg.foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.take(2).forall(_._4.isEmpty), "nth_value(3) undefined before rank 3")
      val third = sorted.find(_._2 == 3L).map(_._3)
      sorted.drop(2).foreach(r => assert(r._4 == third))
      // cents non-increasing down the ranks
      assert(sorted.map(_._3).zip(sorted.map(_._3).tail).forall(p => p._1 >= p._2))
    }
    assert(bySeg.size == 5 && rows.length == 25)
  }
}
