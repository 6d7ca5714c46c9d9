package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def emptyDim = Seq.empty[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
    .toDF("id", "segment", "valid_from", "valid_to")

  test("scd2: first load opens one generation per key") {
    val b1 = Seq((1L, "GOLD", ts("2024-01-01 00:00:00")),
      (2L, "SILVER", ts("2024-01-01 00:00:00"))).toDF("id", "segment", "eff")
    val dim = Scd2.merge(emptyDim, b1, Seq("id"), Seq("segment"), "eff")
    assert(dim.count() == 2)
    assert(dim.filter(col("valid_to").isNull).count() == 2)
    assert(Scd2.invariantViolations(dim, Seq("id")).isEmpty)
  }

  test("scd2: attribute change closes the old generation and opens a new one") {
    val b1 = Seq((1L, "GOLD", ts("2024-01-01 00:00:00")),
      (2L, "SILVER", ts("2024-01-01 00:00:00"))).toDF("id", "segment", "eff")
    val d1 = Scd2.merge(emptyDim, b1, Seq("id"), Seq("segment"), "eff")
    // id=1 changes, id=2 unchanged, id=3 is new
    val b2 = Seq((1L, "PLATINUM", ts("2024-02-01 00:00:00")),
      (2L, "SILVER", ts("2024-02-01 00:00:00")),
      (3L, "BRONZE", ts("2024-02-01 00:00:00"))).toDF("id", "segment", "eff")
    val d2 = Scd2.merge(d1, b2, Seq("id"), Seq("segment"), "eff")

    assert(d2.count() == 4) // 1 closed + 3 open
    val id1 = d2.filter(col("id") === 1).orderBy(col("valid_from"))
      .collect().map(r => (r.getString(1), r.isNullAt(3)))
    assert(id1.toSeq == Seq(("GOLD", false), ("PLATINUM", true)))
    // unchanged key kept its original generation untouched
    val id2 = d2.filter(col("id") === 2).collect()
    assert(id2.length == 1 && id2.head.isNullAt(3)
      && id2.head.getTimestamp(2) == ts("2024-01-01 00:00:00"))
    assert(Scd2.invariantViolations(d2, Seq("id")).isEmpty)

    // time travel
    assert(Scd2.asOf(d2, "2024-01-15 00:00:00")
      .filter(col("id") === 1).collect().head.getString(1) == "GOLD")
    assert(Scd2.asOf(d2, "2024-02-15 00:00:00")
      .filter(col("id") === 1).collect().head.getString(1) == "PLATINUM")
  }

  test("scd2: three batches build a gap-free interval history") {
    val batches = Seq(
      Seq((1L, "A", ts("2024-01-01 00:00:00"))),
      Seq((1L, "B", ts("2024-02-01 00:00:00"))),
      Seq((1L, "C", ts("2024-03-01 00:00:00"))))
    val dim = batches.foldLeft(emptyDim) { (acc, b) =>
      Scd2.merge(acc, b.toDF("id", "segment", "eff"), Seq("id"), Seq("segment"), "eff")
    }
    val hist = dim.orderBy(col("valid_from")).collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3)).map(_.toString)))
    assert(hist.toSeq == Seq(
      ("A", Some("2024-02-01 00:00:00.0")),
      ("B", Some("2024-03-01 00:00:00.0")),
      ("C", None)))
    assert(Scd2.invariantViolations(dim, Seq("id")).isEmpty)
  }
}
