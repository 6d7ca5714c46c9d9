package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Content-checksum audit semantics: order-independence, corruption
  * sensitivity, and the declared b1_load_audit row's verified flag.
  */
class LoadAuditSpec extends SparkSpec {

  import spark.implicits._

  private def frame() =
    Seq((1L, "cpu", 0.5), (2L, "mem", 0.7), (3L, "disk", 0.9))
      .toDF("id", "metric", "m_value")

  test("checksum is order- and partitioning-independent") {
    val a = LoadAudit.audit(frame())
    val b = LoadAudit.audit(frame().repartition(7).sortWithinPartitions("m_value"))
    assert(a === b)
  }

  test("checksum detects a dropped row, a mutated cell, and a re-type") {
    val base = LoadAudit.audit(frame())
    assert(LoadAudit.audit(frame().filter($"id" =!= 2L)) !== base)
    val mutated = frame()
      .withColumn("m_value", when($"id" === 1L, 0.50001).otherwise($"m_value"))
    assert(LoadAudit.audit(mutated) !== base)
    val retyped = frame().withColumn("id", $"id".cast("string"))
    assert(LoadAudit.audit(retyped).checksum !== base.checksum,
      "silent re-type must change the content checksum")
  }

  test("duplicate-pair XOR blind spot is covered by the row count") {
    val onePair = frame().filter($"id" === 1L)
    val padded = frame().unionAll(onePair).unionAll(onePair)
    val a = LoadAudit.audit(frame())
    val b = LoadAudit.audit(padded)
    assert(a.checksum === b.checksum,
      "an even number of extra duplicates cancels in XOR (by design)")
    assert(a !== b, "the (n, checksum) PAIR still differs")
    assert(!LoadAudit.verified(frame(), padded))
  }

  test("b1_load_audit row verifies the parquet round trip") {
    val rows = graft.queries.NoOracle.loadAudit.fn(spark, sf()).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getBoolean(3)), "round trip must verify")
    // both stages report the same (n, checksum)
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length === 1)
    assert(rows.head.getLong(1) === 8L, "8 valid fixture rows")
  }
}
