package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The round-6c lake capability rows (B13-B17) each carry an in-row
  * invariant flag; Verify surfaces them to the driver, this spec pins
  * them in `sbt test` so a regression fails fast and locally.
  */
class LakeCapabilitySpec extends SparkSpec {

  private def rows(name: String) =
    graft.queries.NoOracle.all.find(_.name == name).get.fn(spark, sf()).collect()

  test("b14_orc_roundtrip: audit pair survives the ORC round trip") {
    val r = rows("b14_orc_roundtrip")
    assert(r.length == 2 && r.forall(_.getBoolean(3)), r.mkString("; "))
  }

  test("b15_codec_parity: every codec reads back audit-identical") {
    val r = rows("b15_codec_parity")
    assert(r.length == 4 && r.forall(_.getBoolean(3)), r.mkString("; "))
    // and the codecs actually differ in size (the lever is real)
    assert(r.map(_.getLong(2)).distinct.length > 1, "all codecs produced equal bytes")
  }

  test("b16_corrupt_scan: strict fails loudly, lenient yields the valid rows") {
    val r = rows("b16_corrupt_scan")
    assert(r.length == 2 && r.forall(_.getBoolean(3)), r.mkString("; "))
  }

  test("b17_partition_overwrite: exactly the reloaded partition changes") {
    val r = rows("b17_partition_overwrite")
    assert(r.nonEmpty && r.forall(_.getBoolean(4)), r.mkString("; "))
    assert(r.count(_.getBoolean(3)) == 1, "exactly one partition must change")
  }
}
