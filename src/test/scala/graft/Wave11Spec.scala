package graft

import org.apache.spark.sql.functions._
import graft.queries.{NoOracle5, SurfaceOps4}

/** Pins for the round-8 session-3 eleventh wave: URL component
  * extraction against java.net ground truth, from_json corrupt
  * accounting, and the parquet bloom-filter scan differential.
  */
class Wave11Spec extends SparkSpec {

  test("fn_url_parse components agree with java.net.URI") {
    val rows = SurfaceOps4.fnUrlParse.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val segs = Tables.customer(spark, sf())
      .select(lower(col("c_mktsegment"))).distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      val host = r.getString(0)
      val uri = new java.net.URI(s"https://$host${r.getString(4)}")
      assert(uri.getHost == host)
      assert(segs.contains(host.split("\\.")(0)), s"host $host")
      assert(r.getString(4).startsWith("/order/"))
      // url_decode really decoded the %20 in '4-NOT SPECIFIED'
      assert(!r.getString(1).contains("%20"))
    }
    assert(rows.exists(_.getString(1) == "4-NOT SPECIFIED"))
  }

  test("fn_from_json_schema corrupt counts equal the injected slice exactly") {
    val byType = Tables.events(spark, sf())
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    val rows = SurfaceOps4.fnFromJsonSchema.fn(spark, sf()).collect()
    rows.foreach { r =>
      val g = byType(r.getString(0))
      val corrupt = g.count(_._2 % 97 == 0).toLong
      assert(r.getLong(2) == corrupt, s"${r.getString(0)} corrupt")
      assert(r.getLong(1) == g.length.toLong - corrupt)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "no corrupt rows injected at this SF")
  }

  test("b34_parquet_bloom: bloom halves decoded rows on shuffled data, same results") {
    val row = NoOracle5.parquetBloom.fn(spark, sf()).collect().head
    assert(row.getBoolean(4), "results diverged between layouts")
    assert(row.getLong(2) * 2 <= row.getLong(3),
      s"bloom read ${row.getLong(2)} vs plain ${row.getLong(3)} — no skipping")
    assert(row.getBoolean(5))
  }
}
