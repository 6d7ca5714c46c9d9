package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables => T}

class IncrementalRollupSpec extends SparkSpec {

  test("incremental update equals full recompute, touching only new days") {
    val path = Files.createTempDirectory("graft_rollup").toString + "/daily"
    val orders = T.orders(spark, sf())
    val split = lit("1998-01-01").cast("date")
    val old = orders.filter(to_date(col("o_orderdate")) <= split)
    val recent = orders.filter(to_date(col("o_orderdate")) > split)
    assert(old.count() > 0 && recent.count() > 0)

    // initial build from history, then one incremental tick with the
    // full fact table (old days must NOT be re-aggregated or doubled)
    IncrementalRollup.update(spark, old, "o_orderdate",
      Seq("o_orderstatus"), Map("o_totalprice" -> "sum"), path)
    val updated = IncrementalRollup.update(spark, orders, "o_orderdate",
      Seq("o_orderstatus"), Map("o_totalprice" -> "sum"), path)

    val full = orders.groupBy(to_date(col("o_orderdate")).as("day"), col("o_orderstatus"))
      .agg(sum(col("o_totalprice")).as("sum_o_totalprice"))
    assert(updated.count() == full.count())
    val diff = updated.select("day", "o_orderstatus", "sum_o_totalprice")
      .except(full.select("day", "o_orderstatus", "sum_o_totalprice"))
    assert(diff.isEmpty, s"incremental != full recompute: ${diff.take(3).toSeq}")

    // idempotent: another tick with no new days changes nothing
    val again = IncrementalRollup.update(spark, orders, "o_orderdate",
      Seq("o_orderstatus"), Map("o_totalprice" -> "sum"), path)
    assert(again.count() == full.count())
  }
}
