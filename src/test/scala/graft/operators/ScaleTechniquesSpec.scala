package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables => T}
import graft.ingest.ParquetSink

/** The 100 TB techniques that small-scale correctness can't gate:
  * partition pruning on the lake layout, bucketed co-located joins,
  * and salted skew joins — each asserted on observable plan/IO
  * behavior, not just results.
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("partitioned lake sink: time filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_lake").toString
    val orders = T.orders(spark, sf())
    ParquetSink.writePartitioned(orders, "o_orderdate", s"$dir/orders")
    val lake = ParquetSink.readLake(spark, s"$dir/orders")
    // all rows survive the round trip
    assert(lake.count() == orders.count())
    val pruned = lake.filter(col("part_year") === 1996)
    // inputFiles ignores pruning; assert on the physical scan's
    // partition filters instead
    val plan = pruned.queryExecution.sparkPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("part_year"),
      s"scan must carry a part_year partition filter:\n$plan")
    assert(pruned.count() ==
      orders.filter(year(col("o_orderdate")) === 1996).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = T.orders(spark, sf())
    val c = T.customer(spark, sf())
    o.write.mode(SaveMode.Overwrite).bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("graft_orders_bkt")
    c.write.mode(SaveMode.Overwrite).bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("graft_customer_bkt")
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_bkt")
        .join(spark.table("graft_customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bkt")
    }
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key — the classic straggler shape
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "v", "name")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "rk", numSalts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the salt must actually spread the hot key across reducers
    val spread = left.withColumn("_s",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === 42L).select("_s").distinct().count()
    assert(spread > 1, "hot key must map to multiple salts")
  }
}
