package graft

import org.apache.spark.sql.functions._
import graft.queries.NoOracle

/** B5 depth: the bucketed co-located join must (a) actually eliminate
  * the shuffle — no Exchange anywhere in the executed join plan — and
  * (b) return exactly the same aggregate as the direct unbucketed join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed SMJ has no Exchange and matches the unbucketed join") {
    val rows = NoOracle.bucketedJoin.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    // the plan property is part of the row contract
    assert(rows.forall(_.getBoolean(3)), "bucketed join still shuffled")

    val li = Tables.lineitem(spark, sf()).filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sf()).filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(Tables.dec2(col("l_quantity"))).cast("double").as("qty"))
      .orderBy(col("o_orderstatus").asc_nulls_first)
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      === direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }
}
