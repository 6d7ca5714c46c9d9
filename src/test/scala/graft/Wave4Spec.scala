package graft

import org.apache.spark.sql.functions._
import graft.queries.{MiscOps3, NoOracle4}

/** Pins for the round-8 session-3 fourth wave: bitmap exact-distinct,
  * mask() semantics, lineage cut, and dynamic partition pruning.
  */
class Wave4Spec extends SparkSpec {

  test("agg_bitmap_distinct equals a driver-side exact distinct per priority") {
    val truth = Tables.orders(spark, sf())
      .select(col("o_orderpriority"), col("o_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (p, g) => p -> (g.map(_._2).distinct.length.toLong, g.length.toLong) }
    val rows = MiscOps3.aggBitmapDistinct.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == truth.keySet)
    rows.foreach { r =>
      val (nd, n) = truth(r.getString(0))
      assert(r.getLong(1) == nd, s"${r.getString(0)} distinct")
      assert(r.getLong(2) == n, s"${r.getString(0)} count")
    }
  }

  test("fn_mask masks by character class and honors NULL = keep") {
    val rows = MiscOps3.fnMask.fn(spark, sf()).collect()
    assert(rows.length > 0)
    val names = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val n = names(r.getLong(0))
      def m(u: Option[Char], l: Option[Char], d: Option[Char]): String =
        n.map {
          case c if c.isUpper => u.getOrElse(c)
          case c if c.isLower => l.getOrElse(c)
          case c if c.isDigit => d.getOrElse(c)
          case c              => c
        }.mkString
      assert(r.getString(1) == m(Some('X'), Some('x'), Some('n')))
      assert(r.getString(2) == m(Some('#'), Some('#'), Some('*')))
      assert(r.getString(3) == m(None, None, Some('n')))
    }
  }

  test("b29_checkpoint_cut: lineage collapses and results survive the cut") {
    val row = NoOracle4.checkpointCut.fn(spark, sf()).collect().head
    assert(row.getBoolean(4), "results diverged across localCheckpoint")
    assert(row.getLong(2) * 4 <= row.getLong(1),
      s"cut tree ${row.getLong(2)} not <1/4 of ${row.getLong(1)}")
    assert(row.getLong(3) < row.getLong(1), "post-cut iteration re-inflated")
    assert(row.getBoolean(5))
  }

  test("b30_dynamic_partition_pruning: DPP reads fewer files, same results") {
    val row = NoOracle4.dynamicPartitionPruning.fn(spark, sf()).collect().head
    assert(row.getBoolean(3), "executed plan lacks dynamicpruning")
    assert(row.getLong(1) < row.getLong(2),
      s"DPP read ${row.getLong(1)} files vs ${row.getLong(2)} without — no pruning")
    assert(row.getBoolean(4), "results diverged between DPP on/off")
    assert(row.getBoolean(5))
  }
}
