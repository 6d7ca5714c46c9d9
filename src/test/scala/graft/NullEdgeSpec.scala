package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver data has NO nulls (FIXTURES.md), so null-path behavior of
  * the core operators is pinned here on synthetic frames.
  */
class NullEdgeSpec extends SparkSpec {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(java.util.List.of(
      Row(1, 10.0), Row(1, null), Row(null, 30.0), Row(2, null), Row(null, null)),
      schema)
  }

  test("aggregates skip nulls; count(*) does not") {
    val r = df.agg(count(lit(1)), count(col("v")), sum(col("v")), avg(col("v")))
      .collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 40.0 && r.getDouble(3) == 20.0)
  }

  test("equi-join never matches null keys; null-safe <=> does") {
    val other = df.select(col("k").as("k2")).distinct()
    val equi = df.join(other, col("k") === col("k2")).count()
    assert(equi == 3) // only k ∈ {1,1,2}
    val nullSafe = df.join(other, col("k") <=> col("k2")).count()
    assert(nullSafe == 5) // null keys match each other
  }

  test("groupBy treats null as a real group") {
    val groups = df.groupBy(col("k")).count().collect()
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1)).toMap
    assert(groups == Map(1 -> 2L, 2 -> 1L, -1 -> 2L))
  }

  test("asc_nulls_first / desc_nulls_last order as declared (D3)") {
    val ascFirst = df.select(col("v")).orderBy(col("v").asc_nulls_first)
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(ascFirst.take(3).forall(_ == null))
    val descLast = df.select(col("v")).orderBy(col("v").desc_nulls_last)
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(descLast.takeRight(3).forall(_ == null))
  }

  test("set ops use null-equal semantics (unlike joins)") {
    import spark.implicits._
    val a = Seq[Option[Int]](Some(1), None).toDF("x")
    val b = Seq[Option[Int]](None, Some(2)).toDF("x")
    val inter = a.intersect(b).collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(inter.toSeq == Seq(-1)) // NULL ∈ both → kept
    assert(a.except(b).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("anti join emits the unmatched rows (driver data gives 0 — non-empty path here)") {
    val other = df.filter(col("k") === 1).select(col("k").as("k2"))
    val anti = df.join(other, col("k") === col("k2"), "left_anti")
    // k=2 row plus both null-key rows survive (nulls never match)
    assert(anti.count() == 3)
    assert(anti.filter(col("k") === 2).count() == 1)
  }

  test("window functions: lag yields null at partition head; ignoreNulls last() skips") {
    val w = Window.partitionBy(col("k")).orderBy(col("v").asc_nulls_first)
    val r = df.filter(col("k") === 1)
      .select(col("v"), lag(col("v"), 1).over(w).as("prev"),
        last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("lastv"))
      .orderBy(col("v").asc_nulls_first)
      .collect()
    assert(r(0).isNullAt(1)) // first row has no lag
    assert(r(1).getDouble(2) == 10.0) // ignoreNulls carries the value over the null row
  }

  test("decimal sum over all-null and empty groups returns null, not 0") {
    val r = df.filter(col("k") === 2)
      .agg(sum(Tables.dec2(col("v")))).collect().head
    assert(r.isNullAt(0))
  }
}
