package graft

import org.apache.spark.sql.functions._

/** B10 (sketches), B11 (sampling), B12 (UDF surface) — built-ins that
  * have no cross-engine oracle; bounded-error and determinism checks
  * instead.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on sf0.01") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("hll sketch agg + union estimate distinct users across two slices") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val a = ev.filter(col("event_type") === "click")
      .agg(hll_sketch_agg(col("user_id")).as("s"))
    val b = ev.filter(col("event_type") === "view")
      .agg(hll_sketch_agg(col("user_id")).as("s"))
    val est = a.union(b).agg(hll_sketch_estimate(hll_union_agg(col("s"))).as("d"))
      .collect().head.getLong(0)
    val exact = ev.filter(col("event_type").isin("click", "view"))
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val approx = li.agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .collect().head.getDouble(0)
    val bounds = li.agg(
      expr("percentile(l_quantity, 0.45)"), expr("percentile(l_quantity, 0.55)"))
      .collect().head
    assert(approx >= bounds.getDouble(0) && approx <= bounds.getDouble(1))
  }

  test("count-min estimates are upper bounds within eps*N of true counts") {
    import org.apache.spark.sql.Row
    val d = sf("sf0.01")
    val est = SparkEntry.queries("b10_count_min")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val truth = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_partkey") === 1, 1).otherwise(0)).as("c1"),
        sum(when(col("l_partkey") === 2, 1).otherwise(0)).as("c2"),
        sum(when(col("l_partkey") === 3, 1).otherwise(0)).as("c3"),
        count(lit(1)).as("n"))
      .collect().map { case Row(f: String, c1: Long, c2: Long, c3: Long, n: Long) =>
        f -> (c1, c2, c3, n)
      }.toMap
    truth.foreach { case (f, (c1, c2, c3, n)) =>
      val (e1, e2, e3) = est(f)
      val slack = math.ceil(0.001 * n).toLong // eps * N
      assert(e1 >= c1 && e1 <= c1 + slack, s"$f key1: est=$e1 true=$c1 slack=$slack")
      assert(e2 >= c2 && e2 <= c2 + slack, s"$f key2: est=$e2 true=$c2")
      assert(e3 >= c3 && e3 <= c3 + slack, s"$f key3: est=$e3 true=$c3")
    }
  }

  test("seeded sample is deterministic and near the target fraction") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val n1 = li.sample(withReplacement = false, fraction = 0.1, seed = 42L).count()
    val n2 = li.sample(withReplacement = false, fraction = 0.1, seed = 42L).count()
    assert(n1 == n2)
    assert(math.abs(n1 - 6000.0) / 6000.0 < 0.1, s"sampled $n1 of ~6000")
  }

  test("registered Scala UDF is callable from SQL") {
    spark.udf.register("graft_norm_flag",
      (s: String) => if (s == null) "?" else s.toLowerCase)
    Tables.lineitem(spark, sf()).createOrReplaceTempView("li_udf")
    val flags = spark.sql(
      "SELECT DISTINCT graft_norm_flag(l_returnflag) AS f FROM li_udf ORDER BY f")
      .collect().map(_.getString(0)).toSeq
    assert(flags == Seq("a", "n", "r"))
  }
}
