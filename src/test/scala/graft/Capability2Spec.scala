package graft

import graft.queries.NoOracle2

/** Invariant pins for the round-9 capability rows: sketch error
  * bounds, AQE skew-split plan evidence, and exact incremental-state
  * parity — the "verification instead of oracle" column of SURVEY §2B.
  */
class Capability2Spec extends SparkSpec {

  test("b10_kll_quantiles: merged per-partition sketches hit every rank inside 3x bound") {
    val rows = NoOracle2.kllQuantiles.fn(spark, sf()).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(5)), "a quantile estimate fell outside 3x rank error")
    // estimates are ACTUAL retained values: each has nonzero support
    rows.foreach { r =>
      assert(r.getLong(3) > 0L, "estimate must be a real cents value")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 0.2)
    }
    // quantile estimates are monotone in q
    val ests = rows.sortBy(_.getDouble(0)).map(_.getLong(3))
    assert(ests.zip(ests.tail).forall(p => p._1 <= p._2))
  }

  test("b10_theta_setops: set-algebra estimates within 5% of exact distinct joins") {
    val rows = NoOracle2.thetaSetops.fn(spark, sf()).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getBoolean(4)), "a theta estimate fell outside 5%")
    val m = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("intersect") > 0L, "fixture years must overlap")
    assert(m("union") >= m("a_not_b") + m("intersect"),
      "union contains A = a_not_b + intersect")
  }

  test("b21_aqe_skew: hot partition split by OptimizeSkewedJoin, counts preserved") {
    val row = NoOracle2.aqeSkew.fn(spark, sf()).collect().head
    assert(row.getLong(0) == row.getLong(1), "join must preserve every fact row")
    assert(row.getLong(3) >= 1L, "expected a sort-merge join")
    assert(row.getBoolean(4), "OptimizeSkewedJoin did not mark the hot join")
    assert(row.getBoolean(5))
  }

  test("b22_incremental_rollup: merged batch states equal the full recompute exactly") {
    val row = NoOracle2.incrementalRollup.fn(spark, sf()).collect().head
    assert(row.getLong(0) > 0L)
    assert(row.getLong(1) == 0L, s"${row.getLong(1)} keys mismatched after state merge")
    assert(row.getBoolean(2))
  }
}
