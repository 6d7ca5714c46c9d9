package graft.operators

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables => T}

/** Pipeline observability: `observe()` attaches metric aggregates to a
  * running query so an ingest/ETL job reports row counts and money
  * totals from the SAME pass that loads the data — no second scan.
  * (The reference imports monitoring data; its loads would emit exactly
  * these counters.)
  */
class ObservabilitySpec extends SparkSpec {

  test("observe() reports load metrics from the load pass itself") {
    val obs = Observation("load_metrics")
    val orders = T.orders(spark, sf())
    val observed = orders.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col("o_totalprice") <= 0, 1)).as("n_nonpositive"),
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    // the "load": a single action over the observed frame
    val loaded = observed.filter(col("o_orderkey").isNotNull).count()

    val m = obs.get
    assert(m("n_rows").asInstanceOf[Long] == orders.count())
    assert(loaded == m("n_rows").asInstanceOf[Long])
    assert(m("n_nonpositive").asInstanceOf[Long] == 0L)
    val expected = orders.agg(sum(col("o_totalprice").cast("decimal(18,2)"))
      .cast("double")).collect().head.getDouble(0)
    assert(m("revenue").asInstanceOf[Double] == expected)
  }
}
