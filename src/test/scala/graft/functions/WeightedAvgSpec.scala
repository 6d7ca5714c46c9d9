package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedAvgSpec extends SparkSpec {

  test("weighted avg equals hand-computed value") {
    import spark.implicits._
    val df = Seq((2.0, 10.0, "a"), (3.0, 20.0, "a"), (5.0, 100.0, "b"))
      .toDF("w", "p", "g")
    val wavg = udaf(WeightedAvg, implicitly[org.apache.spark.sql.Encoder[WInput]])
    val r = df.groupBy(col("g")).agg(wavg(col("w"), col("p")).as("wa"))
      .orderBy("g").collect()
    assert(math.abs(r(0).getDouble(1) - 16.0) < 1e-12) // (20+60)/5
    assert(r(1).getDouble(1) == 100.0)
  }

  test("empty and zero-weight input yields NaN, not a crash") {
    import spark.implicits._
    val df = Seq((0.0, 10.0)).toDF("w", "p")
    val wavg = udaf(WeightedAvg, implicitly[org.apache.spark.sql.Encoder[WInput]])
    val r = df.agg(wavg(col("w"), col("p"))).collect().head.getDouble(0)
    assert(r.isNaN)
  }

  test("decimal accumulation is exact over many small rows") {
    import spark.implicits._
    // 10k rows of 0.1-ish values would drift in double accumulation;
    // the decimal buffer must not.
    val df = (1 to 10000).map(_ => (1.0, 0.1)).toDF("w", "p")
    val wavg = udaf(WeightedAvg, implicitly[org.apache.spark.sql.Encoder[WInput]])
    val r = df.agg(wavg(col("w"), col("p"))).collect().head.getDouble(0)
    assert(r == 0.1)
  }
}
