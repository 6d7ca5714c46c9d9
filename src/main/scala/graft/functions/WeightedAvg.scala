package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input pair for the weighted average: weight (quantity) and value
  * (price), both raw doubles from the source table.
  */
case class WInput(w: Double, p: Double)

/** Exact-decimal weighted mean: Σ(w·p)/Σ(w), sums carried as exact
  * BigDecimals (scale-2, mirroring a CAST(x AS DECIMAL(18,2)) — Spark's
  * double→decimal cast goes through the shortest string representation,
  * i.e. BigDecimal.valueOf), final division done in double so the oracle
  * can mirror it with CAST(... AS DOUBLE)/CAST(... AS DOUBLE).
  *
  * Proves the Aggregator[IN, BUF, OUT] UDAF surface (SURVEY.md §2B note).
  */
object WeightedAvg extends Aggregator[WInput, (JBigDecimal, JBigDecimal), Double] {

  private def dec2(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: (JBigDecimal, JBigDecimal), in: WInput): (JBigDecimal, JBigDecimal) =
    (b._1.add(dec2(in.w).multiply(dec2(in.p))), b._2.add(dec2(in.w)))

  override def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (x._1.add(y._1), x._2.add(y._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): Double =
    if (b._2.signum() == 0) Double.NaN
    else b._1.doubleValue() / b._2.doubleValue()

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
