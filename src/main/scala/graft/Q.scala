package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

/** One declared query: a SparkEntry.queries entry plus its DuckDB oracle
  * (None for non-SQL-expressible operators — SURVEY.md §2B).
  * Keeping the Spark twin and the oracle SQL adjacent is the main defense
  * against dialect drift (SURVEY.md §7.2 #2).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def this(name: String, fn: (SparkSession, String) => DataFrame, oracle: String) =
    this(name, fn, Some(oracle))
}

object Q {

  /** Driver-stable result types (VERDICT r1): the driver's hasher is
    * representation-sensitive (pandas Decimal-object vs float64), so a
    * value-identical DECIMAL result still hash-mismatches the oracle.
    * Internal math stays decimal-exact (D2); only the FINAL projection is
    * cast, and one final decimal→double cast is correctly rounded and
    * bit-identical cross-engine. Every oracle SQL mirrors this with an
    * explicit CAST(... AS DOUBLE) on its decimal outputs.
    */
  private def stabilize(df: DataFrame): DataFrame = {
    val needsCast = df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])
    if (!needsCast) df
    else {
      val cols: Array[Column] = df.schema.fields.map { f =>
        f.dataType match {
          case _: DecimalType => col(f.name).cast("double").as(f.name)
          case _              => col(f.name)
        }
      }
      df.select(cols.toIndexedSeq: _*)
    }
  }

  private def wrap(fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => stabilize(fn(s, d))

  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, wrap(fn), Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, wrap(fn), None)
}
