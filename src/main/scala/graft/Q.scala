package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
