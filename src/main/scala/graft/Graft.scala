package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing convenience surface: register the test-corpus tables as
  * temp views (plus the native vector functions) so arbitrary
  * `spark.sql` queries run against them — the SQL entry point of the
  * engine (SURVEY.md §3.3).
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every table under its plain name; returns the views. */
  def registerTables(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    functions.VecExpressions.register(spark)
    tableNames.map { t =>
      val df = t match {
        case "events"     => Tables.events(spark, sfDir)
        case "embeddings" => Tables.embeddings(spark, sfDir)
        case other        => Tables.tbl(spark, sfDir, other)
      }
      df.createOrReplaceTempView(t)
      t -> df
    }.toMap
  }

  /** SQL entry point over the registered corpus. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(query)
  }
}
