package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** JDBC (Greenplum/Postgres wire) sink — SURVEY.md §2B B3/B4.
  *
  * The environment is offline (no database), so everything decidable is
  * factored pure and unit-tested: DDL generation, write options,
  * stage-and-swap statement sequence. The actual `df.write.jdbc` call is
  * a thin tail.
  *
  * Append class  → partition-parallel batched INSERTs (B3).
  * Full-refresh  → write to `<table>__stage`, swap in one transaction
  *                 (B4) — the reference's stage-and-swap semantics.
  */
object JdbcSink {

  final case class Config(
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      batchSize: Int = 10000,
      numPartitions: Int = 8,
      // Greenplum/Postgres in production; overridable so the WRITE/READ
      // path itself is exercised live against embedded Derby in
      // JdbcLiveSpec (the only JDBC engine available offline)
      driver: String = "org.postgresql.Driver")

  /** Spark JDBC writer options for the append path. `numPartitions`
    * bounds the connection count per write — at 1000 executors an
    * unbounded write is a connection storm on the DB master.
    */
  def writeOptions(c: Config): Map[String, String] = Map(
    "url" -> c.url,
    "dbtable" -> c.table,
    "user" -> c.user,
    "password" -> c.password,
    "batchsize" -> c.batchSize.toString,
    "numPartitions" -> c.numPartitions.toString,
    "isolationLevel" -> "READ_COMMITTED",
    "driver" -> c.driver)

  /** Greenplum/Postgres column type for a Spark type (inverse of
    * Manifest.sparkType).
    */
  def pgType(dt: DataType): String = dt match {
    case StringType        => "text"
    case IntegerType       => "integer"
    case LongType          => "bigint"
    case DoubleType        => "double precision"
    case FloatType         => "real"
    case d: DecimalType    => s"numeric(${d.precision},${d.scale})"
    case BooleanType       => "boolean"
    case TimestampType     => "timestamp without time zone"
    case DateType          => "date"
    case _                 => "text"
  }

  def createTableDdl(table: String, schema: StructType): String =
    schema.fields
      .map(f => s""""${f.name}" ${pgType(f.dataType)}""")
      .mkString(s"""CREATE TABLE IF NOT EXISTS "$table" (""", ", ", ")")

  /** Add-only evolution DDL: one ALTER per column the live table lacks
    * (SURVEY §1.1 — columns are never dropped or retyped).
    */
  def alterAddColumnsDdl(table: String, live: StructType, incoming: StructType): Seq[String] = {
    val have = live.fieldNames.map(_.toLowerCase).toSet
    incoming.fields
      .filterNot(f => have.contains(f.name.toLowerCase))
      .map(f => s"""ALTER TABLE "$table" ADD COLUMN "${f.name}" ${pgType(f.dataType)}""")
      .toSeq
  }

  def stageTable(table: String): String = s"${table}__stage"

  /** The full-refresh swap, one transaction: stage is assumed loaded. */
  def stageSwapDdl(table: String, schema: StructType): Seq[String] = Seq(
    "BEGIN",
    createTableDdl(table, schema), // first load: target must exist to be dropped
    s"""DROP TABLE "$table"""",
    s"""ALTER TABLE "${stageTable(table)}" RENAME TO "$table"""",
    "COMMIT")

  /** B3 append path: batched, partition-parallel INSERTs. */
  def appendInto(df: DataFrame, c: Config): Unit =
    df.write.format("jdbc").options(writeOptions(c)).mode(SaveMode.Append).save()

  /** B4 full-refresh path: load the stage table (overwrite), then the
    * caller executes `stageSwapDdl` over a driver-side connection.
    */
  def loadStage(df: DataFrame, c: Config): Seq[String] = {
    df.write.format("jdbc")
      .options(writeOptions(c) + ("dbtable" -> stageTable(c.table)))
      .mode(SaveMode.Overwrite).save()
    stageSwapDdl(c.table, df.schema)
  }
}
