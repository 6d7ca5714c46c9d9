package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Shared table loaders + determinism helpers (SURVEY.md §2 D-rules).
  *
  * All oracle-checked queries read parquet through these helpers so that
  * the D2 (decimal money math) and D5 (nanosecond timestamp) disciplines
  * are applied in exactly one place.
  */
object Tables {

  /** Load a testdata table: `$sfDir/<name>.parquet`. */
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = {
    // every vector query loads through here — register the native
    // codegen kernels so VectorOps resolves to them, not the UDF tier
    graft.functions.VecExpressions.register(s)
    graft.functions.VectorOps.nativeRegistered = true
    tbl(s, d, "embeddings")
  }

  /** events.parquet's `ts` column has shipped in three physical forms
    * across fixture generations; normalize ALL of them to a microsecond
    * TimestampType column so every consumer sees one type (FIXTURES.md,
    * SURVEY §2 D5):
    *  - parquet TIMESTAMP(NANOS): Spark 4.x refuses it by default
    *    (PARQUET_TYPE_ILLEGAL); the legacy conf (runtime-settable) reads
    *    it as Long nanos, converted below.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ default on),
    *    on which unix_micros() and window() fail with DATATYPE_MISMATCH.
    *    Session tz is UTC on both engines, so casting NTZ → TimestampType
    *    preserves the instant exactly (ADVICE r7 high finding).
    *  - TIMESTAMP(MICROS, adjusted): already TimestampType — pass through
    *    (graft.ScaleUp synthesized dirs).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = tbl(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = integer division on longs; `/` would round-trip through
        // double and lose sub-µs bits (epoch-nanos ≈ 1.7e18 > 2^53).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** D2: money doubles → DECIMAL(18,2) before any arithmetic/aggregation. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")
  /** D2: rates (discount/tax) → DECIMAL(18,4). */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")
}
