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

  /** Few-file explode-straggler guard — THE shared helper for every
    * generator-stage (explode/inline/posexplode) input that is
    * row-inflating and corpus-proportional.
    *
    * The pathology (observed three times before this helper existed —
    * stats_permutation_test r13, Lsh.textProbeTopK r14,
    * text_perplexity_sb r15, each costing a multi-×-wall straggler at
    * scale before its local copy of the guard landed): Spark sizes scan
    * partitions by INPUT BYTES, and a parquet row group belongs to the
    * byte-range split holding its MIDPOINT — so a few-file corpus
    * (single-file test fixtures; small compact dims feeding a ×K
    * generator) produces splits where partition COUNT looks healthy
    * while most splits hold zero row groups. The explode's heavy
    * per-row work then lands on the handful of tasks that own rows:
    * the r15 sf100 perplexity probe jstacked to ONE task carrying the
    * whole doc-bigram explode for ~3350 s of a 4180 s run on 32 idle
    * cores; guarding it bought 3.4×.
    *
    * The guard: when the frame reads fewer files than the session's
    * parallelism, ONE narrow shuffle of the raw pre-explode rows
    * spreads them evenly — trivial next to the inflation it
    * parallelizes. On a many-file production layout (any real 100 TB
    * lake) the condition is false and NO shuffle is added, so the
    * guard never costs anything where the scan already parallelizes.
    * File count — not partition count — is the right predicate because
    * file boundaries are what actually bound row-group spread.
    *
    * Apply AFTER the column pruning projection where practical (the
    * shuffle then moves only the needed columns; Catalyst also pushes
    * later Projects below the Repartition, so either order prunes).
    * Results are partitioning-independent for every call site (all are
    * aggregations/joins over the exploded rows), pinned by the oracle
    * re-pass on the four evidence-bar corpora each time a site cuts
    * over.
    */
  def spreadExplodeInput(s: SparkSession, df: DataFrame): DataFrame = {
    val para = s.sparkContext.defaultParallelism
    if (df.inputFiles.length < para) df.repartition(para) else df
  }
}
