package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the warehouse-ETL
  * pattern for keeping full attribute history: when an incoming batch
  * changes a key's attributes, the open row is closed (valid_to set)
  * and a new open row is appended; unchanged keys are untouched.
  *
  * Pure plan-side implementation: one join on the dimension key plus a
  * window per key — no driver-side state, so the merge scales with the
  * dimension, and the dimension is usually the SMALL side at 100 TB
  * (facts reference it; history grows additively).
  */
object Scd2 {

  /** Merge one batch into an SCD2 dimension.
    *
    * @param existing current dimension: keys ++ attrs ++ (valid_from,
    *                 valid_to) where an open row has valid_to IS NULL;
    *                 empty schema-compatible frame for a first load
    * @param incoming one row per key: keys ++ attrs ++ effTs column
    * @param keys     business key columns
    * @param attrs    tracked attribute columns
    * @param effTs    the incoming batch's effective-timestamp column
    * @return the merged dimension (history preserved)
    */
  def merge(existing: DataFrame, incoming: DataFrame,
            keys: Seq[String], attrs: Seq[String], effTs: String): DataFrame = {
    val keyCols = keys.map(col)
    val open = existing.filter(col("valid_to").isNull)
    val closed = existing.filter(col("valid_to").isNotNull)

    val inc = incoming.select(
      (keys.map(col) ++ attrs.map(c => col(c).as(s"new_$c")) :+ col(effTs).as("eff_ts")): _*)

    // join incoming against the OPEN generation only
    val joined = open.as("o").join(inc.as("i"), keys, "full_outer")
    val changed = attrs.map(c => !(col(c) <=> col(s"new_$c"))).reduce(_ || _)

    val isNewKey = col("valid_from").isNull   // no open row existed
    val hasIncoming = col("eff_ts").isNotNull

    // open rows, rewritten: close when attributes changed
    val keptOpen = joined.filter(!isNewKey).select(
      (keyCols ++ attrs.map(col) :+ col("valid_from") :+
        when(hasIncoming && changed, col("eff_ts")).as("valid_to")): _*)
    // new generations: changed keys and brand-new keys
    val newGen = joined.filter(hasIncoming && (isNewKey || changed)).select(
      (keyCols ++ attrs.map(c => col(s"new_$c").as(c)) :+
        col("eff_ts").as("valid_from") :+ lit(null).cast("timestamp").as("valid_to")): _*)

    closed.unionByName(keptOpen).unionByName(newGen)
  }

  /** The dimension as of `ts`: the generation whose validity interval
    * covers it (at most one per key by construction).
    */
  def asOf(dim: DataFrame, ts: String): DataFrame =
    dim.filter(col("valid_from") <= lit(ts) &&
      (col("valid_to").isNull || col("valid_to") > lit(ts)))

  /** Structural invariant check: per key, intervals are non-overlapping,
    * gap-free, and exactly one row is open. Returns violating keys.
    */
  def invariantViolations(dim: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("valid_from").asc)
    dim
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_open"),
        sum(when(col("next_from").isNotNull && !(col("valid_to") <=> col("next_from")), 1)
          .otherwise(0)).as("n_gaps"))
      .filter(col("n_open") =!= 1 || col("n_gaps") > 0)
  }
}
