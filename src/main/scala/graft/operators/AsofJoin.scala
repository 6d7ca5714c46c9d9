package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * the same key at or before the left timestamp (ties on time → highest
  * tie-break value). Spark has no native as-of join; this is the
  * union + ordered-window formulation (one shuffle on the key, no range
  * self-join, skew-safe) — the same idiom the oracle-verified
  * `join_asof` query pins against DuckDB and AsofSpec checks against a
  * brute-force reference.
  */
object AsofJoin {

  /** @param left      rows needing a match (e.g. purchases)
    * @param right     rows to match from (e.g. clicks)
    * @param on        shared key column name (e.g. user_id)
    * @param ts        shared event-time column name
    * @param tieBreak  unique ordering column name present on BOTH sides
    * @param valueCol  right-side column to carry (emitted as `asof_<valueCol>`)
    * @return left rows + `asof_<valueCol>` (null when no prior right row)
    */
  def backward(left: DataFrame, right: DataFrame, on: String, ts: String,
               tieBreak: String, valueCol: String): DataFrame = {
    val lTagged = left.select(
      (left.columns.map(col) :+ lit(1).as("_graft_is_left") :+
        lit(null).cast(right.schema(valueCol).dataType).as("_graft_val")).toIndexedSeq: _*)
    val rTagged = right.select(
      col(on), col(ts), col(tieBreak),
      lit(0).as("_graft_is_left"), col(valueCol).as("_graft_val"))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (is_left 0 < 1), so a
    // left row sees same-instant right rows; tieBreak resolves the rest
    val w = Window.partitionBy(col(on))
      .orderBy(col(ts).asc, col("_graft_is_left").asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("_graft_val"), ignoreNulls = true).over(w))
      .filter(col("_graft_is_left") === 1)
      .drop("_graft_is_left", "_graft_val")
  }
}
