package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gaps-and-islands. A gap of >= `gapMinutes`
  * between consecutive events of the same key starts a new session,
  * matching Structured Streaming's session_window semantics (window
  * covers [start, last_event + gap)) so batch and streaming agree —
  * the same formulation the oracle-verified `stream_session_batch`
  * query pins against DuckDB.
  */
object Sessionize {

  /** Append `session_id` (1-based per key, in time order). */
  def withSessionIds(events: DataFrame, key: String, ts: String,
                     tieBreak: String, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tieBreak).asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_graft_new",
        when(unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w) >= gapUs
          || lag(col(ts), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum(col("_graft_new")).over(wRun))
      .drop("_graft_new")
  }

  /** One row per session: bounds + event count. */
  def sessions(events: DataFrame, key: String, ts: String,
               tieBreak: String, gapMinutes: Int): DataFrame =
    withSessionIds(events, key, ts, tieBreak, gapMinutes)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"))
}
