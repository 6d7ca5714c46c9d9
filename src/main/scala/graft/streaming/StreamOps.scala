package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2B B7–B9). Each transform
  * takes an unbounded DataFrame (readStream / MemoryStream) with an
  * event-time column and returns the aggregated stream; the SEMANTICS of
  * every window here are pinned against DuckDB by the batch twins in
  * graft.queries.StreamingBatch — ScalaTest asserts streaming == batch
  * on the same rows.
  *
  * Watermarks bound state: at 100 TB/day the state store only holds
  * windows newer than (max event time − watermark), everything older is
  * finalized and evicted.
  */
object StreamOps {

  /** B7: tumbling 1-hour counts per event_type with a watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** B7: sliding 1-hour/15-min counts with a watermark. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** B8: native session windows, 30-minute gap, per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))

  /** B9: exactly-once re-upload semantics — drop duplicate event_ids
    * arriving within the watermark (the streaming twin of the
    * reference's idempotent import).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
