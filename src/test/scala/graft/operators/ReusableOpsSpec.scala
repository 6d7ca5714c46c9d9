package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables => T}
import graft.queries.{Joins, StreamingBatch}

/** The reusable operator APIs must reproduce the oracle-verified
  * declared queries exactly on the same data.
  */
class ReusableOpsSpec extends SparkSpec {

  test("AsofJoin.backward == the oracle-verified join_asof query") {
    val ev = T.events(spark, sf())
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_id").as("click_id"))
    val viaOperator = AsofJoin.backward(
      purchases, clicks, on = "user_id", ts = "ts",
      tieBreak = "event_id", valueCol = "click_id")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_click_id"))
      .orderBy(col("event_id").asc_nulls_first)
    val viaQuery = Joins.joinAsof.fn(spark, sf())
    assert(viaOperator.collect().toSeq == viaQuery.collect().toSeq)
  }

  test("Sessionize.sessions == the oracle-verified stream_session_batch query") {
    val viaOperator = Sessionize.sessions(
      T.events(spark, sf()), key = "user_id", ts = "ts",
      tieBreak = "event_id", gapMinutes = 30)
      .orderBy(col("user_id").asc_nulls_first, col("session_id").asc_nulls_first)
      .select("user_id", "session_id", "n_events", "session_start", "session_end")
    val viaQuery = StreamingBatch.streamSessionBatch.fn(spark, sf())
    assert(viaOperator.collect().toSeq == viaQuery.collect().toSeq)
  }
}
