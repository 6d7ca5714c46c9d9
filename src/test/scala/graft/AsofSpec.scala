package graft

import org.apache.spark.sql.functions._
import scala.util.Random

case class AsofE(event_id: Long, user_id: Long, tsUs: Long, isPurchase: Boolean)

/** SURVEY.md §7.2 #4: the as-of join window idiom is the most likely
  * semantics bug — check it against a brute-force O(n²) reference on
  * random event streams (fixed seed).
  */
class AsofSpec extends SparkSpec {

  private def brute(events: Seq[AsofE]): Map[Long, Option[Long]] =
    events.filter(_.isPurchase).map { p =>
      val clicks = events.filter(c =>
        !c.isPurchase && c.user_id == p.user_id && c.tsUs <= p.tsUs)
      // latest prior click; ties on ts → max event_id
      p.event_id -> clicks
        .sortBy(c => (c.tsUs, c.event_id))
        .lastOption.map(_.event_id)
    }.toMap

  test("window as-of idiom == brute force on 300 random events, incl. ts ties") {
    import spark.implicits._
    val rnd = new Random(42)
    val events = (1L to 300L).map { id =>
      AsofE(id, rnd.nextInt(5).toLong,
        // coarse grid → plenty of exact-ts ties
        rnd.nextInt(40).toLong * 1000000L,
        rnd.nextBoolean())
    }
    val df = events.toDF()
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("tsUs")).as("ts"),
        when(col("isPurchase"), lit("purchase")).otherwise(lit("click"))
          .as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))

    // same idiom as the declared join_asof query, applied to this frame
    val ce = df.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_purchase"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_purchase"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val got = ce.withColumn("asof", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("is_purchase") === 1)
      .select(col("event_id"), col("asof"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    assert(got == brute(events))
  }
}
