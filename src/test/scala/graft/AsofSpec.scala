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

  test("join_asof_tolerance == join_asof where fresh, NULL where stale (corpus)") {
    // brute-force the tolerance semantics on the real sf0.001 corpus
    val evs = Tables.events(spark, sf())
      .filter(col("event_type").isin("click", "purchase"))
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS tsu", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = evs.filter(_._4 == "purchase").map { p =>
      val best = evs.filter(c =>
          c._4 == "click" && c._2 == p._2 && c._3 <= p._3)
        .sortBy(c => (c._3, c._1)).lastOption
      p._1 -> best.collect { case c if p._3 - c._3 <= 3600000000L => c._1 }
    }.toMap
    val got = graft.queries.Joins.joinAsofTolerance.fn(spark, sf())
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got == brute)
    // and at least one purchase is distinguished from plain join_asof
    // (a stale click nulled out) — otherwise the tolerance is untested
    val plain = graft.queries.Joins.joinAsof.fn(spark, sf())
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(plain.exists { case (id, c) => c.isDefined && got(id).isEmpty },
      "no stale click was nulled — tolerance arm not exercised by the corpus")
  }

  test("scd2_asof_lookup states equal the last event at-or-before each probe") {
    val evs = Tables.events(spark, sf())
      .filter(col("user_id") < 10)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val mn = evs.map(_._2).min
    val mx = evs.map(_._2).max
    val users = evs.map(_._1).distinct
    val brute = (for {
      u <- users
      k <- 1 to 3
    } yield {
      val probe = mn + k.toLong * (mx - mn) / 4
      // state = event_type of the LAST event at or before the probe;
      // ties on ts resolved by event_id (the window's total order)
      val st = evs.filter(e => e._1 == u && e._2 <= probe)
        .sortBy(e => (e._2, e._3)).lastOption.map(_._4)
      (u, k) -> st
    }).toMap
    val got = graft.queries.TimeSeriesOps.scd2AsofLookup.fn(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getString(3))))
      .toMap
    assert(got == brute)
  }
}
