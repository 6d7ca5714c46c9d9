package graft

import org.apache.spark.sql.functions._
import graft.queries.QualityOps

/** Behavioral checks for the data-quality suite: freshness against a
  * brute-force recompute, PSI against a driver-side reimplementation,
  * and the expectation arms on both the (clean) corpus and a crafted
  * dirty table.
  */
class QualityOpsSpec extends SparkSpec {

  import spark.implicits._

  test("dq_freshness equals a brute-force staleness recompute") {
    val evs = Tables.events(spark, sf())
      .selectExpr("event_type", "unix_micros(ts) AS tsu").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val globalMax = evs.map(_._2).max
    val brute = evs.groupBy(_._1).map { case (et, rows) =>
      val last = rows.map(_._2).max
      et -> (rows.size.toLong, last, (globalMax - last) / 3600000000L)
    }
    val got = QualityOps.dqFreshness.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === brute)
    // the newest series is 0 hours stale by construction
    assert(got.values.exists(_._3 == 0L))
  }

  test("dq_drift_psi equals a driver-side PSI reimplementation") {
    val evs = Tables.events(spark, sf())
      .selectExpr("event_type", "unix_micros(ts) AS tsu", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val t0 = evs.map(_._2).min; val t1 = evs.map(_._2).max
    val v0 = evs.map(_._3).min; val v1 = evs.map(_._3).max
    val mid = (t0 + t1) / 2
    val brute = evs.groupBy(_._1).map { case (et, rows) =>
      val bucketOf = (v: Double) =>
        math.min(9L, math.floor((v - v0) * 10.0 / (v1 - v0)).toLong)
      val old = rows.filter(_._2 < mid); val nw = rows.filter(_._2 >= mid)
      // full 0-9 grid, not observed-only: a bucket empty in both halves
      // still contributes its smoothed term when |old| != |new|
      val buckets = 0L until 10L
      val tOld = old.size; val tNew = nw.size
      val psi = buckets.map { b =>
        val p = (old.count(r => bucketOf(r._3) == b) + 1).toDouble / (tOld + 10)
        val q = (nw.count(r => bucketOf(r._3) == b) + 1).toDouble / (tNew + 10)
        (p - q) * math.log(p / q)
      }.sum
      et -> (BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        tOld.toLong, tNew.toLong)
    }
    val got = QualityOps.dqDriftPsi.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (et, (psi, no, nn)) =>
      val (bpsi, bo, bn) = brute(et)
      assert(no === bo && nn === bn, s"$et counts")
      assert(math.abs(psi - bpsi) < 2e-6, s"$et psi $psi vs $bpsi")
    }
  }

  test("funnel_timebound is a subset of funnel_steps and the windows actually prune") {
    val bounded = graft.queries.LlmOpsAnalytics.funnelTimebound.fn(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val free = graft.queries.LlmOpsAnalytics.funnelSteps.fn(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounded("view") === free("view"), "stage 1 has no window")
    assert(bounded("view>click30m") <= free("view>click"))
    assert(bounded("view>click30m>buy1h") <= free("view>click>purchase"))
    // the funnel must be monotone and the windows must prune SOMETHING
    assert(bounded("view") >= bounded("view>click30m"))
    assert(bounded("view>click30m") >= bounded("view>click30m>buy1h"))
    assert(bounded("view>click30m") < free("view>click"),
      "30-min window pruned nothing — bound not exercised by the corpus")
  }

  test("ts_seasonal_hour: deviations are mean-zero when weighted by counts") {
    val rows = graft.queries.TimeSeriesOps.tsSeasonalHour.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, hs) =>
      assert(hs.map(_._2).distinct.length === hs.length, s"$et duplicate hours")
      // Σ n·dev ≈ 0: the profile's weighted deviations cancel by definition
      val weighted = hs.map(h => h._3 * h._5).sum
      val total = hs.map(_._3).sum
      assert(math.abs(weighted / total) < 1e-4, s"$et weighted dev $weighted")
      // and at least one hour deviates visibly from the series mean
      assert(hs.exists(h => math.abs(h._5) > 1e-6), s"$et flat profile")
    }
  }

  test("dq_expectations: clean corpus passes every rule; a dirty table counts violations") {
    val clean = QualityOps.dqExpectations.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(clean.keySet === Set("doc_id_not_null", "doc_id_unique",
      "n_chars_matches_text", "n_chars_in_bounds", "lang_in_domain"))
    assert(clean.values.forall(_._2 == 0L), s"corpus must be clean: $clean")

    // crafted dirty table: a duplicate key, a lying n_chars, a bogus lang
    val dir = java.nio.file.Files.createTempDirectory("graft_dq_dirty").toString
    Seq(
      (1L, "hello world", "en", "src0", 11L),
      (1L, "hello world", "en", "src0", 11L),  // duplicate doc_id
      (2L, "abc", "de", "src0", 99L),          // n_chars lies
      (3L, "ok", "xx", "src0", 2L))            // lang outside domain
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dirty = QualityOps.dqExpectations.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dirty("doc_id_unique") === ((3L, 1L)), "3 keys, 1 duplicate")
    assert(dirty("n_chars_matches_text")._2 === 1L)
    assert(dirty("lang_in_domain")._2 === 1L)
    assert(dirty("doc_id_not_null")._2 === 0L)
  }
}
