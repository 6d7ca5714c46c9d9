package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.queries.Stats3

/** Ground-truth pins for the round-8b distribution/graph wave: each
  * oracle operator is recomputed independently in driver-side Scala
  * (maps, loops, BigInt — no Spark) over collected base rows and
  * compared exactly after the same 6-dp pin the queries apply; the two
  * capability rows are asserted on their invariant flags.
  */
class Stats3Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  private lazy val segCents: Seq[(String, Long)] = {
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey")).collect()
      .map { r =>
        val cents = JBD.valueOf(r.getDouble(1))
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
        cust(r.getLong(0)) -> cents
      }.toSeq
  }

  test("stats_ks matches a driver-side exact-ECDF recompute") {
    val x0 = segCents.filter(_._1 == "BUILDING").map(_._2)
    val x1 = segCents.filter(_._1 == "MACHINERY").map(_._2)
    val values = (x0 ++ x1).distinct.sorted
    val f0 = x0.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val f1 = x1.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    var a0 = 0L; var a1 = 0L; var dmax = 0.0
    values.foreach { v =>
      a0 += f0.getOrElse(v, 0L); a1 += f1.getOrElse(v, 0L)
      val diff = math.abs(a0.toDouble / x0.size.toDouble - a1.toDouble / x1.size.toDouble)
      if (diff > dmax) dmax = diff
    }
    val ksD = round6(dmax)
    val ksStat = round6(ksD * math.sqrt(
      x0.size.toDouble * x1.size.toDouble / (x0.size + x1.size).toDouble))
    val row = Stats3.statsKs.fn(spark, sf()).collect().head
    assert(row.getLong(0) == x0.size.toLong && row.getLong(1) == x1.size.toLong)
    assert(row.getDouble(2) == ksD)
    assert(row.getDouble(3) == ksStat)
    assert(ksD > 0.0 && ksD <= 1.0)
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("stats_bootstrap matches a driver-side md5-resample recompute") {
    val cust = Tables.customer(spark, sf())
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val rows = Tables.orders(spark, sf())
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")).collect()
      .filter(r => cust(r.getLong(0)))
      .map { r =>
        r.getLong(1) -> JBD.valueOf(r.getDouble(2))
          .setScale(2, RoundingMode.HALF_UP).movePointRight(2).longValueExact()
      }.sortBy(_._1)
    val cents = rows.map(_._2) // rn order = o_orderkey order
    val n = cents.length.toLong
    val meanFull = round6(cents.map(BigInt(_)).sum.toDouble / (n.toDouble * 100.0))
    val repMeans = (1L to 40L).map { b =>
      var s = BigInt(0)
      (1L to n).foreach { i =>
        val idx = (java.lang.Long.parseLong(md5Hex(s"$b:$i").take(8), 16) % n + 1).toInt
        s += cents(idx - 1)
      }
      s.toDouble / (n.toDouble * 100.0)
    }.sorted
    def disc(q: Double): Double = repMeans(math.ceil(q * repMeans.size).toInt - 1)
    val out = Stats3.statsBootstrap.fn(spark, sf()).collect().head
    assert(out.getLong(0) == n && out.getLong(1) == 40L)
    assert(out.getDouble(2) == meanFull)
    assert(out.getDouble(3) == round6(disc(0.05)))
    assert(out.getDouble(4) == round6(disc(0.95)))
    assert(out.getDouble(3) <= out.getDouble(4))
  }

  test("ts_acf matches a driver-side exact-sufficient-statistics recompute") {
    val hours = Tables.events(spark, sf()).select(col("ts")).collect()
      .map(_.getTimestamp(0).getTime / 3600000L) // UTC hour bucket
    val counts = hours.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    val expected = (1L to 6L).flatMap { lag =>
      val pairs = counts.toSeq.flatMap { case (h, x) =>
        counts.get(h + lag).map(y => (x, y))
      }
      val m = pairs.size.toLong
      if (m == 0) None
      else {
        val sx = pairs.map(p => BigInt(p._1)).sum
        val sy = pairs.map(p => BigInt(p._2)).sum
        val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
        val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
        val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
        val vx = BigInt(m) * sxx - sx * sx
        val vy = BigInt(m) * syy - sy * sy
        if (vx <= 0 || vy <= 0) None
        else {
          val r = (BigInt(m) * sxy - sx * sy).toDouble /
            math.sqrt(vx.toDouble * vy.toDouble)
          Some((lag, m, round6(r)))
        }
      }
    }
    val got = Stats3.tsAcf.fn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(t => t._3 >= -1.0 && t._3 <= 1.0))
  }

  test("text_collocations matches a driver-side PMI recompute") {
    val toks = Tables.documents(spark, sf()).select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).toSeq) // -1: keep empties like Spark's split
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val n1 = uni.values.sum
    val big = toks.filter(_.size >= 2)
      .flatMap(t => t.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val n2 = big.values.sum
    val expected = big.toSeq.filter(_._2 >= 5).map { case ((w1, w2), cxy) =>
      val pmi = round6(math.log(cxy.toDouble * n1.toDouble * n1.toDouble
        / (n2.toDouble * uni(w1).toDouble * uni(w2).toDouble)) / math.log(2.0))
      (s"$w1 $w2", cxy, pmi)
    }.sortBy(t => (-t._3, t._1)).take(25)
    val got = Stats3.textCollocations.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == expected.map(t => (t._1, t._2)))
    // log2 via log/log(2) can differ in the last ulp from Spark's LOG2;
    // the 6-dp pin absorbs anything bigger than an ulp straddle
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 1e-6, s"${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("graph_shortest_path matches a driver-side BFS over independently derived edges") {
    // independent edge derivation: pure Scala maps/joins over collected
    // base tables — no reuse of the query's DataFrame pipeline
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val pairW = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .groupBy(p => if (p._1 < p._2) (p._1, p._2) else (p._2, p._1))
      .map { case (k, g) => k -> g.size.toLong }
    val np = pairW.size.toLong
    val tw = pairW.values.sum
    // .toSeq BEFORE collect: Map.collect returning tuples rebuilds a Map
    // and silently collapses edges sharing their first node
    val edges = pairW.toSeq.collect { case ((a, b), w) if w * np > tw => (a, b) }
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val start = edges.map(_._1).min
    var dist = Map(start -> 0L); var frontier = Set(start); var dc = 0L
    while (frontier.nonEmpty) {
      dc += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist ++= next.iterator.map(_ -> dc)
      frontier = next
    }
    val expected = dist.toSeq.sortBy(_._1)
    val got = Stats3.graphShortestPath.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.count(_._2 == 0L) == 1, "exactly one source at distance 0")
  }

  test("b9_stream_dedup emits exactly one row per replayed event_id") {
    val row = Stats3.streamDedup.fn(spark, sf()).collect().head
    val (sent, unique, emitted, ok) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getBoolean(3))
    assert(sent > unique, "fixture must actually replay rows")
    assert(emitted == unique && ok)
  }

  test("b20_snapshot_read keeps v1 byte-stable after v2 lands") {
    val rows = Stats3.snapshotRead.fn(spark, sf()).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getBoolean(3)), "both pinned snapshots must audit-match their source")
    assert(rows(0).getLong(1) < rows(1).getLong(1), "v1 (even keys) is a strict subset of v2")
  }
}
