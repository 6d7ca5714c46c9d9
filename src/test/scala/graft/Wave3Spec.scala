package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.functions._
import graft.queries.{CorpusOps3, GraphQ2, NoOracle3}

/** Pins for the round-8 session-3 third wave: vocabulary overlap,
  * closeness centrality (recomputed over independently derived edges),
  * and the two capability rows' structural guarantees.
  */
class Wave3Spec extends SparkSpec {

  private def round6(v: Double): Double =
    JBD.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("text_vocab_overlap matches driver-side set intersections") {
    val vocab = Tables.documents(spark, sf())
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1).map(w => (r.getString(0), w)))
      .toSet.groupBy((p: (String, String)) => p._1)
      .map { case (l, ps) => l -> ps.map(_._2) }
    val rows = CorpusOps3.textVocabOverlap.fn(spark, sf()).collect()
    val langs = vocab.keySet.toSeq.sorted
    val expectedPairs = (for {
      i <- langs.indices; j <- (i + 1) until langs.size
      if (vocab(langs(i)) & vocab(langs(j))).nonEmpty
    } yield (langs(i), langs(j))).toSet
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet == expectedPairs)
    rows.foreach { r =>
      val (la, lb) = (r.getString(0), r.getString(1))
      val inter = (vocab(la) & vocab(lb)).size.toLong
      assert(r.getLong(2) == vocab(la).size.toLong, s"$la vocab")
      assert(r.getLong(3) == vocab(lb).size.toLong, s"$lb vocab")
      assert(r.getLong(4) == inter, s"$la-$lb intersection")
      val uni = vocab(la).size + vocab(lb).size - inter
      assert(r.getDouble(5) == round6(inter.toDouble / uni.toDouble))
    }
  }

  test("graph_closeness matches a BFS over independently derived edges") {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val natName = Tables.nation(spark, sf()).select(col("n_nationkey"), col("n_name"))
      .collect().map(r => lv(r, 0) -> r.getString(1)).toMap
    val suppNat = Tables.supplier(spark, sf()).select(col("s_suppkey"), col("s_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val custNat = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_nationkey"))
      .collect().map(r => lv(r, 0) -> natName(lv(r, 1))).toMap
    val orderCust = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val pw = Tables.lineitem(spark, sf()).select(col("l_suppkey"), col("l_orderkey"))
      .collect()
      .map(r => (suppNat(lv(r, 0)), custNat(orderCust(lv(r, 1)))))
      .filter(p => p._1 != p._2)
      .map { case (s, c) => if (s < c) (s, c) else (c, s) }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val np = pw.size.toLong
    val tw = pw.values.sum
    // NB: collect on the Map itself would rebuild a Map from the (a, b)
    // key pairs and silently dedupe edges by left endpoint — go via Seq
    val edges = pw.toSeq.collect { case (k, w) if w * np > tw => k }
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val n = adj.size.toLong
    val rows = GraphQ2.graphCloseness.fn(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == adj.keySet)
    rows.foreach { row =>
      var dist = Map(row.getString(0) -> 0L); var frontier = Set(row.getString(0))
      var dcur = 0L
      while (frontier.nonEmpty && dcur < 30) {
        dcur += 1
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= next.iterator.map(_ -> dcur); frontier = next
      }
      val r = dist.size.toLong; val sd = dist.values.sum
      assert(row.getLong(1) == r)
      assert(row.getLong(2) == sd)
      assert(row.getDouble(3) ==
        round6(((r - 1) * (r - 1)).toDouble / ((n - 1).toDouble * sd.toDouble)))
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
    }
  }

  test("b27_bloom_prefilter: zero false negatives, bounded FP rate, path agreement") {
    val row = NoOracle3.bloomPrefilter.fn(spark, sf()).collect().head
    assert(row.getLong(3) == 0L, "bloom false negative — membership guarantee broken")
    assert(row.getDouble(5) <= 0.15, s"fp_rate ${row.getDouble(5)} above budget")
    assert(row.getBoolean(6), "prefilter path disagreed with the exact anti-join")
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
  }

  test("b28_cache_columnar: executed plan reads the cache and results match") {
    val row = NoOracle3.cacheColumnar.fn(spark, sf()).collect().head
    assert(row.getBoolean(2), "aggregate did not read InMemoryRelation")
    assert(row.getBoolean(3), "cached-path results diverged from direct scan")
    assert(row.getLong(0) > 0)
  }
}
