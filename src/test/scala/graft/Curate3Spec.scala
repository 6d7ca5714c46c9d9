package graft

import java.util.zip.Deflater
import org.apache.spark.sql.functions._
import graft.queries.CurateOps3

/** Pins for the round-9 twelfth wave. */
class Curate3Spec extends SparkSpec {

  test("text_compress_ratio matches a driver-side Deflater recompute") {
    def zipLen(text: String): Long = {
      val deflater = new Deflater(6)
      val in = text.getBytes("UTF-8")
      deflater.setInput(in); deflater.finish()
      val buf = new Array[Byte](1 << 16)
      var out = 0L
      while (!deflater.finished()) out += deflater.deflate(buf)
      deflater.end()
      out
    }
    val docs = Tables.documents(spark, sf())
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    val got = CurateOps3.textCompressRatio.fn(spark, sf()).collect()
    assert(got.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    got.foreach { r =>
      val g = byLang(r.getString(0))
      assert(r.getLong(1) == g.size.toLong)
      assert(r.getLong(2) == g.map(_._2.getBytes("UTF-8").length.toLong).sum)
      assert(r.getLong(3) == g.map(d => zipLen(d._2)).sum)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.2,
        "deflate ratio of word text must be sane")
    }
    // a deliberately repetitive string must compress far better than the corpus
    val rep = "spam " * 200
    assert(zipLen(rep).toDouble / rep.getBytes("UTF-8").length < 0.05)
  }

  test("b26_join_strategy: planner responds to threshold and hint; results identical") {
    val rows = CurateOps3.joinStrategy.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 3)
    assert(rows.forall(_._4), s"regime mismatch: ${rows.mkString("; ")}")
    val byRegime = rows.map(r => r._1 -> r._2).toMap
    assert(byRegime("threshold_off").contains("sort_merge"))
    assert(byRegime("threshold_10mb") == "broadcast_hash")
    assert(byRegime("explicit_hint") == "broadcast_hash")
    assert(rows.map(_._3).distinct.length == 1, "every regime must join every row")
  }

  test("eval_langid_kappa is consistent with text_langid's confusion matrix") {
    val cm = graft.queries.LlmOpsExt.textLangid.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nn = cm.map(_._3).sum
    val diag = cm.filter(t => t._1 == t._2).map(_._3).sum
    val rows = cm.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val cols = cm.groupBy(_._2).map { case (k, g) => k -> g.map(_._3).sum }
    val pesum = rows.collect { case (k, rs) if cols.contains(k) => rs * cols(k) }.sum
    val po = diag.toDouble / nn.toDouble
    val pe = pesum.toDouble / (nn.toDouble * nn.toDouble)
    val row = graft.queries.LlmOpsExt.evalLangidKappa.fn(spark, sf()).collect().head
    assert(row.getLong(0) == nn && row.getLong(1) == diag)
    assert(math.abs(row.getDouble(2) - po) <= 1e-6)
    assert(math.abs(row.getDouble(3) - (po - pe) / (1.0 - pe)) <= 1e-6)
    assert(row.getDouble(3) > 0.0, "langid must beat chance on this corpus")
  }
}
