package graft

import org.apache.spark.sql.functions._
import graft.queries.CurateOps8

/** Semantic pins for sample_dsir (Xie et al. 2023): the importance
  * resampler must prefer documents whose hashed-n-gram distribution
  * matches the target slice.
  */
class CurateOps8Spec extends SparkSpec {
  import spark.implicits._

  private def documentsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c8_docs").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("sample_dsir: disjoint vocabularies — target-vocabulary docs outrank source-only docs") {
    // 60 'en' target docs + 30 'mi' docs that WRITE LIKE the target
    // (same vocabulary, different label) + 910 'xx' docs writing ONLY
    // source vocabulary. k = 100, so selection must take ALL 90
    // target-distribution docs (DSIR selects by distribution, not by
    // label) and fill the last 10 slots from 'xx' by Gumbel. The vocab
    // is repeated ×8 so the score gap (~32 grams × multi-nat log-ratio)
    // dwarfs the Gumbel tail (max |Δg| ≈ 26 for md5-uniforms):
    // selection is decided by distribution, never by tie noise.
    val tWords = Array.fill(8)("alpha beta gamma delta").mkString(" ")
    val sWords = Array.fill(8)("omega sigma tau rho").mkString(" ")
    val tgt = (0L until 60L).map(i => (i, s"$tWords w$i", "en"))
    val mimics = (60L until 90L).map(i => (i, s"$tWords w$i", "mi"))
    val src = (90L until 1000L).map(i => (i, s"$sWords w$i", "xx"))
    val d = documentsDir(tgt ++ mimics ++ src)
    val got = CurateOps8.sampleDsir.fn(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got("en")._1 == 60L, s"every target doc must be kept: $got")
    assert(got("mi")._1 == 30L, s"every target-DISTRIBUTION doc must be kept: $got")
    assert(got("xx")._1 == 10L, s"only the Gumbel-filled remainder comes from source: $got")
    assert(got("en")._2 > got("xx")._2 && got("mi")._2 > got("xx")._2,
      s"target-distribution means must beat the source mean: $got")
  }

  test("sample_dsir on the corpus: target slice over-represented vs its corpus share") {
    val kept = CurateOps8.sampleDsir.fn(spark, sf("sf0.01")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = Tables.documents(spark, sf("sf0.01"))
      .filter(col("text").isNotNull)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptTotal = kept.values.sum.toDouble
    val corpusTotal = corpus.values.sum.toDouble
    val liftEn = (kept("en") / keptTotal) / (corpus("en") / corpusTotal)
    assert(keptTotal == 100.0, s"k must be 100: $keptTotal")
    // en is 43.6% of the sf0.01 corpus; selection must concentrate it
    assert(liftEn > 1.5, s"target lift $liftEn must exceed 1.5")
  }
}
