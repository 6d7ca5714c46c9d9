package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQ5, QualityOps2}

/** Pins for the round-10 Gopher-rules funnel and k-core decomposition. */
class QualityOps2Spec extends SparkSpec {
  import spark.implicits._

  private def documentsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q2_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("quality_gopher_rules: each rule trips on its designed offender doc") {
    // base vocabulary: 8 words repeated everywhere = the corpus top-8
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val fill   = (1 to 6).map(_ => common).mkString(" ")   // 48 words
    val doc50  = s"$fill ok fine"                          // 50 words, all rules pass
    val short  = s"$common tail"                           // 9 words -> word_count_min
    // 2 stopwords + 48 sixteen-char words: mean len 15.5 > 10, stopword rule passes
    val longw  = "alpha beta " + (1 to 48).map(i => f"verylongword$i%04d").mkString(" ")
    val symb   = s"$fill ${"# # # # # #"}"                 // 54 words, 6/54 '#' > 0.1
    val digits = s"$fill 111 222 333 444 555 666 777 888 999 000 123 456 789 321" // alpha < 0.8? 48/62=0.774
    val nostop = (1 to 50).map(i => s"rare$i").mkString(" ") // 50 unique words, 0 stopwords
    val d = documentsDir(Seq(
      (1L, doc50), (2L, short), (3L, longw), (4L, symb), (5L, digits), (6L, nostop)))
    val got = QualityOps2.qualityGopherRules.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("word_count_min") == 1L, s"short doc: $got")
    assert(got("word_count_max") == 0L)
    assert(got("mean_word_length") == 1L, s"long words: $got")
    assert(got("symbol_word_ratio") == 1L, s"hash doc: $got")
    assert(got("alpha_word_frac") == 1L, s"digit doc: $got")
    assert(got("stopword_count") == 1L, s"nostop doc: $got")
    assert(got("zz_pass_all") == 1L, s"only doc1 passes: $got")
  }

  test("graph_k_core peel: 4-clique with a pendant path decomposes to cores 3/1/0") {
    // 4-clique {0,1,2,3} (core 3), path 3-4-5 (core 1), isolated 9 (core 0)
    val edges = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5))
    val nodes = Seq(0, 1, 2, 3, 4, 5)
    val cores = GraphQ5.kcore(nodes, edges)
    assert(cores == Map(0 -> 3, 1 -> 3, 2 -> 3, 3 -> 3, 4 -> 1, 5 -> 1))
  }

  test("graph_k_core on the corpus: every nation reported, cores weakly descending") {
    val rows = GraphQ5.graphKCore.fn(spark, sf("sf0.01")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 25)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // the thresholded trade graph is dense enough for a non-trivial core
    assert(rows.map(_._2).max >= 2, s"degenerate decomposition: ${rows.toSeq}")
  }
}
