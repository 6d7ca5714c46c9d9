package graft

import org.apache.spark.sql.functions._
import graft.queries.BpeOps

/** Unit gate for the pinned BPE tokenizer: known tokenizations from
  * the learned merge table, the greedy same-pair chain edge, alphabet
  * fallback, and pack_sequences_bpe's budget/ordering invariants.
  */
class BpeSpec extends SparkSpec {

  private def tokenize(words: String*): Map[String, Seq[String]] = {
    import spark.implicits._
    words.toDF("w")
      .select(col("w"), BpeOps.bpeTokensExpr("w").as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
  }

  test("pinned merges reproduce the learned tokenizations") {
    val t = tokenize("join", "hash", "customer", "column", "filter",
      "small", "order", "scan", "batch")
    // fully-merged vocabulary words
    assert(t("join") == Seq("join"))
    assert(t("hash") == Seq("hash"))
    assert(t("customer") == Seq("customer"))
    assert(t("column") == Seq("column"))
    assert(t("scan") == Seq("scan"))
    assert(t("batch") == Seq("batch"))
    // genuine subword splits (tools/learn_bpe.py sample output)
    assert(t("filter") == Seq("fil", "t", "er"))
    assert(t("small") == Seq("s", "m", "a", "l", "l"))
    assert(t("order") == Seq("or", "d", "er"))
  }

  test("greedy left-to-right pass: same-pair chains and unseen alphabet") {
    // "erer": rank-1 merge (e,r) one greedy pass -> [er, er]
    assert(tokenize("erer")("erer") == Seq("er", "er"))
    // "ininin": (i,n) -> [in, in, in]
    assert(tokenize("ininin")("ininin") == Seq("in", "in", "in"))
    // characters outside every merge stay char-split
    assert(tokenize("zzq")("zzq") == Seq("z", "z", "q"))
    // merged token must NOT re-merge with a following single char under
    // the same rank: "ere" -> [er, e] (not [ere])
    assert(tokenize("ere")("ere") == Seq("er", "e"))
  }

  private def tokenizeFull(words: String*): Map[String, Seq[String]] = {
    import spark.implicits._
    words.toDF("w")
      .select(col("w"), BpeOps.bpeTokensFullCol(col("w")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
  }

  test("full-depth table: in-vocabulary words saturate to ONE token") {
    // the 1847-merge table was learned to saturation, so every word of
    // the learning corpus folds all the way down — each one exercises
    // its complete merge chain in rank order
    val t = tokenizeFull("spark", "window", "merge", "table", "vector",
      "column", "filter", "customer")
    t.foreach { case (w, toks) =>
      assert(toks == Seq(w), s"$w must fold to a single token, got $toks")
    }
    // out-of-vocabulary words still fold PARTIALLY via shared subwords,
    // never below one token per unseen character
    val oov = tokenizeFull("qqq")("qqq")
    assert(oov == Seq("q", "q", "q"))
  }

  test("full-depth table: anchor and full folds agree at anchor depth prefix") {
    // the anchor's 32 merges and the full table's first merges are
    // learned from different corpora, so the TOKENIZATIONS differ; the
    // invariant that must hold is the count ordering full <= anchor
    // (more merges never split more) on every vocabulary word
    val df = BpeOps.textBpeFull.fn(spark, sf())
    assert(df.filter(col("n_bpe_full") > col("n_bpe_anchor")).count() == 0)
    assert(df.filter(col("n_bpe_full") < col("n_words")).count() == 0)
    assert(df.count() > 0)
  }

  test("word counts: n_bpe between n_words and n_chars") {
    val df = BpeOps.textBpeTokens.fn(spark, sf())
    val bad = df
      .join(Tables.documents(spark, sf()), "doc_id")
      .filter(col("n_bpe") < col("n_words") ||
        col("n_bpe") > length(col("text")))
      .count()
    assert(bad == 0)
    assert(df.count() > 0)
  }

  test("pack_sequences_bpe: bins hold the budget and partition the docs") {
    val bins = BpeOps.packSequencesBpe.fn(spark, sf()).collect()
    assert(bins.nonEmpty)
    // every doc lands in exactly one bin
    val nDocs = bins.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf()).count())
    // greedy rule: a bin's tokens exceed the 256 budget only via its
    // LAST doc straddling the boundary — so sum_tokens < 256 + max doc
    val maxDoc = BpeOps.textBpeTokens.fn(spark, sf())
      .agg(max(col("n_bpe"))).collect()(0).getLong(0)
    assert(bins.forall(_.getAs[Long]("sum_tokens") < 256 + maxDoc))
  }
}
