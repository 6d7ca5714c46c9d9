package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 crawl-curation rows: segment-level
  * boilerplate dedup (RefinedWeb line-dedup semantics) and URL
  * canonicalization dedup.
  */
class CurateOps6Spec extends SparkSpec {
  import spark.implicits._

  private def documentsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c6_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // 8 words = exactly one segment
  private val boiler = "subscribe to our newsletter for daily updates now"
  private val uniqA  = "alpha beta gamma delta epsilon zeta eta theta"
  private val uniqB  = "one two three four five six seven eight"

  test("dedup_paragraph: a segment shared by two docs flags in BOTH; unique docs stay clean") {
    val d = documentsDir(Seq(
      (1L, s"$boiler $uniqA"),  // boiler + unique = 2 segments, 1 boiler
      (2L, s"$uniqB $boiler"),  // position doesn't matter, alignment does
      (3L, uniqA)))             // 1 segment, seen only here... but uniqA
    // doc 3's only segment ALSO appears as doc 1's second segment (both
    // 8-word aligned), so it IS boilerplate — document frequency counts
    // distinct docs, not positions.
    val got = graft.queries.CurateOps6.dedupParagraph.fn(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)), s"doc1: ${got(1L)}")   // both segs shared
    assert(got(2L) == ((2L, 1L, 0.5)), s"doc2: ${got(2L)}")   // only boiler shared
    assert(got(3L) == ((1L, 1L, 1.0)), s"doc3: ${got(3L)}")
  }

  test("dedup_paragraph: segments are NON-overlapping and 8-aligned; <8-word docs drop") {
    // doc 2 contains the boiler words but shifted by one word — no
    // 8-aligned segment matches, so nothing flags (line dedup is
    // verbatim-run dedup, not bag-of-words)
    val d = documentsDir(Seq(
      (1L, s"$boiler $uniqA"),
      (2L, s"pad $boiler"),
      (3L, "too short")))
    val got = graft.queries.CurateOps6.dedupParagraph.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), s"misaligned run must not flag: $got")
  }

  private def ordersDir(keys: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c6_ord").toString
    keys.toDF("o_orderkey")
      .withColumn("o_custkey", lit(1L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("url_canonical_dedup: case/port/utm/param-order noise collapses to one canonical key") {
    // keys 60..69 share item bucket 6; size = key % 3 splits them into
    // three canonical groups {60,63,66,69},{61,64,67},{62,65,68} while
    // scheme case (k%2), host case (k%3), :443 (k%5) and utm/param
    // order (k%4) all vary across the raws
    val d = ordersDir(60L to 69L)
    val got = graft.queries.CurateOps6.urlCanonicalDedup.fn(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == 10L, s"every raw lands somewhere: $got")
    val byCanon = got.map(g => g._1 -> g._2).toMap
    assert(byCanon == Map(
      "https://shop.example.com/item/6?color=red&size=0" -> 4L,
      "https://shop.example.com/item/6?color=red&size=1" -> 3L,
      "https://shop.example.com/item/6?color=red&size=2" -> 3L), s"$byCanon")
    // the canonical form itself: lowercase host, no port, no utm, sorted params
    got.map(_._1).foreach { c =>
      assert(!c.contains(":443") && !c.contains("utm_") && c == c.toLowerCase, c)
      assert(c.indexOf("color=") < c.indexOf("size="), s"params must sort: $c")
    }
    // n_variants counts DISTINCT raw spellings (all differ here)
    assert(got.find(_._1.endsWith("size=0")).get._3 == 4L)
    // first_key = min orderkey in the cluster
    assert(got.find(_._1.endsWith("size=0")).get._4 == 60L)
  }
}
