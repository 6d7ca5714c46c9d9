package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal.PureCodecs
import graft.operators.Upsert

/** Regression tests for the round-3 self-review findings: descending
  * `sequence(1, 0)` on short docs, Hive-escaped/null partition values in
  * the partition-scoped upsert, and malformed-media codec inputs.
  */
class RobustnessSpec extends SparkSpec {

  /** A documents.parquet fixture whose texts include degenerate docs the
    * sf tables never contain: empty, 1-token, 4-token (one below the
    * 5-gram minimum), and one normal pair to keep joins non-vacuous.
    */
  private def shortDocsDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_short_docs").toString
    val docs = Seq(
      (1L, "", "en", "web", 0L),
      (2L, "one", "en", "web", 3L),
      (3L, "just four small tokens", "en", "web", 22L),
      (4L, "the quick brown fox jumps over the lazy dog again", "en", "web", 49L),
      (5L, "the quick brown fox jumps over the lazy dog again", "en", "web", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("shingle queries survive docs shorter than the n-gram (sequence(1,0) guard)") {
    val dir = shortDocsDir()
    // would throw INVALID_INDEX_OF_ZERO / slice-position-0 before the fix
    for (q <- Seq("dedup_contamination", "dedup_ngram_jaccard", "text_langid",
                  "dedup_minhash_lsh")) {
      val n = SparkEntry.queries(q)(spark, dir).count()
      assert(n >= 0, s"$q failed on short docs")
    }
    // the duplicate >=5-token pair must still be detected by the 3-gram
    // jaccard dedup — shingling works, just skips the short docs
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    assert(pairs.count() >= 1, "duplicate pair not found after short-doc guard")
  }

  test("Lsh shingles are empty, not wrong, for docs below the shingle length") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d e")).toDF("doc_id", "text")
    val pairs = graft.ml.Lsh.textNearDupPairs(spark, docs,
      maxJaccardDistance = 0.5, shingleLen = 3)
    assert(pairs.count() == 0) // no crash, no bogus partial shingles
  }

  test("partition-scoped upsert keeps rows whose partition value needs Hive escaping") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_esc").toString + "/t"
    // ':' and '/' are Hive-escaped in directory names (%3A, %2F): the
    // swap must key off the STAGED directory names, not raw values
    val base = Seq((1L, "a", "2024/01", 10), (2L, "b", "08:30", 10))
      .toDF("id", "payload", "slot", "version")
    Upsert.intoPartitionedParquet(spark, dir, base, Seq("id"), "version", "slot")
    val delta = Seq((1L, "a2", "2024/01", 11), (3L, "c", "08:30", 11))
      .toDF("id", "payload", "slot", "version")
    val n = Upsert.intoPartitionedParquet(spark, dir, delta, Seq("id"), "version", "slot")
    assert(n == 3, s"expected 3 rows after merge, got $n")
    val out = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[Int]("version"))).toSeq
    assert(out == Seq((1L, "a2", 11), (2L, "b", 10), (3L, "c", 11)))
  }

  test("partition-scoped upsert merges (not clobbers) the null partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_null").toString + "/t"
    val base = Seq((1L, "a", Some("d1"), 10), (2L, "b", None, 10), (3L, "c", None, 10))
      .toDF("id", "payload", "day", "version")
    Upsert.intoPartitionedParquet(spark, dir, base, Seq("id"), "version", "day")
    // batch touches the null partition: update id=2, leave id=3 alone
    val delta = Seq((2L, "b2", Option.empty[String], 11))
      .toDF("id", "payload", "day", "version")
    val n = Upsert.intoPartitionedParquet(spark, dir, delta, Seq("id"), "version", "day")
    assert(n == 3, s"expected 3 rows after null-partition merge, got $n")
    val out = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("top-down BMP (negative biHeight) decodes to the same pixels as bottom-up") {
    val rgb = Array.tabulate(6 * 4)(i => i * 0x010203)
    val bottomUp = PureCodecs.writeBmp(6, 4, rgb)
    // flip to the top-down profile: negate biHeight, reverse row order
    val topDown = bottomUp.clone()
    val h = -4
    topDown(22) = (h & 0xFF).toByte; topDown(23) = ((h >> 8) & 0xFF).toByte
    topDown(24) = ((h >> 16) & 0xFF).toByte; topDown(25) = ((h >> 24) & 0xFF).toByte
    val rowBytes = 6 * 3 + ((4 - (6 * 3) % 4) % 4)
    val px = topDown.drop(54)
    val flipped = (0 until 4).reverse.flatMap(r => px.slice(r * rowBytes, (r + 1) * rowBytes))
    System.arraycopy(flipped.toArray, 0, topDown, 54, rowBytes * 4)
    val (w1, h1, p1) = PureCodecs.parseBmp(bottomUp)
    val (w2, h2, p2) = PureCodecs.parseBmp(topDown)
    assert((w1, h1) == (w2, h2) && p1.sameElements(p2))
  }

  test("truncated BMP and malformed WAV chunk sizes fail fast (no hang, no overrun)") {
    val img = PureCodecs.writeBmp(8, 8, Array.fill(64)(0xFFFFFF))
    intercept[IllegalArgumentException] {
      PureCodecs.parseBmp(img.take(54 + 10)) // header intact, pixels cut
    }
    val wav = PureCodecs.writeWav(Array.tabulate(100)(i => (i * 7).toShort), 8000)
    // corrupt the fmt chunk size to a negative value: the RIFF walk must
    // throw, not loop forever on a non-advancing offset
    val bad = wav.clone()
    bad(16) = 0xF8.toByte; bad(17) = 0xFF.toByte; bad(18) = 0xFF.toByte; bad(19) = 0xFF.toByte
    intercept[IllegalArgumentException] { PureCodecs.parseWav(bad) }
    // oversized data-chunk claim (overruns the buffer) must also throw
    val over = wav.clone()
    val dataSizeOff = 40
    over(dataSizeOff) = 0xFF.toByte; over(dataSizeOff + 1) = 0xFF.toByte
    over(dataSizeOff + 2) = 0x7F.toByte
    intercept[IllegalArgumentException] { PureCodecs.parseWav(over) }
  }
}
