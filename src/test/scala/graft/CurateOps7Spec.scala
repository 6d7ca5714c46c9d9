package graft

import org.apache.spark.sql.functions._
import graft.queries.CurateOps7

/** Semantic pins for the round-10 published-algorithm dedup rows:
  * ExactSubstr window coverage (Lee et al. 2021) and SemDeDup
  * (Abbas et al. 2023).
  */
class CurateOps7Spec extends SparkSpec {
  import spark.implicits._

  private def documentsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c7_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private val sharedRun = words("shared", 15)   // 15-word duplicated run
  private val runA      = words("runa", 13)     // exactly one window
  private val runB      = words("runb", 13)

  test("dedup_substring: shared 15-word run covers 15 positions in BOTH docs, islands merge") {
    val d = documentsDir(Seq(
      (1L, s"$sharedRun ${words("u1x", 5)}"),          // run at start, 20 words
      (2L, s"${words("u2x", 4)} $sharedRun"),          // run offset by 4, 19 words
      (3L, words("u3x", 20)),                          // clean doc -> zero coverage
      (4L, s"$runA ${words("u4x", 5)} $runB"),         // two disjoint runs, 31 words
      (5L, s"$runA ${words("u5x", 7)} $runB")))        // same runs, different gap
    val got = CurateOps7.dedupSubstring.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc1: starts 1..3 duplicated (3 overlapping windows -> ONE island of 15)
    // doc2: starts 5..7 -> one island of 15
    // doc4/doc5: exactly the two full-run windows (gap words are unique,
    //   so straddling windows never repeat) -> 2 islands, 26 covered
    assert(got == Seq(
      (1L, 20L, 3L, 15L),
      (2L, 19L, 3L, 15L),
      (3L, 20L, 0L, 0L),
      (4L, 31L, 2L, 26L),
      (5L, 33L, 2L, 26L)))
  }

  test("dedup_substring: a run repeated only WITHIN one doc is not cross-doc duplicated") {
    val rep = words("rep", 13)
    val d = documentsDir(Seq(
      (1L, s"$rep ${words("g1x", 3)} $rep"),   // same window twice, one doc
      (2L, words("g2x", 15))))
    val got = CurateOps7.dedupSubstring.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }

  private def embeddingsDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c7_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def oneHot(dim: Int): Array[Float] = {
    val a = new Array[Float](64); a(dim) = 1.0f; a
  }

  test("dedup_semdedup: within-cluster exact dups drop the higher id, keep the lowest") {
    // 5 originals: 4 orthogonal seeds (vec_id < k = ceil(sqrt(10)) = 4)
    // plus vec 4 = exact copy of vec 0. Planted +100000 copies zero dims
    // 63-64, which are already 0 here, so every planted copy is exact.
    val d = embeddingsDir(Seq(
      (0L, oneHot(0), 0), (1L, oneHot(1), 1), (2L, oneHot(2), 2),
      (3L, oneHot(3), 3), (4L, oneHot(0), 0)))
    val got = CurateOps7.dedupSemdedup.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // cluster0 members {0,4,100000,100004}: all-pairs dup (6 pairs), keep 0
    // clusters 1..3 members {i,100000+i}: 1 pair, remove the copy
    assert(got == Seq(
      (0L, 4L, 6L, 3L),
      (1L, 2L, 1L, 1L),
      (2L, 2L, 1L, 1L),
      (3L, 2L, 1L, 1L)))
  }

  test("dedup_semdedup on the corpus: planted copies dominate removals, recall > 0.6") {
    val rows = CurateOps7.dedupSemdedup.fn(spark, sf()).collect()
    val nMembers = rows.map(_.getLong(1)).sum
    val nRemoved = rows.map(_.getLong(3)).sum
    val nOrig = Tables.embeddings(spark, sf())
      .filter(col("embedding").isNotNull).count()
    assert(nMembers == 2 * nOrig, s"members $nMembers vs 2x$nOrig")
    // every planted copy whose original landed in the SAME cluster is
    // removed; cross-cluster splits are the paper's accepted recall loss
    assert(nRemoved > 0.6 * nOrig, s"removed $nRemoved of $nOrig planted")
    assert(nRemoved <= nOrig, s"removed $nRemoved exceeds planted $nOrig")
  }

  test("dedup_semdedup_capped: cap engages, buckets bound by 32, recall >= 0.9 of uncapped") {
    // sf0.01 so clusters actually exceed M = 32 (measured max 49 → 2
    // buckets) — at sf0.001 the cap never engages and the test would
    // pass vacuously
    val capped = CurateOps7.dedupSemdedupCapped.fn(spark, sf("sf0.01")).collect()
    val uncapped = CurateOps7.dedupSemdedup.fn(spark, sf("sf0.01")).collect()
    // per-cluster: n_buckets is exactly ceil(n_members / 32) — the cap
    // is structural, not best-effort
    capped.foreach { r =>
      val (members, buckets) = (r.getLong(1), r.getLong(2))
      assert(buckets == (members + 31) / 32,
        s"cluster ${r.getLong(0)}: $members members, $buckets buckets")
    }
    assert(capped.exists(_.getLong(2) > 1), "cap never engaged — fixture too small")
    val removedCapped = capped.map(_.getLong(4)).sum
    val removedUncapped = uncapped.map(_.getLong(3)).sum
    // centroid-affinity rank ordering keeps near-dups in the same
    // bucket; only boundary-straddling pairs are lost (measured 0.97)
    assert(removedCapped >= 0.9 * removedUncapped,
      s"capped recall ${removedCapped.toDouble / removedUncapped} < 0.9")
  }
}
