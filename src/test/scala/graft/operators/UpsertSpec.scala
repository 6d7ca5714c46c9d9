package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables => T}

class UpsertSpec extends SparkSpec {

  test("upsert inserts new keys, replaces existing, keeps untouched rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 10))
      .toDF("id", "payload", "version")
    Upsert.intoParquet(spark, dir, base, Seq("id"), "version")

    // update id=2 (even with an OLDER version — incoming wins), insert id=4
    val delta = Seq((2L, "b2", 5), (4L, "d", 11)).toDF("id", "payload", "version")
    val n = Upsert.intoParquet(spark, dir, delta, Seq("id"), "version")
    assert(n == 4)

    val out = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, "a", 10), (2L, "b2", 5), (3L, "c", 10), (4L, "d", 11)))
    assert(!Files.exists(java.nio.file.Paths.get(dir + "__upsert_old")))
  }

  test("duplicate keys WITHIN the incoming batch resolve to highest version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert2").toString + "/t"
    val batch = Seq((1L, "v1", 1), (1L, "v3", 3), (1L, "v2", 2))
      .toDF("id", "payload", "version")
    Upsert.intoParquet(spark, dir, batch, Seq("id"), "version")
    val out = spark.read.parquet(dir).collect()
    assert(out.length == 1 && out.head.getString(1) == "v3")
  }

  test("property: any sequence of upsert batches equals the in-memory reference merge") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val batchGen = Gen.listOfN(3, Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 12L), Gen.choose(1, 9))))
    // fixed seeds → reproducible; each sample is 3 sequential batches
    (1 to 5).foreach { i =>
      val batches = batchGen(Gen.Parameters.default, Seed(i.toLong)).get
      val dir = Files.createTempDirectory(s"graft_upsert_prop$i").toString + "/t"
      val reference = scala.collection.mutable.Map.empty[Long, (String, Int)]
      batches.zipWithIndex.foreach { case (batch, bi) =>
        val rows = batch.map { case (k, v) => (k, s"p${bi}_${k}_$v", v) }
        Upsert.intoParquet(spark, dir,
          rows.toDF("id", "payload", "version"), Seq("id"), "version")
        // reference: within a batch highest version wins (ties: by key
        // order is irrelevant — same key+version = same payload here);
        // across batches the newer batch always wins
        rows.groupBy(_._1).foreach { case (k, dups) =>
          val best = dups.maxBy(_._3)
          reference(k) = (best._2, best._3)
        }
      }
      val got = spark.read.parquet(dir).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
      assert(got == reference.toMap, s"seed $i diverged")
    }
  }

  test("partition-scoped upsert rewrites ONLY the touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upsert_part").toString + "/t"
    val base = Seq(
      (1L, "a", 1, 10), (2L, "b", 1, 10),
      (3L, "c", 2, 10), (4L, "d", 2, 10),
      (5L, "e", 3, 10))
      .toDF("id", "payload", "day", "version")
    Upsert.intoPartitionedParquet(spark, dir, base, Seq("id"), "version", "day")

    // record the physical files of every partition before the merge
    def filesOf(day: Int): Set[String] = {
      val p = java.nio.file.Paths.get(dir, s"day=$day")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    }
    val day1Before = filesOf(1)
    val day3Before = filesOf(3)

    // batch touches only day 2 (update id=3, insert id=6)
    val delta = Seq((3L, "c2", 2, 11), (6L, "f", 2, 11))
      .toDF("id", "payload", "day", "version")
    val n = Upsert.intoPartitionedParquet(spark, dir, delta, Seq("id"), "version", "day")
    assert(n == 6)

    // untouched partitions keep their exact files — never rewritten
    assert(filesOf(1) == day1Before, "day=1 was rewritten")
    assert(filesOf(3) == day3Before, "day=3 was rewritten")

    val out = spark.read.parquet(dir).orderBy("id")
      .select("id", "payload", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, "a", 10), (2L, "b", 10), (3L, "c2", 11),
      (4L, "d", 10), (5L, "e", 10), (6L, "f", 11)))
  }

  test("MERGE convergence: a batch applied twice ≡ once; disjoint batches commute") {
    import spark.implicits._
    def lake(tag: String) = Files.createTempDirectory(s"graft_conv_$tag").toString + "/t"
    def contents(dir: String): Set[(Long, String, Int)] =
      spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val base = Seq((1L, "a", 1), (2L, "b", 1)).toDF("id", "payload", "version")
    val a = Seq((2L, "b2", 2), (3L, "c", 2)).toDF("id", "payload", "version")
    val b = Seq((4L, "d", 2), (5L, "e", 2)).toDF("id", "payload", "version") // keys ∩ a = ∅

    // idempotence: the CDC at-least-once delivery guarantee
    val (once, twice) = (lake("once"), lake("twice"))
    Seq(once, twice).foreach(Upsert.intoParquet(spark, _, base, Seq("id"), "version"))
    Upsert.intoParquet(spark, once, a, Seq("id"), "version")
    Upsert.intoParquet(spark, twice, a, Seq("id"), "version")
    Upsert.intoParquet(spark, twice, a, Seq("id"), "version")
    assert(contents(once) == contents(twice), "reapplying a batch changed the lake")

    // commutativity on disjoint key sets: parallel loaders can't conflict
    val (ab, ba) = (lake("ab"), lake("ba"))
    Seq(ab, ba).foreach(Upsert.intoParquet(spark, _, base, Seq("id"), "version"))
    Upsert.intoParquet(spark, ab, a, Seq("id"), "version")
    Upsert.intoParquet(spark, ab, b, Seq("id"), "version")
    Upsert.intoParquet(spark, ba, b, Seq("id"), "version")
    Upsert.intoParquet(spark, ba, a, Seq("id"), "version")
    assert(contents(ab) == contents(ba), "disjoint batches did not commute")
    assert(contents(ab) == Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 2),
      (4L, "d", 2), (5L, "e", 2)))
  }

  test("upsert result equals a reference merge over a real table slice") {
    val dir = Files.createTempDirectory("graft_upsert3").toString + "/t"
    val o = T.orders(spark, sf())
      .select(col("o_orderkey"), col("o_totalprice"), lit(1).as("version"))
    Upsert.intoParquet(spark, dir, o.filter(col("o_orderkey") <= 1000),
      Seq("o_orderkey"), "version")
    val updates = o.filter(col("o_orderkey").between(500, 1500))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("version", lit(2))
    Upsert.intoParquet(spark, dir, updates, Seq("o_orderkey"), "version")

    val merged = spark.read.parquet(dir)
    val expected = o.filter(col("o_orderkey") <= 1000)
      .join(updates.select(col("o_orderkey").as("uk")), col("o_orderkey") === col("uk"), "left_anti")
      .unionByName(updates)
    assert(merged.count() == expected.count())
    assert(merged.exceptAll(expected).isEmpty && expected.exceptAll(merged).isEmpty)
  }
}
