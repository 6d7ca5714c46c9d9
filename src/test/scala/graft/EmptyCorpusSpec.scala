package graft

import java.nio.file.Files

/** Empty-corpus survival gate: EVERY declared query must execute
  * without throwing on a corpus whose tables all have the right schema
  * and ZERO rows. At 100 TB the empty daily batch / empty partition is
  * routine — an engine whose queries explode on it fails operationally
  * long before it fails a benchmark. (Results on empty input are not
  * oracle-checked — only non-crash + non-negative cardinality.)
  */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty_corpus").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${sf()}/$t.parquet").limit(0)
        .coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    // events goes through the nanos-aware loader for the schema, and is
    // written back as a normal micros timestamp (Tables.events handles
    // both encodings)
    Tables.events(spark, sf()).limit(0)
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query survives an all-empty corpus") {
    val failures = SparkEntry.declared.flatMap { q =>
      try {
        val n = q.fn(spark, emptyDir).count()
        if (n < 0) Some(s"${q.name}: negative count") else None
      } catch {
        case e: Throwable =>
          Some(s"${q.name}: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on the empty corpus:\n  ${failures.mkString("\n  ")}")
  }
}
