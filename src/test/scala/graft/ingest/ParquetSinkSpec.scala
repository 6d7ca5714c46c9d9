package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.{SparkSpec, Tables => T}

class ParquetSinkSpec extends SparkSpec {

  test("compact rewrites a many-file lake to few files, preserving rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val orders = T.orders(spark, sf())
    // simulate per-batch append accumulation: 4 generations of files
    (1 to 4).foreach { _ =>
      orders.limit(100).repartition(8)
        .write.mode(SaveMode.Append).parquet(dir)
    }
    val before = spark.read.parquet(dir)
    val beforeFiles = before.inputFiles.length
    val beforeCount = before.count()
    assert(beforeFiles >= 32)

    ParquetSink.compact(spark, dir, targetPartitions = 2)

    val after = spark.read.parquet(dir)
    assert(after.count() == beforeCount)
    assert(after.inputFiles.length <= 4,
      s"expected <=4 files after compaction, got ${after.inputFiles.length}")
    assert(!Files.exists(java.nio.file.Paths.get(dir + "__compact_old")))
  }
}
