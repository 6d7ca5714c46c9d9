package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's batch-ETL loop re-expressed on Spark (SURVEY.md §3.4):
  * discover CSV batches + manifest sidecars, read with reject
  * quarantine, evolve the schema add-only, dedup within the batch, land
  * in a parquet lake (the offline stand-in for the Greenplum sink — the
  * JDBC path is JdbcSink), archive inputs.
  *
  * Scale posture: each batch is APPENDED as new parquet files — history
  * is never rewritten. Add-only column evolution composes with parquet
  * `mergeSchema` on read, so a 100 TB lake absorbs a new column at the
  * cost of one batch, not a rewrite.
  *
  * Layout expected under `uploadDir`:
  *   <table>/<batch>.csv            data files (any number)
  *   <table>/manifest.txt           column manifest (Manifest.parse)
  */
object Ingest {

  final case class TableReport(
      table: String,
      files: Seq[String],
      loaded: Long,
      rejected: Long,
      evolvedColumns: Seq[String],
      failed: Option[String] = None)

  final case class Config(
      uploadDir: String,
      lakeDir: String,
      archiveDir: String,
      errorDir: String = "",
      rejectLimit: Long = 1000,
      dedupKeys: Seq[String] = Nil,
      /** Tables with full-refresh semantics (the reference's dimension
        * class): each batch REPLACES the table via stage-and-swap
        * instead of appending.
        */
      fullRefreshTables: Set[String] = Set.empty)

  /** One tick of the loop. Deterministic table/file ordering (the
    * reference processed files in a fixed order — D-rule parity).
    * A failing table quarantines its files to the error folder and
    * does NOT abort the tick — per-table isolation, like the
    * reference's retry/error folders.
    */
  def run(spark: SparkSession, conf: Config): Seq[TableReport] = {
    val root = Paths.get(conf.uploadDir)
    if (!Files.isDirectory(root)) return Nil
    val tables = Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_)).toSeq.sortBy(_.getFileName.toString)
    tables.map { dir =>
      try loadTable(spark, conf, dir)
      catch {
        case e: Exception =>
          val table = dir.getFileName.toString
          val files = listCsv(dir)
          val errRoot = if (conf.errorDir.nonEmpty) conf.errorDir
                        else s"${conf.archiveDir}/../error"
          val err = Paths.get(errRoot, table)
          Files.createDirectories(err)
          files.foreach { f =>
            val p = Paths.get(f)
            Files.move(p, err.resolve(p.getFileName),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
          TableReport(table, files, 0, 0, Nil, failed = Some(e.getMessage))
      }
    }
  }

  private def listCsv(dir: Path): Seq[String] =
    Files.list(dir).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".csv") || n.endsWith(".csv.gz")
      }
      .map(_.toString).toSeq.sorted

  /** Lake reader: mergeSchema unions add-only evolved batches. */
  def readLake(spark: SparkSession, conf: Config, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"${conf.lakeDir}/$table")

  private def loadTable(spark: SparkSession, conf: Config, dir: Path): TableReport = {
    val table = dir.getFileName.toString
    val manifest = Manifest.parse(
      new String(Files.readAllBytes(dir.resolve("manifest.txt")), "UTF-8"))
    val files = listCsv(dir)

    val res = CsvSource.read(spark, manifest, s"$dir/*.csv*")
    val rejected = CsvSource.enforceRejectLimit(res, conf.rejectLimit)

    // Add-only evolution: conform this batch to live-schema ∪ manifest.
    // (Full-refresh tables replace contents, but their schema still only
    // grows — the reference never drops or retypes.)
    val target = s"${conf.lakeDir}/$table"
    val fullRefresh = conf.fullRefreshTables.contains(table)
    val (aligned, evolvedCols) =
      if (Files.isDirectory(Paths.get(target))) {
        val live = spark.read.option("mergeSchema", "true").parquet(target).schema
        val evolved = SchemaEvolution.evolve(live, res.valid.schema)
        val newCols = evolved.fieldNames.diff(live.fieldNames).toSeq
        (SchemaEvolution.align(res.valid, evolved), newCols)
      } else (res.valid, Nil)

    // Idempotent re-import within the batch: deterministic keep-first
    // dedup when keys are declared (row_number, not dropDuplicates — D4).
    val deduped =
      if (conf.dedupKeys.nonEmpty) {
        val w = Window.partitionBy(conf.dedupKeys.map(col): _*)
          .orderBy(aligned.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)
        aligned.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1).drop("_graft_rn")
      } else aligned

    val loaded = deduped.count()
    if (fullRefresh) {
      // the reference's dimension class: stage-and-swap — write the new
      // generation beside the live one, then two atomic renames. Readers
      // never see a partially-replaced table.
      val stage = Paths.get(target + "__stage")
      deduped.write.mode(SaveMode.Overwrite).parquet(stage.toString)
      val live = Paths.get(target)
      val old = Paths.get(target + "__old")
      if (Files.exists(live))
        Files.move(live, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Files.move(stage, live, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).iterator().forEachRemaining(rm)
        Files.deleteIfExists(p)
      }
      rm(old)
    } else {
      deduped.write.mode(SaveMode.Append).parquet(target)
    }

    // Archive inputs (FS rename, driver-side — same as the reference).
    val archive = Paths.get(conf.archiveDir, table)
    Files.createDirectories(archive)
    files.foreach { f =>
      val p = Paths.get(f)
      Files.move(p, archive.resolve(p.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    TableReport(table, files, loaded, rejected, evolvedCols)
  }
}
