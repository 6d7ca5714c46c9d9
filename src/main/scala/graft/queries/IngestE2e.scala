package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}
import graft.ingest.{Ingest, JdbcSink, LoadAudit}

/** B3/B4/B18 surfaced as declared rows (VERDICT r6 #1-3, #9): the
  * reference's WHOLE job — CSV drop through manifest schema, reject
  * quarantine, add-only evolution, lake append / full-refresh swap,
  * JDBC landing on a live database, input archival — run end-to-end
  * inside one driver-visible row, plus the JDBC round-trip/pushdown
  * federation legs and the persistent-catalog lifecycle.
  *
  * All rows are rows-only (filesystem + database side effects are not
  * SQL-expressible for DuckDB), with fixture-determined counts so the
  * driver's rows check is deterministic. Derby is the only live JDBC
  * engine in this offline environment (the JdbcLiveSpec precedent);
  * everything Greenplum-specific stays in JdbcSink's text-asserted DDL.
  */
object IngestE2e {

  private val derbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def freshToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private def writeLocal(path: java.nio.file.Path, text: String): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, text)
  }

  /** The full ingest loop, two ticks, two table classes, then the JDBC
    * landing. Tick 1: `metrics` (append class, in-batch dedup on id) and
    * `dims` (full-refresh class). Tick 2: an EVOLVED metrics manifest
    * (new `region` column — add-only evolution against the live lake)
    * and a replacement dims generation (stage-and-swap). Then the lake
    * lands on embedded Derby: metrics via the partition-parallel append
    * path, dims via loadStage + the swap sequence replayed on a
    * driver-side connection. One output row per table with the
    * fixture-determined counts the driver can gate on.
    */
  val ingestE2e: Q = Q.noOracle("b3_ingest_e2e") { (s, _) =>
    import s.implicits._
    val token = freshToken()
    val base = java.nio.file.Files.createTempDirectory(s"graft_b3_e2e_$token")
    val up = base.resolve("upload"); val lake = base.resolve("lake")
    val arch = base.resolve("archive")
    val conf = Ingest.Config(
      uploadDir = up.toString, lakeDir = lake.toString,
      archiveDir = arch.toString, dedupKeys = Seq("id"),
      fullRefreshTables = Set("dims"))

    // ---- tick 1 ----------------------------------------------------
    writeLocal(up.resolve("metrics/manifest.txt"),
      "id,bigint\nmetric,text\nm_value,double precision\n")
    writeLocal(up.resolve("metrics/batch1.csv"),
      """id,metric,m_value
        |1,cpu,0.5
        |2,mem,0.7
        |3,cpu,0.9
        |4,disk,0.1
        |5,mem,0.2
        |5,mem,0.2
        |6,cpu,0.4
        |7,disk,0.8
        |8,mem,0.6
        |abc,cpu,1.0
        |9,cpu,xyz
        |""".stripMargin) // 9 valid lines, 1 in-batch dup (id 5), 2 malformed
    writeLocal(up.resolve("dims/manifest.txt"), "id,bigint\ntag,text\n")
    writeLocal(up.resolve("dims/gen1.csv"),
      "id,tag\n1,old\n2,old\n3,old\n")
    val tick1 = Ingest.run(s, conf)

    // ---- tick 2: evolved metrics manifest + dims generation 2 ------
    writeLocal(up.resolve("metrics/manifest.txt"),
      "id,bigint\nmetric,text\nm_value,double precision\nregion,text\n")
    writeLocal(up.resolve("metrics/batch2.csv"),
      """id,metric,m_value,region
        |10,cpu,0.3,eu
        |11,mem,0.9,us
        |12,cpu,0.2,eu
        |13,disk,0.7,ap
        |oops,disk,0.7,ap
        |""".stripMargin) // 4 valid, 1 malformed
    writeLocal(up.resolve("dims/gen2.csv"), "id,tag\n1,new\n2,added\n")
    val tick2 = Ingest.run(s, conf)

    val reports = (tick1 ++ tick2).groupBy(_.table)
    def loadedTotal(t: String) = reports(t).map(_.loaded).sum
    def rejectedTotal(t: String) = reports(t).map(_.rejected).sum
    def evolved(t: String) = reports(t).flatMap(_.evolvedColumns).mkString(",")
    def archivedFiles(t: String): Long = {
      val d = arch.resolve(t)
      if (java.nio.file.Files.isDirectory(d))
        java.nio.file.Files.list(d).count()
      else 0L
    }
    // archive moved every input out of the upload dir
    val leftover = Seq("metrics", "dims").map { t =>
      val st = java.nio.file.Files.list(up.resolve(t))
      try st.filter(p => p.toString.endsWith(".csv")).count()
      finally st.close()
    }.sum

    val metricsLake = Ingest.readLake(s, conf, "metrics")
    val dimsLake = Ingest.readLake(s, conf, "dims")

    // ---- JDBC landing on live Derby --------------------------------
    val url = s"jdbc:derby:memory:graft_e2e_$token;create=true"
    def jconf(table: String) = JdbcSink.Config(
      url = url, table = table, numPartitions = 2, batchSize = 100,
      driver = derbyDriver)
    JdbcSink.appendInto(metricsLake, jconf("METRICS"))
    // dims swap needs a live generation-1 table to replace
    JdbcSink.appendInto(Seq((0L, "seed")).toDF("id", "tag"), jconf("DIMS"))
    JdbcSink.loadStage(dimsLake, jconf("DIMS")) // GP DDL text-asserted in JdbcSinkSpec
    val cx = java.sql.DriverManager.getConnection(url)
    try {
      cx.setAutoCommit(false) // Derby's BEGIN
      val st = cx.createStatement()
      // unquoted: Spark's JDBC writer passed names through unquoted, so
      // Derby case-folded them to uppercase in its catalog
      st.execute("DROP TABLE DIMS")
      st.execute("RENAME TABLE DIMS__STAGE TO DIMS")
      cx.commit()
    } finally {
      try cx.rollback() catch { case _: Throwable => }
      cx.close()
    }
    def readBack(table: String) =
      s.read.format("jdbc").option("url", url)
        .option("dbtable", table).option("driver", derbyDriver).load()
    val jdbcMetrics = readBack("METRICS").count()
    val jdbcDims = readBack("DIMS").count()
    val dimsTags = readBack("DIMS").select(col("tag"))
      .orderBy(col("tag")).as[String].collect().mkString(",")

    Seq(
      ("dims", loadedTotal("dims"), rejectedTotal("dims"), evolved("dims"),
        dimsLake.count(), archivedFiles("dims"), leftover, jdbcDims,
        jdbcDims == dimsLake.count() && dimsTags == "added,new"),
      ("metrics", loadedTotal("metrics"), rejectedTotal("metrics"),
        evolved("metrics"), metricsLake.count(), archivedFiles("metrics"),
        leftover, jdbcMetrics, jdbcMetrics == metricsLake.count()))
      .toDF("table", "loaded", "rejected", "evolved_cols", "lake_rows",
        "archived_files", "upload_leftover", "jdbc_rows", "landed_ok")
      .orderBy(col("table"))
  }

  /** B3 round-trip: a real slice of lineitem through the batched
    * partition-parallel JDBC append and back, gated by LoadAudit's
    * (n, checksum) content parity — the audit a warehouse importer runs
    * after every batch, here executed against a live database rather
    * than a parquet round-trip (b1_load_audit's lake twin).
    */
  val jdbcRoundtrip: Q = Q.noOracle("b3_jdbc_roundtrip") { (s, d) =>
    import s.implicits._
    val token = freshToken()
    val url = s"jdbc:derby:memory:graft_rt_$token;create=true"
    val src = T.lineitem(s, d)
      .filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("lnum"),
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("double").as("qty"))
    JdbcSink.appendInto(src, JdbcSink.Config(
      url = url, table = "LINES", numPartitions = 4, batchSize = 500,
      driver = derbyDriver))
    val back = s.read.format("jdbc").option("url", url)
      .option("dbtable", "LINES").option("driver", derbyDriver).load()
    val a = LoadAudit.audit(src)
    val b = LoadAudit.audit(back)
    Seq((a.nRows, b.nRows, a.checksum == b.checksum,
        LoadAudit.verified(src, back)))
      .toDF("n_source", "n_jdbc", "checksum_match", "audit_verified")
  }

  /** B3 federation leg: the JDBC SOURCE with predicate pushdown and
    * partition-column parallelism — the reverse path a warehouse
    * importer needs when the warehouse is the source. The row loads a
    * slice into Derby, reads it back through `partitionColumn`-split
    * JDBC with a filter, and walks the EXECUTED plan (the
    * b5_runtime_bloom precedent) for the pushed predicate plus the
    * partition count — so the driver sees plan-level evidence, not just
    * rows.
    */
  val jdbcPushdown: Q = Q.noOracle("b3_jdbc_pushdown") { (s, d) =>
    import s.implicits._
    val token = freshToken()
    val url = s"jdbc:derby:memory:graft_pd_$token;create=true"
    val src = T.orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey").cast("long").as("okey"),
        col("o_custkey").cast("long").as("ckey"),
        col("o_orderstatus").as("status"))
    // pre-create with VARCHAR: Spark's DerbyDialect maps StringType to
    // CLOB, and Derby refuses CLOB = 'literal' comparisons — which would
    // make the pushed string predicate a runtime error instead of a
    // pushdown demonstration
    locally {
      val cx = java.sql.DriverManager.getConnection(url)
      try cx.createStatement().execute(
        "CREATE TABLE ORD (okey BIGINT, ckey BIGINT, status VARCHAR(4))")
      finally cx.close()
    }
    JdbcSink.appendInto(src, JdbcSink.Config(
      url = url, table = "ORD", numPartitions = 2, batchSize = 500,
      driver = derbyDriver))
    val part = s.read.format("jdbc")
      .option("url", url).option("dbtable", "ORD")
      .option("driver", derbyDriver)
      .option("partitionColumn", "okey")
      .option("lowerBound", "1").option("upperBound", "2000")
      .option("numPartitions", "4")
      .load()
      .filter(col("okey") <= 1500 && col("status") === "O")
    val n = part.count()
    val scan = part.queryExecution.executedPlan.toString()
    // DSv1 JDBC surfaces pushdown as RowDataSourceScanExec PushedFilters;
    // Derby case-folds unquoted identifiers, so match uppercase
    val pushed = scan.contains("PushedFilters:") &&
      scan.contains("LessThanOrEqual(OKEY,1500)") &&
      scan.contains("EqualTo(STATUS,O)")
    val nParts = part.rdd.getNumPartitions
    val expected = src.filter(col("okey") <= 1500 && col("status") === "O").count()
    Seq((n, expected, pushed, nParts.toLong))
      .toDF("n_rows", "n_expected", "filters_pushed", "n_read_partitions")
  }

  /** B18: persistent catalog lifecycle — saveAsTable into a per-run
    * database, insertInto appends through the CATALOG (not a path),
    * DESCRIBE-driven schema readback, and SHOW TABLES visibility; the
    * warehouse-engine surface temp views don't exercise. The database
    * is created and dropped per invocation (CASCADE) so concurrent or
    * repeated runs never collide in the shared spark-warehouse dir.
    */
  val catalogLifecycle: Q = Q.noOracle("b18_catalog_lifecycle") { (s, d) =>
    import s.implicits._
    val db = s"graft_cat_${freshToken()}"
    s.sql(s"CREATE DATABASE $db")
    try {
      val src = T.nation(s, d)
        .select(col("n_nationkey").cast("long").as("nkey"), col("n_name"))
      src.write.format("parquet").saveAsTable(s"$db.nations")
      // catalog-routed append: same table, via the metastore identifier
      src.limit(5).write.mode("append").insertInto(s"$db.nations")
      val described = s.sql(s"DESCRIBE TABLE $db.nations")
        .select(col("col_name"), col("data_type"))
        .collect().map(r => s"${r.getString(0)}:${r.getString(1)}")
        .mkString(",")
      val visible = s.sql(s"SHOW TABLES IN $db")
        .filter(col("tableName") === "nations").count() == 1
      val total = s.table(s"$db.nations").count()
      val base = src.count()
      Seq((total, base, total == base + 5, visible, described))
        .toDF("n_rows", "n_base", "append_ok", "catalog_visible", "described")
    } finally {
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  /** B7×B3: streaming micro-batches landed on a LIVE JDBC sink via
    * foreachBatch — the streaming-CDC-into-warehouse shape that
    * modernizes the reference's cron-tick file loop into a continuous
    * pipeline. A deterministic event slice arrives in three chunks
    * through MemoryStream; each micro-batch appends to embedded Derby
    * through the same partition-parallel JdbcSink the batch path uses;
    * the final table must carry exactly the input rows with LoadAudit
    * (n, checksum) parity. Temp dirs/DB names carry a per-invocation
    * token (the b5 idempotency lesson).
    */
  val streamJdbc: Q = Q.noOracle("b7_stream_jdbc") { (s, d) =>
    import s.implicits._
    val token = freshToken()
    val url = s"jdbc:derby:memory:graft_sj_$token;create=true"
    // deterministic ~2.5% slice keeps real multi-batch state without
    // dominating Verify/Bench time (the b13 sizing argument)
    val slice = T.events(s, d).select(col("event_id"), col("event_type"))
      .filter(col("event_id") % 40 === 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val chunks = (0L to 2L).map(i => slice.filter(t => (t._1 / 40) % 3 == i))
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_sj_ckpt_$token").toString
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = mem.toDS().toDF("event_id", "event_type")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        JdbcSink.appendInto(batch.toDF(), JdbcSink.Config(
          url = url, table = "EVENTS_LANDED", numPartitions = 2,
          batchSize = 500, driver = derbyDriver))
        nBatches.incrementAndGet()
        ()
      }
      .start()
    try chunks.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
    finally q.stop()
    val back = s.read.format("jdbc").option("url", url)
      .option("dbtable", "EVENTS_LANDED").option("driver", derbyDriver).load()
    val src = slice.toIndexedSeq.toDF("event_id", "event_type")
    val a = LoadAudit.audit(src)
    val b = LoadAudit.audit(back)
    Seq((a.nRows, nBatches.get().toLong, b.nRows,
        b.nRows == a.nRows && a.checksum == b.checksum))
      .toDF("n_input", "n_batches", "n_jdbc", "landed_ok")
  }

  val all: Seq[Q] = Seq(ingestE2e, jdbcRoundtrip, jdbcPushdown, catalogLifecycle,
    streamJdbc)
}
