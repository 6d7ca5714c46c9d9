package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a SKEW-injected copy of an sf dir: every foreign-key
  * column a real pipeline shuffles on is remapped so one "hot" key
  * owns `hotFrac` (default 0.3) of the rows — the heavy-hitter shape
  * (one viral user, one megacorp customer) that breaks naive shuffles
  * at 100 TB. Decided by a DETERMINISTIC md5-uniform of the row's
  * primary key, so both engines read identical files and the DuckDB
  * differential still gates answers; primary keys, row counts and
  * non-key columns are untouched, so join topology stays valid (the
  * hot key is each table's MIN existing key — never a dangling FK).
  *
  * Remapped: orders.o_custkey, lineitem.l_suppkey, lineitem.l_partkey,
  * events.user_id. Everything else verbatim.
  *
  * Usage: tools/run.sh graft.SkewUp <srcSfDir> <outDir> [hotFracPct]
  */
object SkewUp {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.SkewUp <srcSfDir> <outDir> [hotFracPct]")
      sys.exit(2)
    }
    val src = args(0); val out = args(1)
    val hotPct = if (args.length > 2) args(2).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      import java.nio.file.{Files, Paths}
      val stage = s"$out/_stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      require(part.length == 1, s"$name: expected one part file")
      Files.createDirectories(Paths.get(out))
      Files.move(Paths.get(part.head), Paths.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
      println(s"[skewup] $name done")
    }
    // md5-uniform of (salt, pk) < hotPct/100 → row joins the hot key
    def hot(pkCol: String, salt: String) =
      expr(s"CAST(conv(substring(md5(concat('$salt', CAST($pkCol AS STRING))), 1, 8), 16, 10) AS BIGINT)") <
        lit((hotPct / 100.0 * 4294967296.0).toLong)
    def minOf(df: DataFrame, c: String): Long =
      df.agg(min(col(c).cast("long"))).head().getLong(0)

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    write(Tables.documents(spark, src), "documents")
    write(spark.read.parquet(s"$src/embeddings.parquet"), "embeddings")

    val orders = Tables.orders(spark, src)
    val hotCust = minOf(orders, "o_custkey")
    write(orders.withColumn("o_custkey",
      when(hot("o_orderkey", "cust"), lit(hotCust)).otherwise(col("o_custkey"))),
      "orders")

    val li = Tables.lineitem(spark, src)
    val hotSupp = minOf(li, "l_suppkey")
    val hotPart = minOf(li, "l_partkey")
    // the lineitem PK is (orderkey, linenumber-ish position); orderkey +
    // partkey disambiguates enough for a deterministic per-row uniform.
    // Both hot flags are computed from the ORIGINAL columns BEFORE either
    // remap (ADVICE r11: chained withColumns made the partkey decision
    // read the already-remapped suppkey, so for the hot slice it
    // collapsed to hash(orderkey, hotSupp) — correlated, not uniform)
    write(li
      .withColumn("_hot_supp", hot("concat(l_orderkey, '_', l_partkey)", "supp"))
      .withColumn("_hot_part", hot("concat(l_orderkey, '_', l_suppkey)", "part"))
      .withColumn("l_suppkey",
        when(col("_hot_supp"), lit(hotSupp)).otherwise(col("l_suppkey")))
      .withColumn("l_partkey",
        when(col("_hot_part"), lit(hotPart)).otherwise(col("l_partkey")))
      .drop("_hot_supp", "_hot_part"),
      "lineitem")

    val ev = Tables.events(spark, src)
    val hotUser = minOf(ev, "user_id")
    write(ev.withColumn("user_id",
      when(hot("event_id", "user"), lit(hotUser)).otherwise(col("user_id"))),
      "events")

    println(s"[skewup] done: hot keys cust=$hotCust supp=$hotSupp part=$hotPart user=$hotUser at $hotPct%")
    spark.stop()
  }
}
