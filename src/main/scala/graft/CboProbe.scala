package graft

import org.apache.spark.sql.SparkSession

/** CBO / ANALYZE evidence probe (VERDICT r6 #6): registers the TPC-H
  * tables as external parquet catalog tables, computes full column
  * stats, and measures tpch_q8/q9-shaped SQL (no manual broadcast
  * hints — the optimizer must choose) under three regimes:
  *   base     — CBO off (the repo default: AQE + defaults)
  *   cbo      — spark.sql.cbo.enabled=true
  *   cbo+reo  — CBO + cost-based join reorder
  * Prints per-regime median-of-3 timings and the scan order of the
  * physical join tree so BASELINE.md §cbo can record the join-order
  * delta (a measured negative is a valid result).
  *
  * Usage: graft.CboProbe <sfDir>
  */
object CboProbe {

  private val q8 =
    """SELECT o_year,
      |       CAST(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0.0 END) AS DOUBLE)
      |         / CAST(sum(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT year(o_orderdate) AS o_year,
      |         l_extendedprice * (1 - l_discount) AS volume,
      |         n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= DATE '1996-01-01'
      |    AND o_orderdate <= DATE '1997-12-31'
      |) t
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  private val q9 =
    """SELECT nation, o_year, sum(amount) AS sum_profit FROM (
      |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |         l_extendedprice * (1 - l_discount)
      |           - p_retailprice * l_quantity AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%7%'
      |) t GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = "graft_cbo"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(s"USE $db")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    tables.foreach { t =>
      spark.sql(s"""CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'""")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    println("[stats] " + tables.map { t =>
      val n = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
        .filter("col_name = 'Statistics'").collect()
        .headOption.map(_.getString(1)).getOrElse("?")
      s"$t=$n"
    }.mkString(" "))

    def scanOrder(plan: String): String = {
      val re = raw"FileScan parquet [^\[\s]*\.([a-z0-9_]+)\[".r
      re.findAllMatchIn(plan).map(_.group(1)).mkString(" -> ")
    }
    // q8 with the timestamp filter pre-wrapped in a date cast: CBO's
    // FilterEstimation (Spark 4.1) MatchErrors on a raw TimestampNTZ
    // attribute <op> literal — the cast routes it to default selectivity
    val q8cast = q8.replace("o_orderdate >=", "CAST(o_orderdate AS DATE) >=")
      .replace("o_orderdate <=", "CAST(o_orderdate AS DATE) <=")
    def run(label: String, confs: Map[String, String]): Unit = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      Seq("q8" -> q8, "q8_datecast" -> q8cast, "q9" -> q9).foreach {
        case (name, sql) =>
          try {
            val times = (1 to 3).map { _ =>
              spark.sqlContext.clearCache()
              val t0 = System.nanoTime()
              spark.sql(sql).collect()
              (System.nanoTime() - t0) / 1e9
            }.sorted
            val order = scanOrder(spark.sql(sql).queryExecution.executedPlan.toString())
            println(f"[$label] $name median=${times(1)}%.2f s  scans: $order")
          } catch {
            case e: Throwable =>
              var root = e; while (root.getCause != null) root = root.getCause
              println(s"[$label] $name FAILED: ${root.toString.linesIterator.next()}")
          }
      }
    }
    run("base", Map("spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false"))
    run("cbo", Map("spark.sql.cbo.enabled" -> "true"))
    run("cbo+reorder", Map("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true"))
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.stop()
  }
}
