package graft

/** The SQL entry point: arbitrary user SQL over the registered corpus,
  * including the natively-registered vector functions.
  */
class GraftSqlSpec extends SparkSpec {

  test("registerTables exposes all ten tables to spark.sql") {
    Graft.registerTables(spark, sf())
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().head.getLong(0)
    assert(n > 0)
  }

  test("native vector functions are callable from SQL") {
    val r = Graft.sql(spark, sf(),
      """SELECT vec_id,
        |       round(graft_vec_dot(embedding, embedding), 4) AS ss,
        |       round(graft_vec_ssq(embedding), 4) AS ss2
        |FROM embeddings WHERE vec_id < 3 ORDER BY vec_id""".stripMargin)
      .collect()
    assert(r.length == 3)
    r.foreach(row => assert(row.getDouble(1) == row.getDouble(2)))
  }

  test("events view exposes normalized microsecond timestamps") {
    Graft.registerTables(spark, sf())
    val t = spark.sql("SELECT typeof(ts) FROM events LIMIT 1")
      .collect().head.getString(0)
    assert(t == "timestamp")
  }
}
