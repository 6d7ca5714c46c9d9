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

  test("native vector expressions are null-safe") {
    Graft.registerTables(spark, sf())
    val r = spark.sql(
      """SELECT graft_vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d,
        |       graft_vec_ssq(CAST(NULL AS ARRAY<FLOAT>)) AS s,
        |       graft_vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(9.0 AS FLOAT))) AS uneven""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == 3.0) // min-length semantics on uneven input
  }

  test("events view exposes normalized microsecond timestamps") {
    Graft.registerTables(spark, sf())
    val t = spark.sql("SELECT typeof(ts) FROM events LIMIT 1")
      .collect().head.getString(0)
    assert(t == "timestamp")
  }
}
