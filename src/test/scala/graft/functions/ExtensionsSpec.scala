package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

/** The extensions class must make the kernels resolvable from SQL text
  * in a session built with withExtensions — the deployment path a
  * cluster uses via spark.sql.extensions.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_vec_dot/graft_vec_ssq into a new session") {
    val base = spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                     array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       graft_vec_ssq(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS s
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 25.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
