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
      // the injected planner strategy must plan the custom TopK node in
      // this session WITHOUT the experimental-hook registration path
      import s2.implicits._
      val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 7L), ("b", 4L, 1L))
        .toDF("k", "id", "v")
      val plan = graft.plans.TopKPerKeyPlan(
        Seq(df.queryExecution.analyzed.output(0)),
        df.queryExecution.analyzed.output(2),
        df.queryExecution.analyzed.output(1),
        1, df.queryExecution.analyzed)
      val top = org.apache.spark.sql.GraftPlanShims.ofRows(s2, plan).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(top == Seq(("a", 2L), ("b", 4L)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
