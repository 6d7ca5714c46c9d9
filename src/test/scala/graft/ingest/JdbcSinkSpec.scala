package graft.ingest

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** B3/B4 pure logic (no database offline — SURVEY.md §7.2 #6). */
class JdbcSinkSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("bal", DecimalType(18, 2)),
    StructField("at", TimestampType)))

  test("writeOptions bound parallelism and batch size") {
    val o = JdbcSink.writeOptions(JdbcSink.Config(
      url = "jdbc:postgresql://gp-master:5432/insight", table = "samples"))
    assert(o("batchsize") == "10000")
    assert(o("numPartitions") == "8")
    assert(o("driver") == "org.postgresql.Driver")
  }

  test("createTableDdl renders Greenplum types") {
    val ddl = JdbcSink.createTableDdl("samples", schema)
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS "samples" ("id" bigint, "name" text, "bal" numeric(18,2), "at" timestamp without time zone)""")
  }

  test("alterAddColumnsDdl is add-only") {
    val live = StructType(schema.fields.take(2))
    val ddls = JdbcSink.alterAddColumnsDdl("samples", live, schema)
    assert(ddls == Seq(
      """ALTER TABLE "samples" ADD COLUMN "bal" numeric(18,2)""",
      """ALTER TABLE "samples" ADD COLUMN "at" timestamp without time zone"""))
    // shrinking the incoming schema must produce no DDL at all
    assert(JdbcSink.alterAddColumnsDdl("samples", schema, live).isEmpty)
  }

  test("stage-and-swap is a single transaction ending in a rename") {
    val ddls = JdbcSink.stageSwapDdl("samples", schema)
    assert(ddls.head == "BEGIN" && ddls.last == "COMMIT")
    assert(ddls.contains("""ALTER TABLE "samples__stage" RENAME TO "samples""""))
  }
}
