package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSpec, Tables => T}

/** JSON-lines source round trip — the third source format (after
  * parquet and CSV): schema-declared read, corrupt-line tolerance, and
  * from_json on nested payloads.
  */
class JsonSourceSpec extends SparkSpec {

  test("json lines round-trip with declared schema and corrupt-record capture") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"id": 1, "v": 2.5, "tags": ["x", "y"]}
        |{"id": 2, "v": 7.25, "tags": []}
        |{not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("_corrupt", StringType)))
    val df = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt").json(s"$dir/*.jsonl")
      .cache()
    assert(df.filter(col("_corrupt").isNull).count() == 2)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    val r = df.filter(col("id") === 1).collect().head
    assert(r.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("x", "y"))
  }

  test("from_json parses the events props payload into a typed struct") {
    val parsed = T.events(spark, sf())
      .withColumn("p", from_json(col("props"), StructType(Seq(
        StructField("k", IntegerType)))))
      .select(col("p.k"))
    assert(parsed.filter(col("k").isNull).count() == 0)
    val bounds = parsed.agg(min("k"), max("k")).collect().head
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) <= 99)
  }
}
