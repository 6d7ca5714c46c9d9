package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {

  private val a = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))
  private val b = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("added", DoubleType)))

  test("evolve appends new columns, keeps target order and types") {
    val e = SchemaEvolution.evolve(a, b)
    assert(e.fieldNames.toSeq == Seq("id", "name", "added"))
    assert(e("added").dataType == DoubleType)
  }

  test("evolve never retypes an existing column") {
    val retyped = StructType(Seq(StructField("id", StringType)))
    val e = SchemaEvolution.evolve(a, retyped)
    assert(e("id").dataType == LongType) // target wins
  }

  test("evolve is idempotent and monotonic") {
    val e1 = SchemaEvolution.evolve(a, b)
    assert(SchemaEvolution.evolve(e1, b) == e1)
    assert(SchemaEvolution.isMonotonic(a, e1))
    assert(SchemaEvolution.isMonotonic(b, SchemaEvolution.evolve(b, a)))
  }

  test("align adds typed nulls and projects in schema order") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "x")),
      a)
    val aligned = SchemaEvolution.align(df, SchemaEvolution.evolve(a, b))
    assert(aligned.columns.toSeq == Seq("id", "name", "added"))
    val r = aligned.collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(2))
  }

  test("unionEvolved holds both sides' rows under the union schema") {
    val d1 = spark.createDataFrame(java.util.List.of(Row(1L, "x")), a)
    val d2 = spark.createDataFrame(java.util.List.of(Row(2L, "y", 3.5)), b)
    val u = SchemaEvolution.unionEvolved(d1, d2)
    assert(u.count() == 2)
    assert(u.columns.toSeq == Seq("id", "name", "added"))
  }

  private val fieldGen: Gen[StructField] = for {
    n <- Gen.oneOf("c1", "c2", "c3", "c4", "c5", "c6")
    t <- Gen.oneOf[DataType](LongType, StringType, DoubleType, BooleanType)
  } yield StructField(n, t)

  private val schemaGen: Gen[StructType] =
    Gen.listOfN(4, fieldGen).map(fs =>
      StructType(fs.groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name)))

  test("property: evolve(a,b) contains every column of a and of b") {
    val pairs = Gen.listOfN(200, Gen.zip(schemaGen, schemaGen))
      .apply(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    assert(pairs.nonEmpty)
    pairs.foreach { case (x, y) =>
      val e = SchemaEvolution.evolve(x, y)
      val names = e.fieldNames.map(_.toLowerCase).toSet
      assert(SchemaEvolution.isMonotonic(x, e), s"not monotonic: $x + $y -> $e")
      assert(y.fieldNames.forall(n => names.contains(n.toLowerCase)),
        s"lost incoming column: $x + $y -> $e")
    }
  }
}
