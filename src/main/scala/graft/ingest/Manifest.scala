package graft.ingest

import org.apache.spark.sql.types._

/** Column-manifest sidecar parsing (SURVEY.md §1.1): each upload batch
  * ships `name,type` lines with PostgreSQL-ish type names; the importer
  * derives the Spark schema from them. Types map per SURVEY §1.2.
  */
object Manifest {

  /** PostgreSQL-ish type name → Spark type. Unknown types land as
    * StringType (never fail a load on an unknown type — the reference's
    * tolerance posture).
    */
  def sparkType(pg: String): DataType = pg.trim.toLowerCase match {
    case "text" | "varchar" | "character varying" => StringType
    case "integer" | "int" | "int4"               => IntegerType
    case "bigint" | "int8"                        => LongType
    case "double precision" | "float8"            => DoubleType
    case "real" | "float4"                        => FloatType
    case "numeric" | "decimal"                    => DecimalType(18, 4)
    case "boolean" | "bool"                       => BooleanType
    case "timestamp" | "timestamp without time zone" => TimestampType
    case "date"                                   => DateType
    case _                                        => StringType
  }

  /** Parse manifest text: one `name,pg_type` per line; blank lines and
    * `#` comments ignored. All columns nullable (CSV-sourced).
    */
  def parse(text: String): StructType =
    StructType(
      text.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          val (name, pg) = line.span(_ != ',')
          StructField(name.trim, sparkType(pg.drop(1)), nullable = true)
        }
        .toSeq)
}
