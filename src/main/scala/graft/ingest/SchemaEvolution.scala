package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructField, StructType}

/** Add-only schema evolution (SURVEY.md §1.1 — the reference's most
  * distinctive data-model feature): new columns are appended, existing
  * columns are never dropped or retyped.
  */
object SchemaEvolution {

  /** Evolved schema = target plus any columns that only the incoming
    * batch has, appended in incoming order. A column present in both
    * keeps the TARGET's type (no retyping — a type change in an upload
    * is a producer bug, not a migration).
    */
  def evolve(target: StructType, incoming: StructType): StructType = {
    val existing = target.fieldNames.map(_.toLowerCase).toSet
    val added = incoming.fields.filterNot(f => existing.contains(f.name.toLowerCase))
    StructType(target.fields ++ added.map(_.copy(nullable = true)))
  }

  /** Conform a frame to the evolved schema: add missing columns as typed
    * nulls, cast nothing else, project in schema order. Safe to feed to
    * unionByName afterwards.
    */
  def align(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.map(_.toLowerCase).toSet
    val withAll = schema.fields.foldLeft(df) { (acc, f) =>
      if (have.contains(f.name.toLowerCase)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withAll.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Append-class union of batches under the evolved schema. */
  def unionEvolved(target: DataFrame, incoming: DataFrame): DataFrame = {
    val evolved = evolve(target.schema, incoming.schema)
    align(target, evolved).unionByName(align(incoming, evolved))
  }

  /** True iff every target column survives in `evolved` with its type. */
  def isMonotonic(target: StructType, evolved: StructType): Boolean = {
    val byName = evolved.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    target.fields.forall(f => byName.get(f.name.toLowerCase).contains(f.dataType))
  }
}
