package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content checksum for load verification — the operational audit a
  * warehouse importer runs after every batch: prove the rows that
  * landed in the lake are EXACTLY the rows the source parsed (no
  * silent truncation, duplication, or re-type on the way through a
  * sink/round-trip).
  *
  * The checksum is bit_xor over per-row xxhash64 of every column in
  * name order — order-INDEPENDENT (rows arrive in any partition
  * order), distributed (partial-aggregable, one scalar out), and
  * type-sensitive (xxhash64 hashes the typed value, so a silent
  * long→string re-type changes the sum). XOR's known blind spot —
  * an even number of identical duplicate rows cancels out — is
  * covered by comparing row COUNTS alongside (the audit compares
  * (n, checksum) pairs, never the checksum alone).
  *
  * Null discrimination: xxhash64 passes the running hash through
  * UNCHANGED for a null input, so hashing bare columns would give
  * (null,'a') and ('a',null) identical row hashes — a load that
  * shifted a value across nullable columns would verify. Each column
  * is therefore hashed as struct(isNull, value): the non-null boolean
  * always advances the hash, making the null POSITION part of the
  * checksum.
  */
object LoadAudit {

  final case class Audit(nRows: Long, checksum: Long)

  def audit(df: DataFrame): Audit = {
    val cols = df.columns.sorted
      .map(c => struct(col(c).isNull, col(c)))
      .toIndexedSeq
    val row = df
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(cols: _*)), lit(0L)).as("cs"))
      .head()
    Audit(row.getLong(0), row.getLong(1))
  }

  /** True iff `landed` holds exactly the content of `source`. */
  def verified(source: DataFrame, landed: DataFrame): Boolean =
    audit(source) == audit(landed)

  /** Per-group audit pairs in ONE grouped pass — the partition-level
    * variant (B17's per-partition reload verification): the key column
    * is excluded from the hash so a row's audit is invariant to which
    * partition directory it lands in. The map key is the group value's
    * string form (any key type works, not just string columns); a null
    * group key maps to "<null>" rather than NPE-ing the lookup.
    */
  def auditBy(df: DataFrame, key: String): Map[String, Audit] = {
    val cols = df.columns.sorted.filter(_ != key)
      .map(c => struct(col(c).isNull, col(c))).toIndexedSeq
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        coalesce(bit_xor(xxhash64(cols: _*)), lit(0L)).as("cs"))
      .collect()
      .map(r => Option(r.get(0)).map(_.toString).getOrElse("<null>")
        -> Audit(r.getLong(1), r.getLong(2)))
      .toMap
  }
}
