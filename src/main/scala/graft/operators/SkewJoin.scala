package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md / driver mandate:
  * "salting for skew"). AQE's skew-join split handles most cases at
  * runtime; explicit salting remains necessary when one key dominates so
  * hard that even split partitions hot-spot, or when AQE is off (e.g.
  * inside some streaming joins).
  *
  * Left side: each row gets a deterministic salt in [0, n) derived from
  * a uniform column hash (no rand() — D4: results must be reproducible).
  * Right side: replicated n× with every salt value. The join key becomes
  * (key, salt), spreading a hot key over n reducers.
  */
object SkewJoin {

  /** Deterministic inner equi-join resilient to left-side key skew. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      numSalts: Int): DataFrame = {
    require(numSalts > 0)
    // salt from a hash of the WHOLE left row (not the key — all copies
    // of a hot key must spread, and hash(key) alone would send them to
    // one salt). xxhash64 is deterministic across runs and executors.
    val salted = left.withColumn("_graft_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(numSalts)))
    val replicated = right
      .withColumn("_graft_salt", explode(sequence(lit(0), lit(numSalts - 1))))
      .withColumn("_graft_salt", col("_graft_salt").cast("long"))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey)
          && salted("_graft_salt") === replicated("_graft_salt"))
      .drop("_graft_salt")
  }
}
