package graft

/** Prints the declared-query inventory, one `key<TAB>oracle|no_oracle`
  * line per query — the machine-readable side of SURVEY.md §2 that
  * `tools/key_diff.py` compares against the document (VERDICT r8
  * item 7: the contract document and the Registry must not drift).
  * No SparkSession needed: the inventory is static.
  */
object Keys {
  def main(args: Array[String]): Unit =
    SparkEntry.declared.sortBy(_.name).foreach { q =>
      println(s"${q.name}\t${if (q.oracle.isDefined) "oracle" else "no_oracle"}")
    }
}
