package graft.queries

import graft.Q

/** Assembles the full declared-query inventory (SURVEY.md §2A + the
  * no-oracle §2B rows that still run as queries).
  */
object Registry {
  def all: Seq[Q] =
    Scans.all ++ Joins.all ++ Aggregates.all ++ WindowsQ.all ++
      SortSetOps.all ++ Functions.all ++ Reshape.all ++ LlmOps.all ++
      StreamingBatch.all ++ LlmOpsExt.all ++ LlmOpsAnn.all ++ AggregatesExt.all ++
      MiscOps.all ++ NoOracle.all
}
