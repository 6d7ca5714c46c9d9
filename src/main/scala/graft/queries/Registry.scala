package graft.queries

import graft.Q

/** Assembles the full declared-query inventory (SURVEY.md §2A + the
  * no-oracle §2B rows that still run as queries).
  */
object Registry {
  def all: Seq[Q] = {
    val qs =
      Scans.all ++ Joins.all ++ Aggregates.all ++ WindowsQ.all ++
        SortSetOps.all ++ Functions.all ++ Reshape.all ++ LlmOps.all ++
        StreamingBatch.all ++ LlmOpsExt.all ++ LlmOpsAnn.all ++ AggregatesExt.all ++
        MiscOps.all ++ LlmOpsCurate.all ++ LlmOpsPipeline.all ++ TpchShapes.all ++ TpchShapes2.all ++
        TimeSeriesOps.all ++ LlmOpsAnalytics.all ++ CdcOps.all ++ CorpusOps.all ++
        QualityOps.all ++ PatternOps.all ++ StatsOps.all ++ SegmentOps.all ++
        GraphQ.all ++ AnnPq.all ++ NoOracle.all ++ IngestE2e.all ++ StatsExt.all ++
        Stats2.all ++ Stats3.all ++ FeatureOps.all ++ RankOps.all ++ Stats4.all ++
        NoOracle2.all ++ Stats5.all ++ CorpusOps2.all ++ MixedOps2.all ++
        MiscOps2.all ++ CurateOps2.all ++ AnalyticsOps2.all ++ IngestExtra.all ++
        TimeSeriesOps3.all ++ Stats6.all ++ CurateOps3.all ++ Stats7.all ++
        TimeSeriesOps4.all ++ CorpusOps3.all ++ GraphQ2.all ++ NoOracle3.all ++
        MiscOps3.all ++ NoOracle4.all ++ SurfaceOps.all ++ CurateOps4.all ++
        FeatureOps2.all ++ SurfaceOps2.all ++ SurfaceOps3.all ++
        TimeSeriesOps5.all ++ GraphQ3.all ++ CurateOps5.all ++
        SurfaceOps4.all ++ NoOracle5.all ++ TimeSeriesOps6.all ++ EvalOps.all ++
        BpeOps.all ++ HtmlOps.all ++ MultimodalDedup.all ++ TimeTravel.all ++ AnnIvfPq.all ++
        CurateOps6.all ++ GraphQ4.all ++ CurateOps7.all ++ QualityOps2.all ++ GraphQ5.all ++
        CurateOps8.all ++ CorpusOps4.all ++ Stats8.all ++
        CurateOps9.all ++ RetrievalOps.all ++ CorpusOps5.all
    // a duplicate key would silently shadow a query in SparkEntry's Map
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }
}
