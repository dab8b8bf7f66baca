package graft

import graft.queries._

/** Central registry of every implemented operator/query. SparkEntry
  * derives the driver-facing maps from this single sequence so a query
  * and its oracle can never drift apart.
  */
object Registry {
  def queries: Seq[QueryDef] =
    RelationalQueries.all ++
    WindowQueries.all ++
    GroupingQueries.all ++
    ScalarQueries.all ++
    TextQueries.all ++
    TextAnalysisQueries.all ++
    HygieneQueries.all ++
    DedupQueries.all ++
    SimilarityQueries.all ++
    TemporalQueries.all ++
    AggregatorQueries.all ++
    MultimodalQueries.all ++
    UdxQueries.all ++
    SkewQueries.all ++
    SamplingQueries.all ++
    CurationQueries.all ++
    VersioningQueries.all ++
    GraphQueries.all ++
    MiningQueries.all ++
    StatisticsQueries.all ++
    RetrievalQueries.all ++
    AnnotationQueries.all ++
    SqlQueries.all ++
    UrlQueries.all

  def byName: Map[String, QueryDef] = queries.map(q => q.name -> q).toMap
}
