package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregate registry: every implemented operator from SURVEY.md §2 gets a
  * named query here and (when SQL-expressible) a DuckDB oracle keyed
  * identically. `SparkEntry` delegates to this object.
  */
object Queries {
  def all: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CoverageQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ ExtendedQueries.queries ++
      AnalyticsQueries.queries ++ FunctionQueries.queries ++
      TemporalQueries.queries ++ AvroQueries.queries ++
      RetrievalQueries.queries ++ LayoutQueries.queries ++
      SamplingQueries.queries ++ GraphQueries.queries ++ MixQueries.queries ++
      MaintenanceQueries.queries ++ TpchQueries.queries

  def oracles: Map[String, String] =
    RelationalQueries.oracles ++ CoverageQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ ExtendedQueries.oracles ++
      AnalyticsQueries.oracles ++ FunctionQueries.oracles ++
      TemporalQueries.oracles ++ AvroQueries.oracles ++
      RetrievalQueries.oracles ++ LayoutQueries.oracles ++
      SamplingQueries.oracles ++ GraphQueries.oracles ++ MixQueries.oracles ++
      MaintenanceQueries.oracles ++ TpchQueries.oracles
}
