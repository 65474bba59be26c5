package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's inventory; `oracleSql` holds
  * the DuckDB-runnable twin for each hash-compared key (SURVEY.md §2.2/§2.3).
  * Keys absent from `oracleSql` get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed training-corpus pipeline — dedup (exact + MinHash-LSH),
    * quality gate, stable split — is the engine's north-star shape.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline_corpus")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
    operators.WindowQueries.queries ++
    operators.GroupingQueries.queries ++
    operators.FunctionQueries.queries ++
    operators.EventTimeQueries.queries ++
    operators.TextQueries.queries ++
    operators.SimilarityQueries.queries ++
    operators.DedupQueries.queries ++
    operators.Sbs1Queries.queries ++
    operators.MultimodalQueries.queries ++
    operators.StatsQueries.queries ++
    operators.RangePivotQueries.queries ++
    operators.SamplingQueries.queries ++
    operators.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracles ++
    operators.WindowQueries.oracles ++
    operators.GroupingQueries.oracles ++
    operators.FunctionQueries.oracles ++
    operators.EventTimeQueries.oracles ++
    operators.TextQueries.oracles ++
    operators.SimilarityQueries.oracles ++
    operators.DedupQueries.oracles ++
    operators.Sbs1Queries.oracles ++
    operators.MultimodalQueries.oracles ++
    operators.StatsQueries.oracles ++
    operators.RangePivotQueries.oracles ++
    operators.SamplingQueries.oracles ++
    operators.PipelineQueries.oracles
}
