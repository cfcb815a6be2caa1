package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedJoinQueries, ConnectorQueries, DedupQueries,
  GraphQueries, MultimodalQueries, PipelineQueries, RelationalQueries,
  SimilarityQueries, StatQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names (SURVEY.md §2) to functions
  * `(spark, sfDir) => DataFrame`; `oracleSql` holds the DuckDB-runnable
  * ANSI SQL equivalent for each SQL-expressible query. Column names are
  * aligned between the two on purpose — the driver's comparator sorts
  * columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q05NationRevenue(spark, "/root/testdata/sf0.001")

  private def registry: Map[String, ((SparkSession, String) => DataFrame, String)] =
    RelationalQueries.all ++ ConnectorQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      PipelineQueries.all ++ AdvancedJoinQueries.all ++ StatQueries.all ++
      GraphQueries.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, (fn, _)) => name -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, (_, sql)) if sql != null => name -> sql }
}
