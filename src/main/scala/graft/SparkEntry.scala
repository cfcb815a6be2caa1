package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.RelationalQueries

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all.map { case (name, (fn, _)) => name -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.all.map { case (name, (_, sql)) => name -> sql }
}
