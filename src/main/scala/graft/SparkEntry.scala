package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_star_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.all ++
      graft.queries.StarQueries.all ++
      graft.queries.MergeQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.ExtensionQueries.all ++
      graft.queries.EventQueries.all ++
      graft.queries.AdvancedQueries.all ++
      graft.queries.TpchExtraQueries.all ++
      graft.queries.ReshapeQueries.all ++
      graft.queries.SqlDmlQueries.all ++
      graft.queries.BpeQueries.all ++
      graft.queries.ClassifierQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.StarQueries.oracles ++
      graft.queries.MergeQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ExtensionQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.AdvancedQueries.oracles ++
      graft.queries.TpchExtraQueries.oracles ++
      graft.queries.ReshapeQueries.oracles ++
      graft.queries.SqlDmlQueries.oracles ++
      graft.queries.BpeQueries.oracles ++
      graft.queries.ClassifierQueries.oracles
}
