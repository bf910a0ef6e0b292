package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pop_top100")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.AnalyticsQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql
}
