package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline extensions) is registered here as a
  * `(SparkSession, sfDir) => DataFrame`, with DuckDB oracle SQL where
  * the semantics are ANSI-expressible.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ ExtensionQueries.all ++ WindowQueries.all ++
      FunctionQueries.all ++ PipelineQueries.all ++ ScaleQueries.all ++
      TrainingQueries.all ++ CorpusQueries.all ++ MiningQueries.all ++
      RecommendQueries.all ++ SqlQueries.all ++ EvalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
