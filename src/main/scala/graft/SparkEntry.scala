package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2B is one entry in `queries`
  * (name → (session, sfDir) => DataFrame) with, where SQL-expressible,
  * a DuckDB oracle in `oracleSql`. Queries are contributed by the
  * per-category modules under graft.operators / graft.functions /
  * graft.streaming.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.AggQueries.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.ScanQueries.queries ++
      operators.AggQueries.queries ++
      operators.JoinQueries.queries ++
      operators.WindowQueries.queries ++
      operators.SortSetQueries.queries ++
      functions.ScalarQueries.queries ++
      streaming.StreamQueries.queries ++
      operators.InferenceQueries.queries ++
      operators.DedupQueries.queries ++
      operators.SimilarityQueries.queries ++
      operators.TextQueries.queries ++
      operators.MultimodalQueries.queries ++
      operators.SampleQueries.queries ++
      operators.GraphQueries.queries ++
      operators.RecursiveQueries.queries ++
      operators.SubqueryQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.ScanQueries.oracleSql ++
      operators.AggQueries.oracleSql ++
      operators.JoinQueries.oracleSql ++
      operators.WindowQueries.oracleSql ++
      operators.SortSetQueries.oracleSql ++
      functions.ScalarQueries.oracleSql ++
      streaming.StreamQueries.oracleSql ++
      operators.InferenceQueries.oracleSql ++
      operators.DedupQueries.oracleSql ++
      operators.SimilarityQueries.oracleSql ++
      operators.TextQueries.oracleSql ++
      operators.MultimodalQueries.oracleSql ++
      operators.SampleQueries.oracleSql ++
      operators.GraphQueries.oracleSql ++
      operators.RecursiveQueries.oracleSql ++
      operators.SubqueryQueries.oracleSql
}
