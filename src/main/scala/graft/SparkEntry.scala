package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{JoinQueries, MultimodalQueries, QueryDef, RelationalQueries, StreamingQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query; SQL-expressible ones carry a
  * DuckDB oracle that must hash-match the Spark result.
  */
object SparkEntry {

  /** All registered operator queries, in declaration order. */
  def queryDefs: Seq[QueryDef] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      MultimodalQueries.all ++ StreamingQueries.all ++ JoinQueries.all ++
      GngQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
