package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface; each entry has (where
  * SQL-expressible) a DuckDB oracle in `oracleSql` with IDENTICAL output
  * column names. Queries aggregate from the per-package modules.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star join: broadcast dims, shuffled fact joins, exact decimal
    * revenue aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_multijoin_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.DataOps.queries ++
      operators.EtlQueries.queries ++ operators.Multimodal.queries ++
      operators.Advanced.queries ++ operators.ReferenceQueries.queries ++
      operators.Extended.queries ++ operators.SqlSurface.queries ++
      operators.Cdc.queries ++ operators.Analytics.queries ++
      operators.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++ operators.DataOps.oracleSql ++
      operators.EtlQueries.oracleSql ++ operators.Multimodal.oracleSql ++
      operators.Advanced.oracleSql ++ operators.ReferenceQueries.oracleSql ++
      operators.Extended.oracleSql ++ operators.SqlSurface.oracleSql ++
      operators.Cdc.oracleSql ++ operators.Analytics.oracleSql ++
      operators.Graph.oracleSql
}
