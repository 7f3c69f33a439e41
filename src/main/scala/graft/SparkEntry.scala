package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one key per implemented operator from SURVEY.md §2 to a
  * DataFrame program over the fixture dir; `oracleSql` carries the DuckDB
  * equivalent the driver hash-compares against (BASELINE.md t2).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_lineitem_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RelationalQueries2.queries ++
      RelationalQueries3.queries ++ RelationalQueries4.queries ++
      DedupQueries.queries ++ TextQueries.queries ++ VectorQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ RelationalQueries2.oracle ++
      RelationalQueries3.oracle ++ RelationalQueries4.oracle ++
      DedupQueries.oracle ++ TextQueries.oracle ++ VectorQueries.oracle
}
