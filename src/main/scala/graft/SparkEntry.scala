package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (one entry per implemented
  * SURVEY §2 operator / extension); `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's hash-match. Column names and row order are aligned on
  * both sides by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_star_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.ExtQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++ graft.queries.ExtQueries.oracle
}
