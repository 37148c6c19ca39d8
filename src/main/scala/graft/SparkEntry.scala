package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AuditQueries, CoreQueries, ExtQueries, GraphQueries, LayoutQueries, R10Queries, R11Queries, R11bQueries, R11cQueries, R11dQueries, R11eQueries, R11fQueries, R11gQueries, R11hQueries, R8Queries, R8bQueries, R9Queries, R9bQueries, R9cQueries, R9dQueries, R9eQueries, RelQueries, Synth, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query keys are the SURVEY.md §2.1 operator inventory plus relational and
  * training-data-pipeline extensions; each has a DuckDB oracle twin unless
  * inherently non-SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full parse → rule-cascade → route pipeline, grouped by destination. */
  def entry(spark: SparkSession): DataFrame =
    Synth.routed(spark, "/root/testdata/sf0.001")
      .groupBy("topic").agg(count(lit(1)).as("n"))

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * relational surface and training-data-pipeline extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelQueries.queries ++ ExtQueries.queries ++
      GraphQueries.queries ++ TsQueries.queries ++ LayoutQueries.queries ++
      AuditQueries.queries ++ R8Queries.queries ++ R8bQueries.queries ++
      R9Queries.queries ++ R9bQueries.queries ++ R9cQueries.queries ++
      R9dQueries.queries ++ R9eQueries.queries ++ R10Queries.queries ++
      R11Queries.queries ++ R11bQueries.queries ++ R11cQueries.queries ++
      R11dQueries.queries ++ R11eQueries.queries ++ R11fQueries.queries ++
      R11gQueries.queries ++ R11hQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ RelQueries.oracle ++ ExtQueries.oracle ++
      GraphQueries.oracle ++ TsQueries.oracle ++ LayoutQueries.oracle ++
      AuditQueries.oracle ++ R8Queries.oracle ++ R8bQueries.oracle ++
      R9Queries.oracle ++ R9bQueries.oracle ++ R9cQueries.oracle ++
      R9dQueries.oracle ++ R9eQueries.oracle ++ R10Queries.oracle ++
      R11Queries.oracle ++ R11bQueries.oracle ++ R11cQueries.oracle ++
      R11dQueries.oracle ++ R11eQueries.oracle ++ R11fQueries.oracle ++
      R11gQueries.oracle ++ R11hQueries.oracle
}
