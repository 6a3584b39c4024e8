package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes every implemented operator (reference parity from
  * SURVEY.md §2 via [[ParityQueries]], training-data-pipeline extensions via
  * [[ExtensionQueries]]); `oracleSql` holds the DuckDB equivalent for every
  * SQL-expressible query (xxhash64-based ops are rows-only by design).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference transaction pipeline (clean -> enrich -> metrics ->
    * anomalies) over the adapted events table. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q17_transaction_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (xxhash64-dependent ops) get the
    * driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ ExtensionQueries.oracle
}
