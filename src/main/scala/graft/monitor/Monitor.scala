package graft.monitor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Monitoring queries — reference entry point 3
  * (`/root/reference/src/notebooks/monitor.py:10-86`):
  * (a) latest quality-check results + failed-run count,
  * (b) ERROR-line count over raw logs,
  * (c) row-count reconciliation across stores.
  *
  * The reference reads a quality-results table no pipeline ever writes
  * (SURVEY.md §2.15.8); here [[graft.pipeline.Orchestrator]] writes it, so
  * these queries operate on real data.
  */
object Monitor {

  /** monitor.py:10-26 — latest N quality results (top-k, no global sort)
    * and the count of failed runs. */
  def qualityResults(spark: SparkSession, path: String, latest: Int = 10)
      : (DataFrame, Long) = {
    val df = spark.read.parquet(path)
    val latestRuns = df.orderBy(col("execution_date").desc).limit(latest)
    val failedCount = df.filter(col("overall_passed") === false).count()
    (latestRuns, failedCount)
  }

  /** monitor.py:28-40 — ERROR occurrences in raw log files (text scan S5 +
    * contains filter P7). */
  def errorLogCount(spark: SparkSession, logPath: String): Long =
    Sources.text(spark, logPath)
      .filter(col("value").contains("ERROR")).count()

  /** monitor.py:42-75 — row-count reconciliation across stores; the local
    * analogue counts each named parquet table and reports pairwise drift. */
  def reconcileCounts(spark: SparkSession, paths: Map[String, String]): DataFrame = {
    import spark.implicits._
    paths.toSeq.sortBy(_._1).map { case (name, p) =>
      (name, spark.read.parquet(p).count())
    }.toDF("store", "row_count")
  }
}
