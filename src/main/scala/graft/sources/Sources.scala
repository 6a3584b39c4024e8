package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source operators S1-S6 (SURVEY.md §2.1), thin functions over
  * `DataFrameReader` so every scan is a Catalyst `Relation` that benefits
  * from pushdown/pruning.
  *
  * Reference: `/root/reference/src/ingestion/s3_connector.py` (CSV/parquet/
  * Delta), `/root/reference/src/notebooks/monitor.py:30,45-64` (text, JDBC),
  * `/root/reference/src/seed/data_seed.py:106,155,232` (local rows).
  */
object Sources {

  /** S1 — CSV scan (s3_connector.py:23-45). The reference defaults to
    * `inferSchema=True`; we take an explicit schema (pass `None` to fall back
    * to inference for ad-hoc exploration). At scale, inference is an extra
    * full read of the input — always declare.
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
      header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
  }

  /** S2 — Parquet scan (s3_connector.py:47-64). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S3 — Delta scan (s3_connector.py:66-83); falls back to parquet when the
    * Delta format is not on the classpath (this harness ships Spark-only
    * jars). The call shape `format("delta").load(path)` is preserved. */
  def delta(spark: SparkSession, path: String): DataFrame =
    try spark.read.format("delta").load(path)
    catch { case _: Exception => spark.read.parquet(path) }

  /** S4 — JDBC whole-table scan (monitor.py:45-64; rds_connector.read_table
    * contract from main.py:106-108). Not exercised by the local harness (no
    * warehouse) but kept API-complete. `numPartitions`+bounds enable the
    * parallel-read path that a cluster load would need. */
  def jdbc(spark: SparkSession, url: String, table: String, user: String,
      password: String, driver: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None,
      numPartitions: Int = 8): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("driver", driver)
    (partitionColumn, bounds) match {
      case (Some(c), Some((lo, hi))) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ =>
    }
    r.load()
  }

  /** ORC scan (format completeness beyond the reference's CSV/parquet/
    * Delta surface — the other columnar interchange format warehouse
    * estates actually hold). Spark's native vectorized ORC reader gives
    * the same pushdown/pruning contract as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5 — text scan: one `value` column per line (monitor.py:30). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S6 — local rows with explicit schema (data_seed.py:106,155,232). */
  def localRows(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
}
