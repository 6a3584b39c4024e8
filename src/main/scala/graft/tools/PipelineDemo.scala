package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Config, Orchestrator}
import graft.seed.DataSeed

/** CLI drive of the full orchestration flow: seed CSVs -> run the three
  * reference pipelines -> read back outputs + quality-results monitoring
  * table (the monitor.py:10-26 read side). */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    new DataSeed(spark).writeAll(s"$root/raw")
    println(s"[demo] seeded raw CSVs under $root/raw")

    val cfg = Config.fromJson(
      """{
        |  "app_name": "Banking ETL Pipeline", "environment": "demo",
        |  "pipelines_to_run": ["customer", "account", "transaction"],
        |  "pipelines": {
        |    "customer": {"source_type": "s3", "source_path": "customers",
        |      "target_type": "redshift", "target_table": "dim_customer",
        |      "key_columns": ["customer_id"], "fail_on_quality_check": true,
        |      "data_quality": {"table_name": "dim_customer",
        |        "required_columns": ["customer_id","first_name","last_name","email"],
        |        "key_columns": ["customer_id"],
        |        "range_checks": {"credit_score": [300, 850]}}},
        |    "account": {"source_type": "rds", "source_table": "accounts",
        |      "target_type": "redshift", "target_table": "dim_account",
        |      "key_columns": ["account_id"], "fail_on_quality_check": true,
        |      "data_quality": {"table_name": "dim_account",
        |        "required_columns": ["account_id","customer_id","account_type","open_date"],
        |        "key_columns": ["account_id"],
        |        "range_checks": {"balance": [0, 10000000], "interest_rate": [0, 30]}}},
        |    "transaction": {"source_type": "s3", "source_path": "transactions",
        |      "target_type": "s3", "target_path": "processed/transactions",
        |      "write_mode": "append",
        |      "partition_cols": ["transaction_year", "transaction_month"],
        |      "fail_on_quality_check": false,
        |      "data_quality": {"table_name": "fact_transaction",
        |        "required_columns": ["transaction_id","account_id","transaction_date","amount"],
        |        "key_columns": ["transaction_id"],
        |        "range_checks": {"amount": [0, 1000000]}}}
        |  }
        |}""".stripMargin)

    val results = new Orchestrator(spark, cfg, s"$root/raw", s"$root/out").runAll()
    results.foreach(r => println(s"[demo] pipeline=${r.name} rows=${r.recordCount} " +
      s"quality_passed=${r.qualityPassed} loaded_to=${r.loadedTo}"))

    val tx = spark.read.parquet(s"$root/out/processed/transactions")
    println(s"[demo] transaction output rows=${tx.count()} " +
      s"fraud_flagged=${tx.filter(col("potential_fraud") === true).count()}")
    println("[demo] monitoring: latest quality results")
    spark.read.parquet(s"$root/out/quality_results")
      .orderBy(col("execution_date").desc).limit(10).show(truncate = false)
    spark.stop()
  }
}
