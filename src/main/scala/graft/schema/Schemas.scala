package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the three banking entities (plus the documented-only
  * credit_card entity) and the harness test tables.
  *
  * Reference: `/root/reference/src/seed/data_seed.py:13-58` declares these as
  * explicit `StructType`s; `/root/reference/docs/` txt files are the data
  * dictionary. We declare schemas for every reader (replacing the reference's
  * CSV `inferSchema=True`, `/root/reference/src/ingestion/s3_connector.py:41`)
  * so that schema-on-read is deterministic — at 100 TB an inference pass is an
  * extra full scan of the data and a correctness hazard.
  */
object Schemas {

  /** data_seed.py:13-28; docs/customer_data.txt */
  val customer: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("date_of_birth", DateType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip_code", StringType),
    StructField("country", StringType),
    StructField("customer_since", DateType),
    StructField("credit_score", IntegerType),
    StructField("risk_segment", StringType)))

  /** data_seed.py:30-42; docs/account_data.txt */
  val account: StructType = StructType(Seq(
    StructField("account_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("account_type", StringType),
    StructField("account_status", StringType),
    StructField("open_date", DateType),
    StructField("close_date", DateType),
    StructField("currency", StringType),
    StructField("branch_id", StringType),
    StructField("interest_rate", FloatType),
    StructField("balance", DecimalType(18, 2)),
    StructField("last_activity_date", DateType)))

  /** data_seed.py:44-58; docs/transaction_data.txt */
  val transaction: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("account_id", StringType, nullable = false),
    StructField("transaction_date", TimestampType, nullable = false),
    StructField("transaction_type", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("currency", StringType),
    StructField("description", StringType),
    StructField("merchant_name", StringType),
    StructField("merchant_category", StringType),
    StructField("transaction_status", StringType),
    StructField("channel", StringType),
    StructField("location", StringType),
    StructField("is_international", BooleanType)))

  /** Raw CSV-shaped transaction schema: `transaction_date` arrives as a
    * string and is parsed by the clean stage
    * (`transaction_transform.py:35-36`). */
  val transactionRaw: StructType = StructType(
    transaction.fields.map {
      case f if f.name == "transaction_date" => f.copy(dataType = StringType)
      case f => f
    })

  /** docs/credit_card_data.txt — documented entity, never referenced by code. */
  val creditCard: StructType = StructType(Seq(
    StructField("card_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("account_id", StringType),
    StructField("card_type", StringType),
    StructField("card_status", StringType),
    StructField("issue_date", DateType),
    StructField("expiry_date", DateType),
    StructField("credit_limit", DecimalType(18, 2)),
    StructField("current_balance", DecimalType(18, 2)),
    StructField("available_credit", DecimalType(18, 2)),
    StructField("interest_rate", FloatType),
    StructField("last_payment_date", DateType),
    StructField("last_payment_amount", DecimalType(18, 2)),
    StructField("reward_points", IntegerType)))
}
