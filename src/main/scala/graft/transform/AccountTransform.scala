package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Account transform — **contract-derived** (module ABSENT in reference, like
  * [[CustomerTransform]]): call sites `clean_account_data` /
  * `enrich_account_data` (`/root/reference/src/orchestration/main.py:237-238`),
  * schema (`/root/reference/src/seed/data_seed.py:30-42`,
  * `docs/account_data.txt`), quality expectations
  * (`/root/reference/config/config.json:48-61`: non-null account_id /
  * customer_id / account_type / open_date, unique account_id, balance in
  * [0, 1e7], interest_rate in [0, 30]).
  */
object AccountTransform {

  def clean(df: DataFrame): DataFrame = {
    def asDate(c: String) =
      if (df.schema(c).dataType == StringType) to_date(col(c), "yyyy-MM-dd")
      else col(c)
    df.withColumn("open_date", asDate("open_date"))
      .withColumn("close_date", asDate("close_date"))
      .withColumn("last_activity_date", asDate("last_activity_date"))
      .withColumn("balance", col("balance").cast("decimal(18,2)"))
      .withColumn("interest_rate", col("interest_rate").cast("float"))
      .withColumn("account_status", lower(trim(col("account_status"))))
      .withColumn("account_type", lower(trim(col("account_type"))))
      .na.fill("Unknown", Seq("branch_id", "currency"))
      .dropDuplicates("account_id")
  }

  def enrich(df: DataFrame): DataFrame =
    df.withColumn("is_active", col("account_status") === "active")
      .withColumn("account_age_days", datediff(current_date(), col("open_date")))
      .withColumn("days_since_activity",
        datediff(current_date(), col("last_activity_date")))
      .withColumn("is_dormant",
        col("account_status") === "active" && col("days_since_activity") > 365)

  val all: DataFrame => DataFrame = (clean _).andThen(enrich)
}
