package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Customer transform — **contract-derived**: `customer_transform.py` is
  * advertised but ABSENT from the reference tree (SURVEY.md §0). The
  * behavioral contract is recovered from:
  *  - call sites `clean_customer_data` / `enrich_customer_data`
  *    (`/root/reference/src/orchestration/main.py:112-113`),
  *  - the entity schema (`/root/reference/src/seed/data_seed.py:13-28`,
  *    `docs/customer_data.txt`),
  *  - the quality expectations the output must satisfy
  *    (`/root/reference/config/config.json:31-38`: non-null customer_id /
  *    first_name / last_name / email, unique customer_id, credit_score in
  *    [300, 850]).
  *
  * Clean therefore performs the minimal work that makes valid input pass the
  * gate deterministically (type coercion, trim, keyed dedup); enrich adds the
  * derived attributes implied by the schema docs (age, tenure, score band) in
  * the same style as the transaction enrich stage. All built-in functions —
  * no shuffle except the dedup's hash aggregate on the key.
  */
object CustomerTransform {

  def clean(df: DataFrame): DataFrame = {
    val withTypes = df
      .withColumn("credit_score", col("credit_score").cast("int"))
      .withColumn("date_of_birth",
        if (df.schema("date_of_birth").dataType == StringType)
          to_date(col("date_of_birth"), "yyyy-MM-dd") else col("date_of_birth"))
      .withColumn("customer_since",
        if (df.schema("customer_since").dataType == StringType)
          to_date(col("customer_since"), "yyyy-MM-dd") else col("customer_since"))
    withTypes
      .withColumn("email", lower(trim(col("email"))))
      .na.fill("Unknown", Seq("city", "state", "country", "risk_segment"))
      .dropDuplicates("customer_id")
  }

  def enrich(df: DataFrame): DataFrame =
    df.withColumn("age",
        (months_between(current_date(), col("date_of_birth")) / 12).cast("int"))
      .withColumn("tenure_years",
        (months_between(current_date(), col("customer_since")) / 12).cast("int"))
      .withColumn("credit_band",
        when(col("credit_score") >= 750, "excellent")
          .when(col("credit_score") >= 670, "good")
          .when(col("credit_score") >= 580, "fair")
          .otherwise("poor"))

  val all: DataFrame => DataFrame = (clean _).andThen(enrich)
}
