package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The analytical core of the reference: the transaction transform chain
  * `clean -> enrich -> metrics -> anomalies`
  * (`/root/reference/src/transformation/transaction_transform.py`).
  *
  * Every stage is a pure `DataFrame => DataFrame` built only from
  * `org.apache.spark.sql.functions` — fully Catalyst-visible, whole-stage
  * codegen'd, no UDFs. At scale, the plan is: narrow projections/filters
  * (clean/enrich, pipelined into the scan), one hash-partition shuffle on
  * `account_id` shared by all three window specs (metrics), and one
  * partial+final hash aggregate whose (small) result is broadcast-joined
  * back (anomalies).
  */
object TransactionTransform {

  /** transaction_transform.py:22-51 — parse timestamp, fill missing merchant
    * fields, drop negative-amount deposits, canonicalize transaction_type.
    * Stage order preserved exactly: the negative-deposit filter runs BEFORE
    * type standardization, so a negative "DEPOSIT" row survives.
    */
  def clean(df: DataFrame): DataFrame = {
    val parsed =
      if (df.schema("transaction_date").dataType == StringType)
        df.withColumn("transaction_date",
          to_timestamp(col("transaction_date"), "yyyy-MM-dd HH:mm:ss"))
      else df
    parsed
      .na.fill("Unknown", Seq("merchant_name", "merchant_category", "description"))
      .filter(!(col("transaction_type") === "deposit" && col("amount") < 0))
      .withColumn("transaction_type",
        when(col("transaction_type").isin("deposit", "DEPOSIT", "Deposit"), "deposit")
          .when(col("transaction_type").isin("withdrawal", "WITHDRAWAL", "Withdrawal"), "withdrawal")
          .when(col("transaction_type").isin("transfer", "TRANSFER", "Transfer"), "transfer")
          .when(col("transaction_type").isin("payment", "PAYMENT", "Payment"), "payment")
          .otherwise(col("transaction_type")))
  }

  /** transaction_transform.py:54-93 — calendar components, weekend flag
    * (Spark dayofweek: 1=Sunday..7=Saturday), USD conversion
    * (EUR x1.1, GBP x1.3 hardcoded, :79-83), merchant category mapping. */
  def enrich(df: DataFrame): DataFrame =
    df.withColumn("transaction_year", year(col("transaction_date")))
      .withColumn("transaction_month", month(col("transaction_date")))
      .withColumn("transaction_day", dayofmonth(col("transaction_date")))
      .withColumn("transaction_hour", hour(col("transaction_date")))
      .withColumn("transaction_dayofweek", dayofweek(col("transaction_date")))
      .withColumn("is_weekend",
        when(col("transaction_dayofweek").isin(1, 7), true).otherwise(false))
      .withColumn("amount_usd",
        when(col("currency") === "USD", col("amount"))
          .when(col("currency") === "EUR", col("amount") * 1.1)
          .when(col("currency") === "GBP", col("amount") * 1.3)
          .otherwise(col("amount")))
      .withColumn("transaction_category",
        when(col("merchant_category").isin("grocery", "supermarket"), "Groceries")
          .when(col("merchant_category").isin("restaurant", "fast food"), "Dining")
          .when(col("merchant_category").isin("gas", "fuel"), "Transportation")
          .when(col("merchant_category").isin("utility", "electricity", "water"), "Utilities")
          .otherwise("Other"))

  /** transaction_transform.py:95-135 — running balance, gap-to-previous, and
    * 30-day sliding frame counts/spend.
    *
    * All three windows partition by `account_id`, so Catalyst plans ONE
    * exchange (hash on account_id) reused by every window — this is the only
    * shuffle in the whole transform chain and is the property that must hold
    * at 100 TB (per-account state, never a global sort).
    *
    * Semantics notes (SURVEY.md §2.15):
    *  - running_balance uses the default RANGE frame, so transactions tied on
    *    `transaction_date` share one cumulative value (reference behavior).
    *  - The reference writes `rangeBetween(-30*86400, 0)` over a timestamp
    *    ordering (transaction_transform.py:126-128, comment "30 days in
    *    seconds"), which does not analyze in Spark; the declared intent is a
    *    30-day sliding frame, so we order by `unix_timestamp` seconds.
    *  - days_since_last_transaction is whole days via `datediff`; the
    *    downstream `< 0.01` fraud predicate (py:177) therefore means
    *    "same calendar day" — preserved literally in [[anomalies]].
    */
  def metrics(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("account_id").orderBy("transaction_date")
    val w30 = Window.partitionBy("account_id")
      .orderBy(unix_timestamp(col("transaction_date")))
      .rangeBetween(-30L * 86400L, 0L)
    // all four window columns in ONE projection so Catalyst groups them into
    // exactly two Window operators (one per spec) over the shared exchange —
    // interleaving them with plain projections yields extra Window/Sort pairs
    df.withColumn("amount_signed",
        when(col("transaction_type").isin("deposit", "transfer_in"), col("amount_usd"))
          .otherwise(-col("amount_usd")))
      .select(col("*"),
        sum("amount_signed").over(w).as("running_balance"),
        lag("transaction_date", 1).over(w).as("prev_transaction_date"),
        count("transaction_id").over(w30).as("transaction_count_30d"),
        sum(when(col("transaction_type").isin("withdrawal", "payment"), col("amount_usd"))
          .otherwise(0)).over(w30).as("total_spend_30d"))
      .withColumn("days_since_last_transaction",
        when(col("prev_transaction_date").isNull, 0)
          .otherwise(datediff(col("transaction_date"), col("prev_transaction_date"))))
  }

  /** transaction_transform.py:137-179 — per-account stats + rule flags.
    *
    * The grouped stats frame is one row per account — tiny relative to the
    * fact table — so the left join back is a broadcast-hash join (AQE picks
    * it; we hint `broadcast` explicitly so the plan is stable at any scale
    * where distinct accounts fit the broadcast threshold; with billions of
    * accounts AQE falls back to shuffled hash join on the already-hashed key).
    *
    * Three-valued logic preserved: stddev is NULL for single-transaction
    * accounts, so `is_large_transaction` can be NULL (reference behavior,
    * SURVEY.md §2.15.3). Note the interacting first-row quirk:
    * days_since_last_transaction defaults to 0 on each account's first
    * transaction (py:121-123), so the `< 0.01` rapid-transaction rule
    * (py:177) flags EVERY first transaction as potential fraud — preserved
    * deliberately for parity.
    */
  def anomalies(df: DataFrame): DataFrame = {
    val accountStats = df.groupBy("account_id").agg(
      stddev("amount_usd").as("amount_stddev"),
      avg("amount_usd").as("amount_avg"),
      max("amount_usd").as("amount_max"))
    df.join(broadcast(accountStats), Seq("account_id"), "left")
      .withColumn("is_large_transaction",
        (col("amount_usd") > (col("amount_avg") + lit(3) * col("amount_stddev"))) &&
          (col("amount_usd") > 1000))
      .withColumn("is_unusual_location",
        col("is_international") &&
          !col("location").isin("Canada", "Mexico", "United Kingdom", "France", "Germany"))
      .withColumn("is_high_frequency", col("transaction_count_30d") > 100)
      .withColumn("potential_fraud",
        col("is_large_transaction") ||
          col("is_unusual_location") ||
          (col("days_since_last_transaction") < 0.01))
  }

  /** Full chain as composed by the orchestrator
    * (`/root/reference/src/orchestration/main.py:174-177`). */
  val all: DataFrame => DataFrame =
    (clean _).andThen(enrich).andThen(metrics).andThen(anomalies)
}
