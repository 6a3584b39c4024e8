package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.transform.TransactionTransform

/** Edge cases from SURVEY.md §2.15 over tiny inline frames. */
class TransactionTransformSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkTx(rows: Seq[(String, String, Timestamp, String, Double,
      String, String, String, String, String, String, String, Boolean)]) =
    rows.toDF("transaction_id", "account_id", "transaction_date",
      "transaction_type", "amount", "currency", "description",
      "merchant_name", "merchant_category", "transaction_status", "channel",
      "location", "is_international")

  private val base = ("t1", "a1", ts("2024-01-03 10:00:00"), "deposit", 100.0,
    "USD", "d", "m", "grocery", "completed", "online", "USA", false)

  test("clean drops negative deposits but keeps negative DEPOSIT (filter precedes standardization)") {
    val df = mkTx(Seq(
      base,
      base.copy(_1 = "t2", _4 = "deposit", _5 = -5.0),
      base.copy(_1 = "t3", _4 = "DEPOSIT", _5 = -5.0)))
    val out = TransactionTransform.clean(df)
    val ids = out.select("transaction_id").as[String].collect().toSet
    assert(ids == Set("t1", "t3"))
    // and t3 is canonicalized to lowercase afterwards
    val t3 = out.filter($"transaction_id" === "t3")
      .select("transaction_type").as[String].head()
    assert(t3 == "deposit")
  }

  test("clean canonicalizes case variants and passes unknown types through") {
    val df = mkTx(Seq(
      base.copy(_1 = "t1", _4 = "Withdrawal"),
      base.copy(_1 = "t2", _4 = "PAYMENT"),
      base.copy(_1 = "t3", _4 = "Transfer"),
      base.copy(_1 = "t4", _4 = "chargeback")))
    val types = TransactionTransform.clean(df)
      .select("transaction_id", "transaction_type").as[(String, String)]
      .collect().toMap
    assert(types == Map("t1" -> "withdrawal", "t2" -> "payment",
      "t3" -> "transfer", "t4" -> "chargeback"))
  }

  test("clean fills missing merchant fields with Unknown") {
    val df = mkTx(Seq(base)).withColumn("merchant_name",
      org.apache.spark.sql.functions.lit(null).cast("string"))
    val v = TransactionTransform.clean(df).select("merchant_name").as[String].head()
    assert(v == "Unknown")
  }

  test("enrich: weekend flag uses Spark dayofweek (1=Sun,7=Sat) and currency constants 1.1/1.3") {
    val df = mkTx(Seq(
      base.copy(_1 = "sun", _3 = ts("2024-01-07 12:00:00"), _6 = "USD"),
      base.copy(_1 = "sat", _3 = ts("2024-01-06 12:00:00"), _6 = "EUR"),
      base.copy(_1 = "wed", _3 = ts("2024-01-03 12:00:00"), _6 = "GBP")))
    val out = TransactionTransform.enrich(df)
      .select("transaction_id", "is_weekend", "amount_usd")
      .as[(String, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("sun") == ((true, 100.0)))
    assert(out("sat") == ((true, 100.0 * 1.1)))
    assert(out("wed") == ((false, 100.0 * 1.3)))
  }

  test("enrich maps merchant categories") {
    val df = mkTx(Seq(
      base.copy(_1 = "g", _9 = "supermarket"),
      base.copy(_1 = "d", _9 = "fast food"),
      base.copy(_1 = "t", _9 = "fuel"),
      base.copy(_1 = "u", _9 = "water"),
      base.copy(_1 = "o", _9 = "casino")))
    val cats = TransactionTransform.enrich(df)
      .select("transaction_id", "transaction_category").as[(String, String)]
      .collect().toMap
    assert(cats == Map("g" -> "Groceries", "d" -> "Dining",
      "t" -> "Transportation", "u" -> "Utilities", "o" -> "Other"))
  }

  test("metrics: running balance shares cumulative value on tied timestamps (RANGE frame)") {
    val t0 = ts("2024-01-03 10:00:00")
    val df = TransactionTransform.enrich(mkTx(Seq(
      base.copy(_1 = "t1", _3 = t0, _4 = "deposit", _5 = 10.0),
      base.copy(_1 = "t2", _3 = t0, _4 = "deposit", _5 = 20.0),
      base.copy(_1 = "t3", _3 = ts("2024-01-04 10:00:00"), _4 = "withdrawal", _5 = 5.0))))
    val rb = TransactionTransform.metrics(df)
      .select("transaction_id", "running_balance").as[(String, Double)]
      .collect().toMap
    assert(rb("t1") == 30.0 && rb("t2") == 30.0) // ties share the sum
    assert(rb("t3") == 25.0)
  }

  test("metrics: days_since_last_transaction is 0 for first row, whole days after") {
    val df = TransactionTransform.enrich(mkTx(Seq(
      base.copy(_1 = "t1", _3 = ts("2024-01-03 10:00:00")),
      base.copy(_1 = "t2", _3 = ts("2024-01-05 09:00:00")))))
    val d = TransactionTransform.metrics(df)
      .select("transaction_id", "days_since_last_transaction").as[(String, Int)]
      .collect().toMap
    assert(d == Map("t1" -> 0, "t2" -> 2))
  }

  test("metrics: 30-day frame includes a transaction exactly 30 days earlier, excludes 31") {
    val df = TransactionTransform.enrich(mkTx(Seq(
      base.copy(_1 = "t1", _3 = ts("2024-01-01 10:00:00"), _4 = "payment", _5 = 7.0),
      base.copy(_1 = "t2", _3 = ts("2024-01-31 10:00:00"), _4 = "payment", _5 = 11.0),
      base.copy(_1 = "t3", _3 = ts("2024-02-02 10:00:01"), _4 = "payment", _5 = 13.0))))
    val m = TransactionTransform.metrics(df)
      .select("transaction_id", "transaction_count_30d", "total_spend_30d")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("t2") == ((2L, 18.0))) // t1 exactly 30*86400s before t2: included
    assert(m("t3") == ((2L, 24.0))) // t1 aged out, t2 still in
  }

  test("anomalies: null stddev keeps is_large NULL; first-row quirk still flags fraud") {
    val df = TransactionTransform.metrics(TransactionTransform.enrich(mkTx(Seq(
      base.copy(_1 = "solo", _2 = "acc_solo", _5 = 5000.0),
      base.copy(_1 = "intl", _2 = "acc_intl", _5 = 5000.0, _12 = "Japan", _13 = true)))))
    val out = TransactionTransform.anomalies(df)
      .select("transaction_id", "is_large_transaction", "potential_fraud")
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    // single-transaction account: stddev NULL -> is_large NULL (3VL), but the
    // reference's first-row rule (days_since defaults to 0 -> `< 0.01` true,
    // transaction_transform.py:121-123,177) flags EVERY account's first
    // transaction as potential fraud — preserved deliberately.
    assert(out("solo") == ((None, Some(true))))
    assert(out("intl") == ((None, Some(true))))
  }

  test("anomalies: same-day repeat transactions flag potential_fraud via days_since < 0.01") {
    val df = TransactionTransform.metrics(TransactionTransform.enrich(mkTx(Seq(
      base.copy(_1 = "t1", _3 = ts("2024-01-03 10:00:00"), _5 = 10.0),
      base.copy(_1 = "t2", _3 = ts("2024-01-03 10:00:05"), _5 = 12.0),
      base.copy(_1 = "t3", _3 = ts("2024-02-20 10:00:00"), _5 = 11.0)))))
    val out = TransactionTransform.anomalies(df)
      .select("transaction_id", "potential_fraud")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    // t1 is also same-day (datediff==0 via the isNull->0 guard)
    assert(out == Map("t1" -> true, "t2" -> true, "t3" -> false))
  }

  test("full chain runs and preserves row count on clean input") {
    val df = mkTx(Seq(
      base.copy(_1 = "t1"),
      base.copy(_1 = "t2", _3 = ts("2024-01-05 10:00:00"), _4 = "payment")))
    assert(TransactionTransform.all(df).count() == 2)
  }
}
