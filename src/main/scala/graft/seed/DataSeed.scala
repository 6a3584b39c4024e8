package graft.seed

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.schema.Schemas
import graft.sinks.Sinks
import graft.sources.Sources

/** Seed data generator (X7) mirroring the reference's fixture generator
  * `/root/reference/src/seed/data_seed.py:63-243`: deterministic synthetic
  * customers / accounts / transactions with the same enum domains and FK
  * structure (transactions only against ACTIVE accounts, `data_seed.py:171-172`),
  * defaults 1000 / 1500 / 10000. Fixture-scale generator (driver-side row
  * building, like the reference) — not a data path; the engine's real inputs
  * are the harness parquet tables.
  */
class DataSeed(spark: SparkSession, seed: Long = 42L) {

  private val rnd = new Random(seed)
  private val today = LocalDate.of(2024, 6, 1) // fixed epoch for determinism

  private val firstNames = Seq("James", "Mary", "John", "Patricia", "Robert",
    "Jennifer", "Michael", "Linda", "William", "Elizabeth")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown",
    "Jones", "Garcia", "Miller", "Davis", "Rodriguez", "Martinez")
  private val cities = Seq("New York", "Los Angeles", "Chicago", "Houston",
    "Phoenix", "Philadelphia", "San Antonio", "San Diego", "Dallas", "San Jose")
  private val states = Seq("NY", "CA", "IL", "TX", "AZ", "PA", "FL", "OH", "GA", "NC")
  private val riskSegments = Seq("Low", "Medium", "High")
  private val accountTypes = Seq("checking", "savings", "investment")
  private val accountStatuses = Seq("active", "closed", "suspended")
  private val currencies = Seq("USD", "EUR", "GBP")
  private val txnTypes = Seq("deposit", "withdrawal", "transfer", "payment")
  private val txnStatuses = Seq("completed", "pending", "failed", "reversed")
  private val channels = Seq("online", "mobile", "branch", "atm")
  private val locations = Seq("USA", "Canada", "Mexico", "United Kingdom",
    "France", "Germany", "Japan", "Brazil", "India", "Australia")
  private val merchantsByCategory = Map(
    "grocery" -> Seq("WholeFoods", "Safeway", "Kroger", "TraderJoes"),
    "restaurant" -> Seq("OliveGarden", "ChickenShack", "BurgerBarn", "PastaPlace"),
    "retail" -> Seq("Amazon", "Target", "Walmart", "BestBuy"),
    "travel" -> Seq("Delta", "Marriott", "Hertz", "Expedia"),
    "utility" -> Seq("PGE", "ConEd", "CityWater", "MetroGas"),
    "entertainment" -> Seq("Netflix", "AMC", "Spotify", "Steam"))

  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))
  private def daysAgo(maxDays: Int): Date =
    Date.valueOf(today.minusDays(rnd.nextInt(maxDays).toLong))
  private def money(lo: Double, hi: Double): java.math.BigDecimal =
    new java.math.BigDecimal(lo + rnd.nextDouble() * (hi - lo))
      .setScale(2, java.math.RoundingMode.HALF_UP)

  def customers(n: Int = 1000): DataFrame = {
    val rows = (0 until n).map { i =>
      val first = pick(firstNames); val last = pick(lastNames)
      Row(f"CUST$i%06d", first, last,
        Date.valueOf(today.minusYears(21 + rnd.nextInt(60).toLong)
          .minusDays(rnd.nextInt(365).toLong)),
        s"${first.toLowerCase}.${last.toLowerCase}@example.com",
        f"555-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d",
        s"${1 + rnd.nextInt(9999)} Main St", pick(cities), pick(states),
        f"${rnd.nextInt(100000)}%05d", "USA", daysAgo(3650),
        300 + rnd.nextInt(551), pick(riskSegments))
    }
    Sources.localRows(spark, rows, Schemas.customer)
  }

  def accounts(customerIds: Seq[String], n: Int = 1500): DataFrame = {
    val rows = (0 until n).map { i =>
      val status = pick(accountStatuses)
      val openDate = daysAgo(1825)
      Row(f"ACC$i%08d", customerIds(rnd.nextInt(customerIds.size)),
        pick(accountTypes), status, openDate,
        if (status == "closed")
          Date.valueOf(openDate.toLocalDate.plusDays(1 + rnd.nextInt(300).toLong))
        else null,
        pick(currencies), f"BR${rnd.nextInt(1000)}%03d",
        (0.01f + rnd.nextFloat() * 4.99f), money(0, 100000), daysAgo(30))
    }
    Sources.localRows(spark, rows, Schemas.account)
  }

  def transactions(activeAccountIds: Seq[String], n: Int = 10000): DataFrame = {
    val rows = (0 until n).map { _ =>
      val category = pick(merchantsByCategory.keys.toSeq.sorted)
      val txnType = pick(txnTypes)
      val amount = txnType match {
        case "deposit" => money(100, 5000)
        case "withdrawal" => money(10, 1000)
        case _ => money(10, 2000)
      }
      val location = pick(locations)
      val ms = today.minusDays(rnd.nextInt(90).toLong).toEpochDay * 86400000L +
        rnd.nextInt(86400000)
      Row(java.util.UUID.nameUUIDFromBytes(
          (rnd.nextLong().toString).getBytes).toString,
        activeAccountIds(rnd.nextInt(activeAccountIds.size)),
        new Timestamp(ms), txnType, amount, pick(currencies),
        s"$txnType at ${pick(merchantsByCategory(category))}",
        pick(merchantsByCategory(category)), category, pick(txnStatuses),
        pick(channels), location, location != "USA")
    }
    Sources.localRows(spark, rows, Schemas.transaction)
  }

  /** Generate all three entities (FK-consistent) and write them as CSV under
    * `root/{customers,accounts,transactions}` — the reference's seed layout
    * (`data_seed.py:236-243`). */
  def writeAll(root: String, nCustomers: Int = 1000, nAccounts: Int = 1500,
      nTransactions: Int = 10000): Unit = {
    val cust = customers(nCustomers)
    val custIds = cust.select("customer_id")
      .collect().map(_.getString(0)).toSeq
    val acct = accounts(custIds, nAccounts)
    val activeIds = acct.filter(org.apache.spark.sql.functions
        .col("account_status") === "active")
      .select("account_id").collect().map(_.getString(0)).toSeq
    val txn = transactions(activeIds, nTransactions)
    Sinks.csv(cust, s"$root/customers")
    Sinks.csv(acct, s"$root/accounts")
    // CSV keeps the raw string timestamp the clean stage parses (D1)
    Sinks.csv(txn.withColumn("transaction_date",
      org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("transaction_date"),
        "yyyy-MM-dd HH:mm:ss")), s"$root/transactions")
  }
}
