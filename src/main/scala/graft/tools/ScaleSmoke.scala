package graft.tools

import org.apache.spark.sql.functions._

import graft.queries.ParityQueries
import graft.transform.TransactionTransform

/** 100x-the-bench scale probe: 10M synthetic events (hash-derived, fully
  * distributed generation via spark.range — no driver-side rows), through
  * the flagship transform chain and the heavy window/agg path. Evidence
  * that the plan shape (single account_id exchange, broadcast stats,
  * partial aggs) holds when data outgrows a single partition's memory. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10_000_000L)
    val users = args.drop(1).headOption.map(_.toLong).getOrElse(100_000L)
    val spark = graft.GraftSession.local(cores = 4)
    import spark.implicits._

    val events = spark.range(0, n, 1, 32)
      .select(col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(xxhash64(col("id"), lit(1)), lit(2592000000000L))).as("ts"),
        pmod(xxhash64(col("id"), lit(2)), lit(users)).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase"),
          lit("signup"), lit("error")),
          (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("int")).as("event_type"),
        round(pmod(xxhash64(col("id"), lit(4)), lit(50000)) / lit(100.0), 2).as("value"),
        lit("{}").as("props"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale-smoke] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    time(s"generate+count $n rows")(events.count())
    val tx = ParityQueries.eventsAsTransactions(events)
    val out = TransactionTransform.all(tx)
    val cnt = time("flagship pipeline (2 windows+agg+join)")(out.count())
    println(s"[scale-smoke] pipeline rows=$cnt")
    val fraud = time("fraud aggregation")(
      out.groupBy("potential_fraud").count().collect().toSeq)
    println(s"[scale-smoke] fraud breakdown=${fraud.mkString(", ")}")
    val topSpend = time("top-100 accounts by 30d spend")(
      out.groupBy("account_id").agg(max("total_spend_30d").as("peak"))
        .orderBy(col("peak").desc).limit(100).count())
    println(s"[scale-smoke] top rows=$topSpend")
    spark.stop()
  }
}
