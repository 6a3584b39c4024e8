package graft

import java.sql.Timestamp

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:01:00"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:30"), 50.0),
    (4L, "C", ts("2024-01-01 10:00:30"), 10.0)) // key with no quotes
    .toDF("trade_id", "sym", "ts", "px")

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 99.5),
    ("A", ts("2024-01-01 10:00:05"), 99.9), // exactly at trade 1's time
    ("A", ts("2024-01-01 10:02:00"), 102.0), // after both A trades
    ("B", ts("2024-01-01 10:00:10"), 49.0))
    .toDF("sym", "ts", "bid")

  test("as-of join attaches latest right row at-or-before each left row per key") {
    val out = AsOf.join(trades, quotes, "sym", "ts")
      .select($"trade_id", $"asof_bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(99.9)) // tie at same timestamp is visible (>=)
    assert(out(2L).contains(99.9)) // 10:02 quote is in the future -> excluded
    assert(out(3L).contains(49.0))
    assert(out(4L).isEmpty)        // no quotes for key C -> null
  }

  test("as-of join preserves left row count (never multiplies or drops)") {
    assert(AsOf.join(trades, quotes, "sym", "ts").count() == trades.count())
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive non-equi join, half-open bounds") {
    val points = Seq((1L, 4.0), (2L, 10.0), (3L, 20.0), (4L, 99.0), (5L, -3.0))
      .toDF("id", "x")
    val intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 30.0), ("c", 15.0, 25.0))
      .toDF("name", "lo", "hi")
    val binned = graft.ops.RangeJoin
      .pointInInterval(points, "x", intervals, "lo", "hi", binWidth = 7.0)
      .select("id", "name").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(binned == naive)
    assert(binned == Set((1L, "a"), (2L, "b"), (3L, "b"), (3L, "c")))
    // boundary: x=10 excluded from [0,10) but included in [10,30); x=-3 nowhere
  }
}
