package graft

import org.apache.spark.sql.functions._

/** Config parity of the recommended deployment session
  * ([[GraftSession]]) with the reference's `create_spark_session`
  * (`spark_session.py:18-31`) — minus the cloud/catalog plumbing the
  * harness can't exercise (Delta extension, S3A, Hive). */
class SessionSpec extends SparkSpec {

  test("recommendedConfs carries the reference's semantic knobs") {
    val c = GraftSession.recommendedConfs()
    // spark_session.py:21-22 — parse + parquet-write calendar semantics
    // (the rebase knob under its Spark-4 key: the legacy.parquet.* alias
    // the reference spells was REMOVED in 4.0 and fails session build)
    assert(c("spark.sql.legacy.timeParserPolicy") == "LEGACY")
    assert(c("spark.sql.parquet.datetimeRebaseModeInWrite") == "LEGACY")
    // spark_session.py:27-29 — AQE on, shuffle parallelism caller-sized
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(GraftSession.recommendedConfs(64)("spark.sql.shuffle.partitions") == "64")
    // engine additions documented in the scaladoc
    assert(c("spark.sql.session.timeZone") == "UTC")
    assert(c("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }

  test("every recommended conf is APPLYABLE on a live Spark 4 session") {
    // The map test above can't catch a conf Spark removed (the 10M-doc
    // smoke found spark.sql.legacy.parquet.datetimeRebaseModeInWrite
    // failing session CONSTRUCTION under Spark 4) — actually setting
    // each key on a live session raises on removed/unknown SQL confs.
    // Every entry is a runtime SQL conf, so set-and-restore is safe.
    GraftSession.recommendedConfs().foreach { case (k, v) =>
      val prev = spark.conf.getOption(k)
      try spark.conf.set(k, v)
      finally prev match {
        case Some(p) => spark.conf.set(k, p)
        case None => spark.conf.unset(k)
      }
    }
  }

  test("LEGACY time parser accepts the reference's permissive parses") {
    import spark.implicits._
    val key = "spark.sql.legacy.timeParserPolicy"
    val prev = spark.conf.getOption(key)
    def parse(s: String, p: String): Option[String] = {
      val r = Seq(s).toDF("s")
        .select(try_to_timestamp($"s", lit(p)).cast("string")).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    try {
      // Reference semantics (SimpleDateFormat): a matching PREFIX parses
      // even with trailing text, and unpadded fields are accepted —
      // real-world feed shapes the reference's pipeline ingests.
      spark.conf.set(key, "LEGACY")
      assert(parse("2015-01-02 garbage", "yyyy-MM-dd").contains("2015-01-02 00:00:00"))
      assert(parse("2015-01-02T00:00", "yyyy-MM-dd").contains("2015-01-02 00:00:00"))
      assert(parse("2020-1-2", "yyyy-MM-dd").contains("2020-01-02 00:00:00"))
      // Modern parser (CORRECTED): the same inputs are invalid -> null.
      // A migration off GraftSession's default silently drops such rows.
      spark.conf.set(key, "CORRECTED")
      assert(parse("2015-01-02 garbage", "yyyy-MM-dd").isEmpty)
      assert(parse("2015-01-02T00:00", "yyyy-MM-dd").isEmpty)
      assert(parse("2020-1-2", "yyyy-MM-dd").isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
