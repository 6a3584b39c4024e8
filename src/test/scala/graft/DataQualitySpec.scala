package graft

import graft.quality.DataQuality
import graft.quality.DataQuality.QualityConfig

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkNulls counts injected nulls per column; missing columns reported") {
    val df = Seq(("a", Option(1)), ("b", None), ("c", None))
      .toDF("id", "v")
    val r = DataQuality.checkNulls(df, Seq("id", "v", "nope"))
    assert(!r.passed)
    assert(r.nullCounts == Map("id" -> 0L, "v" -> 2L))
    assert(r.missingColumns == Seq("nope"))
  }

  test("checkDuplicates counts extra rows (total - distinct), reference formula") {
    val df = Seq("k1", "k1", "k1", "k2").toDF("key")
    val r = DataQuality.checkDuplicates(df, Seq("key"))
    assert(!r.passed && r.duplicateCount == 2) // 4 rows - 2 distinct
    val ok = DataQuality.checkDuplicates(Seq("a", "b").toDF("key"), Seq("key"))
    assert(ok.passed && ok.duplicateCount == 0)
  }

  test("checkDataRanges counts out-of-range values per column") {
    val df = Seq(250, 700, 900, 400).toDF("credit_score")
    val r = DataQuality.checkDataRanges(df, Map("credit_score" -> ((300.0, 850.0))))
    assert(!r.passed && r.outOfRangeCounts == Map("credit_score" -> 2L))
  }

  test("checkReferentialIntegrity finds orphaned foreign keys") {
    val fk = Seq("a", "a", "b", "x").toDF("account_id")
    val pk = Seq("a", "b", "c").toDF("account_id")
    val r = DataQuality.checkReferentialIntegrity(fk, pk, "account_id", "account_id")
    assert(!r.passed && r.orphanedCount == 1)
  }

  test("runAllChecks aggregates results with overall_passed gate") {
    val good = Seq((1, 500), (2, 600)).toDF("id", "score")
    val cfg = QualityConfig("t", Seq("id", "score"), Seq("id"),
      Map("score" -> ((300.0, 850.0))))
    val r = DataQuality.runAllChecks(good, cfg)
    assert(r.overallPassed && r.recordCount == 2)
    assert(r.nullCheck.get.passed && r.duplicateCheck.get.passed && r.rangeCheck.get.passed)

    val bad = Seq((1, 500), (1, 900)).toDF("id", "score")
    val r2 = DataQuality.runAllChecks(bad, cfg)
    assert(!r2.overallPassed)
    assert(!r2.duplicateCheck.get.passed && !r2.rangeCheck.get.passed)
  }

  test("nullCheckDF / rangeCheckDF produce per-column rows in one pass") {
    val df = Seq((Option(1), 10.0), (None, -3.0)).toDF("a", "b")
    val nulls = DataQuality.nullCheckDF(df, Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(nulls == Map("a" -> 1L, "b" -> 0L))
    val ranges = DataQuality.rangeCheckDF(df, Seq(("b", 0.0, 100.0)))
      .as[(String, Long)].collect().toMap
    assert(ranges == Map("b" -> 1L))
  }
}
