package graft

import java.nio.file.Files

import graft.monitor.Monitor

class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("qualityResults returns latest-N and failed count") {
    val dir = Files.createTempDirectory("graft_mon").toString
    val df = Seq(
      ("t1", 10L, true, "2024-01-01 10:00:00"),
      ("t2", 20L, false, "2024-01-02 10:00:00"),
      ("t3", 30L, true, "2024-01-03 10:00:00"))
      .toDF("table_name", "record_count", "overall_passed", "execution_date")
      .withColumn("execution_date",
        org.apache.spark.sql.functions.to_timestamp($"execution_date"))
    df.write.parquet(s"$dir/qr")
    val (latest, failed) = Monitor.qualityResults(spark, s"$dir/qr", latest = 2)
    assert(failed == 1)
    val names = latest.select("table_name").as[String].collect().toSeq
    assert(names == Seq("t3", "t2")) // newest first, limit 2
  }

  test("errorLogCount counts ERROR lines via text scan") {
    val dir = Files.createTempDirectory("graft_mon2").toString
    Files.write(java.nio.file.Paths.get(s"$dir/x.log"),
      "ok\nERROR a\nok\nERROR b\nERROR c\n".getBytes)
    assert(Monitor.errorLogCount(spark, s"$dir/x.log") == 3)
  }

  test("reconcileCounts reports per-store row counts") {
    val dir = Files.createTempDirectory("graft_mon3").toString
    Seq(1, 2, 3).toDF("a").write.parquet(s"$dir/s1")
    Seq(1, 2).toDF("a").write.parquet(s"$dir/s2")
    val counts = Monitor.reconcileCounts(spark,
      Map("s1" -> s"$dir/s1", "s2" -> s"$dir/s2"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("s1" -> 3L, "s2" -> 2L))
  }
}
