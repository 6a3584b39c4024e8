package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv with declared schema reads typed columns (no inference pass)") {
    val dir = Files.createTempDirectory("graft_src").toString
    Seq(("a", 1, "2024-01-02"), ("b", 2, "2024-03-04"))
      .toDF("id", "n", "d").write.option("header", "true").csv(s"$dir/c")
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("n", IntegerType), StructField("d", DateType)))
    val df = Sources.csv(spark, s"$dir/c", Some(schema))
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.filter($"d" === java.sql.Date.valueOf("2024-03-04")).count() == 1)
  }

  test("text scan yields one value row per line; ERROR filter works (monitor.py:30-35)") {
    val dir = Files.createTempDirectory("graft_txt").toString
    Files.write(java.nio.file.Paths.get(s"$dir/app.log"),
      "INFO ok\nERROR boom\nINFO fine\nERROR again\n".getBytes)
    val logs = Sources.text(spark, s"$dir/app.log")
    assert(logs.columns.sameElements(Array("value")))
    assert(logs.filter($"value".contains("ERROR")).count() == 2)
  }

  test("orc write/scan roundtrip preserves types and rows; predicate is pushed") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "a", 10.5), (2L, "b", -3.0)).toDF("k", "s", "v")
    graft.sinks.Sinks.orc(df, s"$dir/o")
    val back = Sources.orc(spark, s"$dir/o")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 2)
    // the ORC reader must receive the filter (stripe min/max skipping at
    // scale), same contract the parquet scans are held to
    val plan = back.filter($"v" > 0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(v,0.0)"),
      plan.take(800))
  }

  test("delta source falls back to parquet when delta jars are absent") {
    val dir = Files.createTempDirectory("graft_delta").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$dir/t")
    assert(Sources.delta(spark, s"$dir/t").count() == 1)
  }

  test("localRows builds a frame from explicit rows + schema (S6)") {
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", IntegerType)))
    val df = Sources.localRows(spark, Seq(Row("a", 1), Row("b", 2)), schema)
    assert(df.as[(String, Int)].collect().toSet == Set(("a", 1), ("b", 2)))
  }
}
