package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(0, 1000)
    .select(col("id"), pmod(col("id"), lit(10)).as("g"),
      pmod(xxhash64(col("id")), lit(97)).cast("double").as("v"))

  test("custom operator matches the window row_number formulation exactly") {
    val custom = TopK.perGroup(df, Seq("g"),
      Seq(("v", false), ("id", true)), 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    assert(custom == windowed && custom.size == 50)
  }

  test("k larger than the group returns the whole group") {
    val out = TopK.perGroup(df.filter(col("g") === 3), Seq("g"),
      Seq(("v", false), ("id", true)), 1000)
    assert(out.count() == 100)
  }

  test("plans TopKPerGroupExec behind exactly one hash exchange") {
    val plan = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup")) // exec node renders without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }

  test("high-cardinality groups fall back to the spillable window formulation") {
    // ~500 groups with maxGroups=100: the cardinality estimate must route to
    // row_number over a window (sort-based, spills) instead of the in-memory
    // heap operator -- and produce identical rows
    val hi = spark.range(0, 5000)
      .select(col("id"), pmod(col("id"), lit(500)).as("g"),
        pmod(xxhash64(col("id")), lit(977)).cast("double").as("v"))
    val guarded = TopK.perGroup(hi, Seq("g"), Seq(("v", false), ("id", true)),
      2, maxGroups = 100)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.contains("TopKPerGroup"), plan.take(500))
    val heap = TopK.perGroup(hi, Seq("g"), Seq(("v", false), ("id", true)),
      2, maxGroups = Long.MaxValue)
    assert(guarded.select("g", "id").as[(Long, Long)].collect().toSet ==
      heap.select("g", "id").as[(Long, Long)].collect().toSet)
  }

  test("public windowPerGroup completes at per-row group cardinality") {
    // the designated unbounded-cardinality path (every row its own group —
    // the shape that would OOM a per-group heap map): sort-based, spillable,
    // callable directly when the caller KNOWS cardinality is huge
    val hi = spark.range(0, 200000)
      .select(col("id"), col("id").as("g"),
        pmod(xxhash64(col("id")), lit(977)).cast("double").as("v"))
    val out = TopK.windowPerGroup(hi, Seq("g"), Seq(("v", false), ("id", true)), 1)
    assert(out.count() == 200000)
  }
}
