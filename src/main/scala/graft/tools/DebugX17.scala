package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for x17's cost structure: times the approx-sketch agg,
  * the exact-distinct legs (separate vs Expand-combined), and rsd
  * sensitivity, so the committed query shape is measured, not guessed. */
object DebugX17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm
    def time[A](label: String)(f: => A): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[dbg] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val proj = li.select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"))
    time("approx rsd=0.02")(proj.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02),
        approx_count_distinct(col("l_partkey"), 0.02)).collect())
    time("approx rsd=0.05")(proj.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.05),
        approx_count_distinct(col("l_partkey"), 0.05)).collect())
    time("exact 2-distinct one agg (Expand)")(proj.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey"))).collect())
    time("exact separate x2")({
      proj.groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey"))).collect()
      proj.groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey"))).collect()
    })
    time("everything-in-one (Expand+sketches)")(proj.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
        approx_count_distinct(col("l_orderkey"), 0.02),
        approx_count_distinct(col("l_partkey"), 0.02)).collect())
    spark.stop()
  }
}
