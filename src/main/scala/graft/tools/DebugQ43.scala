package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off bisect probe for the q43 bench regression (VERDICT r5 item 1):
  * times the write leg and read+hash leg separately, 5 reps each.
  */
object DebugQ43 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    cust.count() // warm
    val tmp = graft.queries.ParityQueries.tmpPath("graft_json_dbg", sfDir)
    def time[A](label: String)(f: => A): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[dbg] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    // exact replica of Bench.runOnce over the registered q43 closure:
    // fresh DataFrame + write + declared-schema read + full-row hash per rep
    val fn = graft.SparkEntry.queries("q43_json_roundtrip")
    time("bench-replica") {
      val df = fn(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).head()
    }
    time("write")(cust.write.mode("overwrite").json(tmp))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c_nationkey",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("c_acctbal",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("c_mktsegment",
        org.apache.spark.sql.types.StringType)))
    time("read+hash") {
      val df = spark.read.schema(schema).json(tmp)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).head()
    }
    time("read+count")(spark.read.schema(schema).json(tmp).count())
    spark.stop()
  }
}
