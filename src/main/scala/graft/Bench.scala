package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen + parquet footer caches, so per-query
    // numbers measure the queries rather than JVM cold start
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    } catch { case _: Throwable => }
    import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // force EVERY column (hash-agg over the full row), so Catalyst can't
      // prune expensive operators the way a bare count() would — honest
      // timings for window/join-heavy queries
      val n = try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(sum("h")).head()
        1L
      } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2fs  ok=${n >= 0}")
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
