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
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    // force EVERY column (hash-agg over the full row), so Catalyst can't
    // prune expensive operators the way a bare count() would — honest
    // timings for window/join-heavy queries. bit_xor (not sum): summing
    // 64-bit hashes is a random walk that overflows Long, and Spark 4's
    // default ANSI mode turns that into ARITHMETIC_OVERFLOW, failing
    // healthy queries mid-bench (this bug invalidated round 1's multi-row
    // timings — see BASELINE.md). NOTE: the xor aggregate exists ONLY to
    // force full evaluation; it cancels even-multiplicity rows, so do not
    // use it as a cross-run result-integrity hash — correctness lives in
    // Verify + the DuckDB oracle, not here.
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Boolean =
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).head()
        true
      } catch {
        case t: Throwable =>
          System.err.println(s"[bench] FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
      }
    // SPARK_GRAFT_ONLY=x08,x14 runs just the named (prefix-matched) queries —
    // for bisecting individual regressions without a full 50-query sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val results = selected.map { case (name, fn) =>
      // best of two runs: steady-state time, robust to host scheduling noise
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = runOnce(fn)
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      val sec = times.map(_._2).min
      val allOk = times.forall(_._1)
      System.err.println(f"[bench] $name%-28s $sec%8.2fs  " +
        f"(runs=${times.map(t => f"${t._2}%.2f").mkString("/")}  ok=$allOk)")
      name -> ((sec, allOk))
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, (_, ok)) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val allOk = results.forall(_._2._2)
    // headline fields LAST in the one JSON line: the driver tail-captures
    // output, so a truncated head must not eat total/all_ok (BENCH_r02 lost
    // its total that way); also persist the full line to bench_out.json so
    // the artifact survives any console truncation
    val json = s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"ok":$oks,"all_ok":$allOk,"value":$total}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
