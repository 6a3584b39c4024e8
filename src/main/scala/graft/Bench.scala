package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
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
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def r2(x: Double): Double = math.rint(x * 100) / 100
    // SPARK_GRAFT_ONLY=x08,x14 runs just the named (prefix-matched) queries —
    // for bisecting individual regressions without a full sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    case class Res(name: String, best: Double, med: Double, runs: Seq[Double],
        ok: Boolean, stages: Map[String, Double])
    val results = selected.map { case (name, fn) =>
      // median-of-N (default 3) is the headline number — robust to host
      // scheduling noise that best-of-2 hid (r3's q38 swung 3s->14s across
      // hosts with no code change); best is kept alongside for steady-state
      graft.bench.StageTimers.drain() // discard any stale stage timers
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = runOnce(fn)
        (ok, (System.nanoTime() - t0) / 1e9, graft.bench.StageTimers.drain())
      }
      val times = runs.map(_._2)
      // per-stage median across the runs that reported that stage
      val stages = runs.flatMap(_._3.keys).distinct.map { st =>
        st -> r2(median(runs.flatMap(_._3.get(st))))
      }.toMap
      val res = Res(name, times.min, median(times), times, runs.forall(_._1), stages)
      System.err.println(f"[bench] $name%-28s med=${res.med}%7.2fs best=${res.best}%7.2fs " +
        f"(runs=${times.map(t => f"$t%.2f").mkString("/")} ok=${res.ok}" +
        (if (stages.nonEmpty) s" stages=$stages" else "") + ")")
      res
    }
    val qs = results.map(r => "\"" + r.name + "\":" + r2(r.med))
      .mkString("{", ",", "}")
    val failed = results.filterNot(_.ok).map("\"" + _.name + "\"")
      .mkString("[", ",", "]")
    // stage keys are globally namespaced by query name (a bare stage name
    // from a second StageTimers user would otherwise produce duplicate
    // JSON keys in this flattened object)
    val stageJson = results.filter(_.stages.nonEmpty).flatMap(r =>
        r.stages.toSeq.sortBy(_._1).map { case (st, v) =>
          val key = if (st.startsWith(r.name.takeWhile(_ != '_'))) st
            else r.name + "." + st
          "\"" + key + "\":" + v
        })
      .mkString("{", ",", "}")
    val medTotal = r2(results.map(_.med).sum)
    val bestTotal = r2(results.map(_.best).sum)
    val allOk = results.forall(_.ok)
    // stdout line = the driver's parseable artifact. Kept COMPACT (2dp
    // medians, failed-list instead of a per-query ok map) because the
    // driver tail-captures a bounded window: BENCH_r02/r03 both ended up
    // "parsed": null when the line outgrew it. Headline fields stay LAST so
    // even a truncated head preserves total/all_ok. Full detail (per-run
    // times, best, stages) goes to bench_out.json, which the judge reads.
    val json = s"""{"metric":"total","unit":"sec","sf":"$sfDir","reps":$reps,"queries":$qs,"stages":$stageJson,"failed":$failed,"best_total":$bestTotal,"all_ok":$allOk,"value":$medTotal}"""
    val detail = results.map { r =>
      "\"" + r.name + "\":{\"med\":" + r2(r.med) + ",\"best\":" + r2(r.best) +
        ",\"runs\":[" + r.runs.map(r2).mkString(",") + "]" +
        (if (r.stages.nonEmpty)
          ",\"stages\":{" + r.stages.toSeq.sortBy(_._1)
            .map { case (s, v) => "\"" + s + "\":" + v }.mkString(",") + "}"
        else "") + "}"
    }.mkString("{", ",", "}")
    val fullJson = s"""{"metric":"total","unit":"sec","sf":"$sfDir","reps":$reps,"detail":$detail,"failed":$failed,"best_total":$bestTotal,"all_ok":$allOk,"value":$medTotal}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), fullJson + "\n")
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
