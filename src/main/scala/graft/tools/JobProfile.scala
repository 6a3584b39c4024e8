package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-time profile of one SparkEntry query — the
  * evidence layer under the coarse StageTimers: prints every job the
  * query schedules (with its call site) and its duration, so
  * fixture-heavy queries like x48 can be attributed to specific
  * actions rather than argued about. Usage:
  *   runMain graft.tools.JobProfile <query> <sfDir>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, desc: String, t0: Long, var dt: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId,
              s.description.linesIterator.toSeq.headOption.getOrElse(""))
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        val execId = p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
        val d = execId.map(id => s"exec=$id " +
            Option(execDesc.get(id.toLong)).getOrElse(""))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, Job(js.jobId, d, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.dt = je.time - j.t0
      }
    }

    val fn = graft.SparkEntry.queries(query)
    // warm-up rep (JIT + code paths), then the measured rep
    fn(spark, sfDir).collect()
    jobs.clear()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).collect().length
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val all = jobs.values.asScala.toSeq.sortBy(_.id)
    println(f"[jobprofile] $query rows=$n total=$total%.2fs jobs=${all.size}")
    all.foreach { j =>
      println(f"[jobprofile]   job ${j.id}%3d ${j.dt / 1000.0}%6.2fs  ${j.desc.take(110)}")
    }
    val sum = all.map(_.dt).sum / 1000.0
    // job-time can exceed wall time: AQE submits independent shuffle-stage
    // jobs of one execution concurrently
    println(f"[jobprofile] job-time sum=$sum%.2fs wall=$total%.2fs (sum>wall = concurrent AQE stage-jobs)")
    all.groupBy(_.desc).toSeq
      .map { case (d, js) => (d, js.size, js.map(_.dt).sum / 1000.0) }
      .sortBy(-_._3)
      .foreach { case (d, n, t) =>
        println(f"[jobprofile] byexec $t%6.2fs jobs=$n%3d  ${d.take(100)}")
      }
    spark.stop()
  }
}
