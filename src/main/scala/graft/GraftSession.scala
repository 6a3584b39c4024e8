package graft

import org.apache.spark.sql.SparkSession

/** Standard session builder for graft deployments: the engine's recommended
  * runtime configuration in one place (the analogue of the reference's
  * `create_spark_session`, `/root/reference/src/utils/spark_session.py:7-33`,
  * minus the cloud-credential plumbing).
  *
  * Settings and why:
  *  - AQE + coalescing + skew-join: runtime re-planning is the first-line
  *    answer to stale stats and skew at 100 TB.
  *  - shuffle partitions sized to the caller's parallelism (cluster deploys
  *    pass cores x executors x 2-3; never the 200 default).
  *  - UTC session timezone: deterministic calendar functions.
  *  - legacy nanos-as-long: tolerate TIMESTAMP(NANOS) parquet inputs.
  *  - native vector functions registered for SQL users.
  */
object GraftSession {

  def builder(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Int = 32): SparkSession.Builder = {
    var b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    master.foreach(m => b = b.master(m))
    b
  }

  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val s = builder(appName, Some(s"local[$cores]"), shufflePartitions = cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(s)
    s
  }
}
