package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Executed-plan census for a set of queries: AQE-aware node counts
  * (shuffle exchanges, broadcasts, join flavors, windows, cartesians)
  * per query — the raw material for PlanGuardSpec's pinned budgets and
  * for auditing whether a refactor added an exchange.
  *
  *   runMain graft.tools.PlanAudit <sfDir> [q1,q2,...]
  *
  * With no query list it audits every SparkEntry query (slow — the
  * write/stream lifecycle fixtures execute fully). Dev tool, not part
  * of the shipped library surface. */
object PlanAudit {

  /** Walk an executed plan descending through AQE wrappers and reused
    * exchanges — the same traversal PlanGuardSpec uses, shared here so
    * guard counts and audit counts can never disagree. */
  def walk(n: SparkPlan): Seq[SparkPlan] = {
    val kids = n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    n +: kids.flatMap(walk)
  }

  final case class Census(shuffles: Int, broadcasts: Int, bhj: Int,
      smj: Int, bnlj: Int, cartesian: Int, windows: Int,
      unpartitionedWindows: Int)

  def census(plan: SparkPlan): Census = {
    val nodes = walk(plan)
    Census(
      shuffles = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      broadcasts = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
      bhj = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      smj = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      bnlj = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      cartesian = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      windows = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      unpartitionedWindows = nodes.count {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case _ => false
      })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    println(f"${"query"}%-28s shuf bcast bhj smj bnlj cart win unpartWin")
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE
        val c = census(df.queryExecution.executedPlan)
        println(f"$name%-28s ${c.shuffles}%4d ${c.broadcasts}%5d ${c.bhj}%3d " +
          f"${c.smj}%3d ${c.bnlj}%4d ${c.cartesian}%4d ${c.windows}%3d " +
          f"${c.unpartitionedWindows}%9d")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s FAILED ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
