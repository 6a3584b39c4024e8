package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev scratch: dump formatted physical plans for plan-quality review
  * (pushdown, exchange reuse, broadcast, codegen spans). */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_project", "q08_anomaly_join",
        "q17_transaction_pipeline", "q10_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val executed = names.contains("--executed")
    names.filterNot(_ == "--executed").foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      if (executed) {
        // run the query so AQE finalizes, then print the EXECUTED plan —
        // the `*(n)` markers show whole-stage-codegen span membership,
        // which the pre-execution formatted dump of an AdaptiveSparkPlan
        // cannot (evidence surface for codegen-span claims)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
