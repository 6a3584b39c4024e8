package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI drive of the spark.sql.extensions deployment path: fresh session
  * with graft.GraftExtensions, native functions available from pure SQL. */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cs,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       shingle_hashes(array('a','b','c'), 2) AS sh""".stripMargin).head()
    println(s"[ext] cosine_sim=${row.getDouble(0)} dot_product=${row.getDouble(1)} " +
      s"shingles=${row.getSeq[Long](2).length}")
    spark.stop()
  }
}
