package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without a nested loop.
  *
  * Spark plans a bare `p.x BETWEEN i.lo AND i.hi` join as broadcast-
  * nested-loop (fine only while the interval side is tiny). The scalable
  * shape bins the number line: each interval explodes into the fixed-width
  * bins it covers, each point computes its single bin, both sides hash-join
  * on the bin, and the exact predicate filters the candidates. Cost:
  * O(intervals x span/binWidth) replication + one equi-join shuffle —
  * choose `binWidth` near the typical interval span so replication stays
  * O(1) per interval.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them:
    * `lo <= point < hi` (half-open, so adjacent intervals don't double-
    * match their shared boundary). */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val binnedPoints = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
