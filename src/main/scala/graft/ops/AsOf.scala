package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, attach the most recent right row with
  * `right.time <= left.time` within the same key (the time-series
  * enrichment join Spark lacks as a built-in operator).
  *
  * Implementation composes existing operators (preference order (a) from
  * the engine rules — no custom physical operator needed): tag both sides,
  * union, then one window pass per key ordered by (time, tag) taking the
  * running `last(..., ignoreNulls)` of the right payload. Cost: ONE hash
  * exchange on the key + one in-partition sort — the same shuffle an
  * equi-join would pay, with none of the range-condition blowup a naive
  * non-equi join has (Spark would nested-loop it). Ties: a right row at
  * exactly left.time IS visible (tag orders right before left), matching
  * the `>=` convention of SQL ASOF joins.
  */
object AsOf {

  /** @param left    probe side (each row gets enriched)
    * @param right   reference side (key + time + payload; payload columns
    *                arrive on the output prefixed, incl. the matched time)
    * @param keyCol  equality key shared by both sides
    * @param timeCol ordering column shared by both sides
    * @param prefix  prefix for attached right columns */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, prefix: String = "asof_"): DataFrame = {
    val rightPayload = right.columns.toSeq.filterNot(_ == keyCol)
    val leftExtra = left.columns.toSeq.filterNot(c => c == keyCol || c == timeCol)

    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol).as("__t"), lit(0).as("__tag")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"$prefix$c"))): _*)
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(timeCol).as("__t"), lit(1).as("__tag")) ++
        leftExtra.map(col) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"$prefix$c"))): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = taggedRight.unionByName(taggedLeft)
    val filled = unioned.select(
      (Seq(col(keyCol), col("__t"), col("__tag")) ++
        leftExtra.map(col) ++
        rightPayload.map(c =>
          last(col(s"$prefix$c"), ignoreNulls = true).over(w).as(s"$prefix$c"))): _*)
    filled.filter(col("__tag") === 1)
      .withColumnRenamed("__t", timeCol)
      .drop("__tag")
      .select((left.columns.toSeq.map(col) ++
        rightPayload.map(c => col(s"$prefix$c"))): _*)
  }
}
