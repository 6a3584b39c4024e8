package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed statistics beyond the built-in aggregates. Extension
  * surface (north star; not in reference scope). */
object Stats {

  /** Grouped simple linear regression (closed-form OLS): per group, fit
    * y = slope·x + intercept and report n, slope, intercept, r2 — the
    * trend readout behind balance-drift monitors, per-segment rate
    * fits, and any "is this metric moving" question that a mean alone
    * can't answer. Degenerate groups (constant x) emit slope 0 /
    * intercept = mean(y) / r2 0 rather than NaN.
    *
    * Scale shape: ONE group-keyed aggregate carrying the five
    * sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) with map-side
    * partials — the exchange is groups-sized, the formula runs on the
    * aggregate row. Determinism contract: sums ride DECIMAL(38,18)
    * (exact, order-invariant — the [[Similarity.embeddingMoments]]
    * convention; keep |x|,|y| ≲ 1e9 so products stay inside the 20
    * integer digits), the closed-form arithmetic is fixed-order
    * doubles, outputs round 6dp. The cancellation in n·Σx² − (Σx)² is
    * the textbook one — centering x upstream buys precision when x
    * spans are tiny relative to magnitude; determinism holds either
    * way because both engines difference the identical doubles. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    def s(c: org.apache.spark.sql.Column) = sum(c.cast(dec)).cast("double")
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"), s(x).as("__sx"), s(y).as("__sy"),
      s(x * y).as("__sxy"), s(x * x).as("__sxx"), s(y * y).as("__syy"))
    val nD = col("n").cast("double")
    val den = nD * col("__sxx") - col("__sx") * col("__sx")
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val denY = nD * col("__syy") - col("__sy") * col("__sy")
    val slope = when(den === 0.0, 0.0).otherwise(num / den)
    val intercept = (col("__sy") - slope * col("__sx")) / nD
    val r2 = when(den === 0.0 || denY === 0.0, 0.0)
      .otherwise(num * num / (den * denY))
    agg.select(col(groupCol), col("n"), round(slope, 6).as("slope"),
      round(intercept, 6).as("intercept"), round(r2, 6).as("r2"))
  }
}
