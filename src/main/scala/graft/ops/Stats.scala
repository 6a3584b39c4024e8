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
    * aggregate row. Determinism contract: each per-row term is snapped
    * to the 6dp micro-unit grid BEFORE summation
    * (`round(c·1e6).cast(long)`, the [[TextAnalysis.mean6Exact]]
    * playbook) and the longs ride a DECIMAL(38,0) sum — exact integer
    * arithmetic, order-invariant, and identical in any engine. A
    * double→DECIMAL(38,18) cast of the raw product does NOT work here:
    * Spark casts the shortest decimal repr (`BigDecimal.valueOf`) while
    * DuckDB expands the exact binary value, and at x ≈ 2·10⁴ (epoch
    * days) the x·y products carry >17 significant digits so the two
    * expansions diverge and survive ROUND(…,6) — measured live in r11
    * (x = 20623.123456789 → `…600000000000` vs `…647960297472`). The
    * grid snap's hard bound is the LONG cast: |term·1e6| must stay
    * below 2⁶³ or Spark's double→long saturates SILENTLY at
    * Long.MaxValue (DuckDB's HUGEINT does not — the engines diverge
    * exactly where the sums go wrong), so every per-row term (x, y,
    * x·y, x², y²) must satisfy |term| ≤ 9·10¹² — enforced with a
    * per-row `raise_error` guard, loud failure over silent saturation.
    * Within that range both engines see the identical double: below
    * |term·1e6| < 2⁵² every N.5 tie point is representable and
    * round-half agrees; above it double spacing ≥ 1 means the product
    * is already integral and rounding is the identity on both sides.
    * Epoch-day products sit at ≤ ~4·10¹⁴ in micro-units — comfortably
    * inside. Per-row quantization
    * at 1e-6 is far below the 6dp output rounding for trend-sized
    * groups. The closed-form arithmetic downstream is fixed-order
    * doubles seeded from identical integers. The cancellation in
    * n·Σx² − (Σx)² is the textbook one — centering x upstream buys
    * precision when x spans are tiny relative to magnitude;
    * determinism holds either way because both engines difference the
    * identical doubles. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val decI = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    def s(c: org.apache.spark.sql.Column) = {
      // long-saturation guard: |term| > 9e12 would silently clamp at
      // Long.MaxValue after the 1e6 grid snap — fail loudly instead
      val g = when(c.isNull || abs(c) <= lit(9.0e12), c).otherwise(raise_error(
        concat(lit("groupedOls: |term| exceeds the 9e12 exact-grid "
          + "bound (long saturation at 9.2e12 micro-units): "),
          c.cast("string"))))
      sum(round(g * 1e6).cast("long").cast(decI)).cast("double") / 1e6
    }
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
