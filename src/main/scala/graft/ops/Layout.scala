package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * engine-side equivalent of Delta's OPTIMIZE ZORDER BY. A table sorted
  * by ONE column prunes scans only on that column's predicates; files
  * written in Z-order carry TIGHT min/max ranges on EVERY interleaved
  * dimension, so parquet row-group/file skipping works for predicates on
  * any of them — at 100 TB the difference between scanning a slice and
  * scanning the lake. Extension surface (north star; not in reference
  * scope).
  *
  * All arithmetic is integer shift/mask column expressions (codegen'd
  * built-ins, engine-replayable — no UDF, no driver state beyond two
  * min/max scalars riding a broadcast). */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * value (the classic parallel-prefix magic-mask chain). */
  def spreadBits16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit values: a's bits land even,
    * b's odd. */
  def interleave16(a16: Column, b16: Column): Column =
    spreadBits16(a16).bitwiseOR(shiftleft(spreadBits16(b16), 1))

  /** Min/max-normalize an integral column to 16 bits: exact integer
    * arithmetic (((v − min)·65535) div (max − min)), so the key is
    * bit-identical on any engine; a constant column maps to 0. Spark's
    * Column `/` on longs is DOUBLE division, whose round-to-nearest can
    * cross an integer just below the true quotient — the subtraction of
    * the remainder first makes the double division exact (an exact
    * multiple ≤ 2^53), i.e. a true integral div. */
  def normalize16(v: Column, minV: Column, maxV: Column): Column = {
    def intDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    when(maxV === minV, lit(0L)).otherwise(
      intDiv((v.cast("long") - minV) * 65535L, maxV - minV))
  }

  /** Add `z_key`: the 32-bit Z-order key of two integral columns,
    * min/max-normalized to 16 bits each. The min/max pass is one tiny
    * aggregate riding a broadcast; the key itself is a map-only
    * projection. Write with [[writeZOrdered]] (or feed your own range
    * partitioner) to realize the layout. */
  def zOrderKey(df: DataFrame, colA: String, colB: String): DataFrame = {
    val bounds = df.agg(
      min(col(colA).cast("long")).as("__mna"),
      max(col(colA).cast("long")).as("__mxa"),
      min(col(colB).cast("long")).as("__mnb"),
      max(col(colB).cast("long")).as("__mxb"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z_key", interleave16(
        normalize16(col(colA), col("__mna"), col("__mxa")),
        normalize16(col(colB), col("__mnb"), col("__mxb"))))
      .drop("__mna", "__mxa", "__mnb", "__mxb")
  }

  /** Write `df` clustered by the Z-order key of (colA, colB):
    * range-partition on z_key (one exchange — contiguous z-ranges per
    * output file, which is what gives every file a bounded sub-rectangle
    * in (A, B) space), sort within partitions (row-group-level min/max
    * tightness inside each file), drop the key, write parquet. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int = 32): Unit =
    zOrderKey(df, colA, colB)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions(col("z_key"))
      .drop("z_key")
      .write.mode("overwrite").parquet(path)

  /** Clustering-quality readout: bucket rows by the top `bucketBits` of
    * their z_key (a contiguous z-range ≈ one output file) and emit each
    * bucket's row count and per-dimension min/max — the exact statistics
    * a parquet reader prunes on. Tight rectangles on BOTH dimensions are
    * the Z-order property; a single-column sort shows tight A and
    * full-span B. */
  def zBucketStats(df: DataFrame, colA: String, colB: String,
      bucketBits: Int = 8): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16, "bucketBits in 1..16")
    zOrderKey(df, colA, colB)
      .withColumn("bucket", shiftright(col("z_key"), 32 - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(colA).cast("long")).as("min_a"),
        max(col(colA).cast("long")).as("max_a"),
        min(col(colB).cast("long")).as("min_b"),
        max(col(colB).cast("long")).as("max_b"))
  }
}
