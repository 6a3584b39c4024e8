package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Layout]] — Morton interleave bit-correctness against a Scala
  * reference, and the Z-order property itself: contiguous z-ranges bound
  * BOTH dimensions (a single-column sort bounds one and leaves the other
  * full-span). */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("interleave16 matches the bitwise reference on random 16-bit pairs") {
    def spread(x: Int): Long =
      (0 until 16).map(i => ((x >> i) & 1).toLong << (2 * i)).sum
    val rnd = new scala.util.Random(11)
    val pairs = (0 until 200).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) =>
      spread(a.toInt) | (spread(b.toInt) << 1)
    }
    assert(got.toSeq === want)
  }

  test("zBucketStats: contiguous z-ranges bound both dimensions (tiles)") {
    // full 64x64 grid -> 6 bucket bits = 3 per dimension = 8x8 tiles;
    // each bucket must cover a bounded sub-rectangle in BOTH dims,
    // where a plain sort on `a` would leave b spanning 0..63 everywhere
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
    val stats = Layout.zBucketStats(grid.toDF("a", "b"), "a", "b",
        bucketBits = 6)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(stats.length === 64)
    stats.foreach { case (n, mna, mxa, mnb, mxb) =>
      assert(n === 64L)
      assert(mxa - mna <= 10, s"a-span ${mxa - mna} exceeds tile bound")
      assert(mxb - mnb <= 10, s"b-span ${mxb - mnb} exceeds tile bound")
    }
  }

  test("normalize16 is exact integral division (no double-rounding drift)") {
    // values where numerator/denominator sits just under an integer —
    // the case naive double division rounds across
    val df = Seq(0L, 1L, 2L, 999999L, 1000000L).toDF("v")
    val got = df.select(Layout.normalize16(col("v"), lit(0L),
        lit(1000000L)).as("n16"))
      .collect().map(_.getLong(0))
    val want = Seq(0L, 1L, 2L, 999999L, 1000000L)
      .map(v => v * 65535L / 1000000L)
    assert(got.toSeq === want)
  }
}
