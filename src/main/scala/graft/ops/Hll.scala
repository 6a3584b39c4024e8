package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch (Flajolet et al. 2007) with an
  * ENGINE-PORTABLE register contract — the distinct-count complement of
  * the frequency sketches ([[CountMin]] answers "how often does THIS
  * item occur", [[graft.functions.MisraGries]] "what are the top items",
  * HLL answers "how many DISTINCT items" in m small registers).
  *
  * Scale shape: registers are (bucket, rho) rows — at most `m = 2^p`
  * per group regardless of input size. Building is ONE pass (map-side
  * bucket/rho projection into a (group, bucket)-keyed max aggregate
  * whose partial aggregation collapses each partition to ≤ m rows before
  * the exchange). Registers MERGE by elementwise MAX — idempotent AND
  * commutative, so shard replay and re-ingest are free (strictly
  * stronger than CMS's additive merge, where double-ingest double
  * counts), which is what makes the persisted store safe to re-feed.
  * Estimation reads ≤ m rows per group.
  *
  * Portability: the hash is the library's md5 contract
  * (`hll_<token>` -> first 8 hex chars -> 32-bit value; bucket = top
  * `p` bits, rho = leading-zero count of the remaining `w = 32-p` bits
  * + 1, computed by an exact comparison chain, not floating log). Every
  * register and every estimate therefore replays bit-for-bit in DuckDB
  * or any engine with md5 — the same planted-parameter discipline that
  * moved the IVF/PQ family to value-level oracles. The estimator's
  * float work is deterministic by construction: each `2^-rho` term is
  * `1.0 / (1L << rho)` (exact IEEE), and the sum of ≤ m such dyadic
  * terms is exactly representable (≤ 23 fractional bits, total < 2^10,
  * well inside the 53-bit mantissa) so it is partition-order-invariant;
  * the one `ln` in the small-range branch is guarded by the library's
  * round6 convention.
  *
  * Accuracy: standard error ≈ 1.04/sqrt(m) (~3.3% at p=10); the
  * small-range branch (linear counting) applies below 2.5m, the 32-bit
  * large-range correction above 2^32/30. The 8-hex (32-bit) hash is the
  * portability trade: hash collisions bound the sketch's usable range
  * to ~100M distinct per group — the documented envelope, far above any
  * per-group cardinality the monitoring queries track. */
object Hll {

  /** Default precision: 2^10 = 1024 registers, ~3.3% standard error. */
  val DefaultP = 10

  private def m(p: Int): Int = 1 << p

  /** Flajolet's bias-correction constant for m >= 128. Computed with the
    * same IEEE expression the oracle SQL writes out, so both engines use
    * the identical double. */
  def alpha(p: Int): Double = {
    require(p >= 7 && p <= 16, s"p must be in [7,16], got $p")
    0.7213 / (1.0 + 1.079 / m(p))
  }

  /** 32-bit md5-derived hash, the portable contract shared with
    * [[CountMin]] / hashedLinearScore. */
  def hash32(tok: Column): Column =
    conv(substring(md5(concat(lit("hll_"), tok).cast("binary")), 1, 8),
      16, 10).cast("long")

  /** Register index = top p bits of the 32-bit hash. */
  def bucketExpr(tok: Column, p: Int = DefaultP): Column =
    shiftright(hash32(tok), 32 - p).cast("int")

  /** rho = position of the first 1-bit in the low w = 32-p bits (1-based
    * from the left), w+1 when they are all zero. An exact integer
    * comparison chain — floating log would misplace values adjacent to
    * powers of two. */
  def rhoExpr(tok: Column, p: Int = DefaultP): Column = {
    val w = 32 - p
    val suffix = hash32(tok).bitwiseAND(lit((1L << w) - 1L))
    (1 to w).foldRight(lit(w + 1): Column) { (r, els) =>
      // first 1-bit at position r (from the left) <=> suffix >= 2^(w-r)
      when(suffix >= lit(1L << (w - r)), lit(r)).otherwise(els)
    }.cast("int")
  }

  /** Per-group register frame: one (groupCols..., bucket, rho) row per
    * NON-ZERO register, ≤ m rows per group. Null tokens are not items
    * and are dropped. Partial aggregation collapses each partition to
    * ≤ groups×m rows before the single exchange. */
  def registers(df: DataFrame, tokCol: String, groupCols: Seq[String] = Nil,
      p: Int = DefaultP): DataFrame = {
    // one native digest per occurrence (r16: Md5HllRegister) — the
    // bucketExpr/rhoExpr column spellings stay above as the oracle/spec
    // reference; they paid the md5-hex conv parse per leg plus a w-deep
    // comparison ladder per token
    val reg = graft.functions.Md5ShingleFunctions
      .md5_hll_register(col(tokCol), p)
    val keyed = df.filter(col(tokCol).isNotNull)
      .select((groupCols.map(col) :+ reg.as("__reg")): _*)
      .select((groupCols.map(col) :+ col("__reg")("bucket").as("bucket")
        :+ col("__reg")("rho").as("rho")): _*)
    keyed.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Cardinality estimate per group from a register frame (the
    * [[registers]] output or the persisted store): raw HLL with the
    * standard small-range (linear counting) and 32-bit large-range
    * corrections, rounded to 6dp (the library's cross-engine float
    * convention). Emits `n_registers` (non-zero) alongside `est` so the
    * register state itself is oracle-visible. */
  def estimate(regDf: DataFrame, groupCols: Seq[String] = Nil,
      p: Int = DefaultP): DataFrame = {
    val mm = m(p).toDouble
    val grouped =
      if (groupCols.isEmpty) regDf.groupBy()
      else regDf.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("n_registers"),
      sum(lit(1.0) / expr("shiftleft(cast(1 as bigint), rho)")).as("__pow"))
    val s = (lit(mm) - col("n_registers")) + col("__pow")
    val raw = lit(alpha(p) * mm * mm) / s
    val zeros = lit(mm) - col("n_registers")
    val two32 = math.pow(2.0, 32)
    val est = when(raw <= lit(2.5 * mm) && zeros > 0,
        lit(mm) * log(lit(mm) / zeros))
      .when(raw > lit(two32 / 30.0),
        lit(-two32) * log(lit(1.0) - raw / lit(two32)))
      .otherwise(raw)
    agg.withColumn("est", round(est, 6)).drop("__pow")
  }

  /** Driver-held sketch for the persisted-store path — register array of
    * size m, the IVF-centroid bounded-model-state convention. */
  final case class Sketch(p: Int, regs: Array[Int]) {
    require(regs.length == m(p), s"need ${m(p)} registers, got ${regs.length}")
    /** Elementwise max: sketch(A ++ B) == sketch(A) merge sketch(B);
      * idempotent, so replaying a shard is a no-op. */
    def merge(other: Sketch): Sketch = {
      require(other.p == p, s"precision mismatch: $p vs ${other.p}")
      Sketch(p, Array.tabulate(regs.length)(i => regs(i) max other.regs(i)))
    }
    def estimate: Double = {
      val mm = m(p).toDouble
      var pow = 0.0
      var zeros = 0
      regs.foreach { r =>
        if (r == 0) zeros += 1 else pow += 1.0 / (1L << r)
      }
      val s = zeros + pow
      val raw = alpha(p) * mm * mm / s
      val two32 = math.pow(2.0, 32)
      val est =
        if (raw <= 2.5 * mm && zeros > 0) mm * math.log(mm / zeros)
        else if (raw > two32 / 30.0) -two32 * math.log(1.0 - raw / two32)
        else raw
      // HALF_UP like Spark's round(), so store-path and query-path agree
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Build a driver sketch from a token frame — the [[registers]]
    * aggregate collected (≤ m tiny rows). */
  def build(df: DataFrame, tokCol: String, p: Int = DefaultP): Sketch = {
    val regs = new Array[Int](m(p))
    registers(df, tokCol, Nil, p).collect()
      .foreach(r => regs(r.getInt(0)) = r.getInt(1))
    Sketch(p, regs)
  }

  /** Persist as one (p, bucket, rho) parquet. A sentinel row (bucket =
    * -1) always carries the precision so an all-zero sketch (empty first
    * shard) still round-trips — the CMS store lesson. */
  def write(spark: SparkSession, sk: Sketch, path: String): Unit = {
    import spark.implicits._
    (Seq((sk.p, -1, 0)) ++
      sk.regs.zipWithIndex.collect { case (r, b) if r != 0 => (sk.p, b, r) })
      .toDF("p", "bucket", "rho")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): Sketch = {
    val rows = spark.read.parquet(path)
      .select(col("p"), col("bucket"), col("rho")).collect()
    require(rows.nonEmpty, s"empty register store at $path")
    val ps = rows.map(_.getInt(0)).distinct
    require(ps.length == 1, s"mixed precisions in $path: ${ps.toSeq}")
    val regs = new Array[Int](m(ps.head))
    rows.filter(_.getInt(1) >= 0)
      .foreach(r => regs(r.getInt(1)) = r.getInt(2))
    Sketch(ps.head, regs)
  }

  /** Max-merge a shard's sketch into the persisted state (read -> merge
    * -> overwrite; the swap is one tiny file). Idempotent: re-ingesting
    * the same shard leaves the store unchanged. Returns the merged
    * sketch. */
  def ingest(spark: SparkSession, path: String, shard: Sketch): Sketch = {
    val merged = read(spark, path).merge(shard)
    write(spark, merged, path)
    merged
  }
}
