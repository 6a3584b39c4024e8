package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — point-frequency
  * estimates over an open vocabulary in fixed memory, the complement of
  * the Misra–Gries heavy-hitter state ([[graft.functions.FrequentItems]]
  * answers "what are the top items", CMS answers "how often does THIS
  * item occur" for any item, overcount-only error ≤ 2N/width with
  * probability 1 - 2^-depth per query).
  *
  * Scale shape: the sketch is depth x width driver longs — bounded model
  * state, the IVF-centroid convention — built by ONE pass over the token
  * frame (each occurrence fans out to its `depth` (row, bucket) cells in
  * a map-side posexplode, then one aggregate collapses to ≤ depth*width
  * rows). Sketches MERGE by elementwise addition (shard-and-merge at any
  * corpus scale), and estimation is MAP-ONLY: the flattened table rides
  * the plan as one literal, each probe token hashes `depth` times and
  * takes the min.
  *
  * Hashing is md5-derived (`cms<i>_<token>` -> first 8 hex chars ->
  * % width) — the engine-portable contract shared with
  * [[TextAnalysis.hashedLinearScore]], so a DuckDB oracle (or any
  * external system) reproduces every cell and every estimate exactly. */
object CountMin {

  final case class Sketch(depth: Int, width: Int,
      counts: Array[Array[Long]]) {
    require(counts.length == depth && counts.forall(_.length == width))
    /** Total occurrences — every row of the table sums to it. */
    def total: Long = counts(0).sum
    /** Elementwise merge: sketch(A ++ B) == sketch(A) merge sketch(B). */
    def merge(other: Sketch): Sketch = {
      require(other.depth == depth && other.width == width,
        s"dimension mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
      Sketch(depth, width, Array.tabulate(depth)(i =>
        Array.tabulate(width)(j => counts(i)(j) + other.counts(i)(j))))
    }
  }

  // the depth bucket indices in ONE native pass per row (r16:
  // Md5CmsBuckets — the replaced per-i
  // pmod(conv(substring(md5(concat(...)))) chain digested to hex and
  // string-parsed base-16 once per (occurrence, i), interpreted)
  private def bucketsExpr(tok: Column, depth: Int, width: Int): Column =
    graft.functions.Md5ShingleFunctions.md5_cms_buckets(tok, depth, width)

  /** Build a sketch from a token-occurrence frame (one row per
    * occurrence — the caller's explode). One corpus pass, one aggregate,
    * ≤ depth*width rows to the driver. NULL tokens are dropped (a null
    * is not an item; without the filter the null bucket row would NPE
    * the driver-side collect). */
  def build(df: DataFrame, tokCol: String, depth: Int = 4,
      width: Int = 1024): Sketch = {
    require(depth >= 1 && width >= 1)
    val cells = df.filter(col(tokCol).isNotNull)
      .select(posexplode(bucketsExpr(col(tokCol), depth, width))
        .as(Seq("i", "h")))
      .groupBy(col("i"), col("h")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    Sketch(depth, width, Array.tabulate(depth)(i =>
      Array.tabulate(width)(j => cells.getOrElse((i, j), 0L))))
  }

  /** Point estimate for a token column — min over the sketch's depth
    * rows; map-only, the table is one array literal. Never undercounts;
    * overcounts by hash collisions only. The depth hashes ride one
    * native array; the per-cell lookup lambda is cheap arithmetic over
    * a literal, so the zip_with stays, with array_min ≡ the replaced
    * least(...) fold (no element is ever null: buckets are non-null and
    * the table is a dense literal). */
  def estimateExpr(tok: Column, sk: Sketch): Column = {
    val flat = typedlit(sk.counts.flatten.toSeq)
    array_min(zip_with(
      bucketsExpr(tok, sk.depth, sk.width),
      typedlit((0 until sk.depth).map(_ * sk.width)),
      (b, off) => element_at(flat, b + off + 1)))
  }

  /** Persist a sketch as one (depth, width, i, h, c) parquet — the
    * monitoring-state pattern of the x104 minhash signature store: a
    * sketch built from today's shard [[Sketch.merge]]s into yesterday's
    * persisted state without re-reading any history (CMS addition is
    * commutative and associative), so corpus-frequency monitoring is
    * ingest-incremental. Dimensions ride every row; [[read]] refuses a
    * mixed-dimension file rather than merging tables that don't align. */
  def write(spark: org.apache.spark.sql.SparkSession, sk: Sketch,
      path: String): Unit = {
    import spark.implicits._
    // A sentinel row (i = -1) always carries the dimensions: an all-zero
    // sketch (e.g. the first micro-batch tokenized to nothing) would
    // otherwise persist as an EMPTY parquet that read() rejects, wedging
    // every later ingest() against the store until it's deleted.
    (Seq((sk.depth, sk.width, -1, -1, 0L)) ++
      (for { i <- 0 until sk.depth; j <- 0 until sk.width
             if sk.counts(i)(j) != 0L }
        yield (sk.depth, sk.width, i, j, sk.counts(i)(j))))
      .toDF("depth", "width", "i", "h", "c")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): Sketch = {
    val rows = spark.read.parquet(path)
      .select(col("depth"), col("width"), col("i"), col("h"), col("c"))
      .collect()
    require(rows.nonEmpty, s"empty sketch store at $path")
    val dims = rows.map(r => (r.getInt(0), r.getInt(1))).distinct
    require(dims.length == 1, s"mixed sketch dimensions in $path: ${dims.toSeq}")
    val (depth, width) = dims.head
    val counts = Array.fill(depth)(new Array[Long](width))
    // i = -1 is the dimension sentinel (pre-sentinel stores lack it and
    // still read fine — they are by construction non-empty)
    rows.filter(_.getInt(2) >= 0)
      .foreach(r => counts(r.getInt(2))(r.getInt(3)) = r.getLong(4))
    Sketch(depth, width, counts)
  }

  /** Merge a shard's sketch into the persisted state (read → merge →
    * overwrite; the swap is one tiny file). Returns the merged sketch. */
  def ingest(spark: org.apache.spark.sql.SparkSession, path: String,
      shard: Sketch): Sketch = {
    val merged = read(spark, path).merge(shard)
    write(spark, merged, path)
    merged
  }
}
