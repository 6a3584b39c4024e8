package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking and cross-version chunk reuse.
  *
  * The fixed-width chunkers ([[TextAnalysis]] token windows,
  * [[Packing.sequenceAssignments]]) index a document by OFFSET, so one
  * character inserted at the head relabels every downstream chunk — a
  * re-crawled corpus where 1% of each page changed reads as 100% new
  * at chunk granularity. CDC (LBFS, Muthitacharoen et al. SOSP '01;
  * FastCDC, Xia et al. USENIX ATC '16) cuts where a rolling hash of
  * the last few dozen characters hits a mask: boundaries are functions
  * of LOCAL CONTENT, so the chunk walk re-synchronizes right after an
  * edit and every later chunk hashes identically to the previous
  * version's. That turns cross-version dedup ([[chunkReuse]]) into a
  * digest semi-join — the storage/delta readout behind incremental
  * re-crawl ingestion, revision-history dedup, and edit-stable RAG
  * chunk caches. Reference has no chunking surface; extension op.
  *
  * Scale shape: chunking is MAP-ONLY on both paths (one per-row pass —
  * a native gear-hash expression in production, engine-native md5 over
  * per-row position arrays on the portable path), so it never shuffles
  * and never carries text across an exchange; downstream joins move
  * only narrow (id, digest, len) rows. At 100 TB the chunker runs at
  * scan speed and the reuse join shuffles digests, ~2% of corpus bytes
  * at the default ~48-char expected chunk.
  *
  * Hash families (the [[Dedup.winnowFingerprints]] convention):
  * [[chunks]] = production gear/xxhash64; [[chunksPortable]] = md5-h60
  * candidates, the oracle-checkable surface DuckDB replays exactly
  * (candidate predicate as a `list_filter` over md5 grams, the
  * boundary walk as a recursive CTE). Both share the acceptance
  * semantics of [[graft.functions.CdcBoundaryWalk]]; they are pinned
  * by spec to the same contract (bounds, concatenation identity,
  * post-edit resync), not to identical cut positions. */
object Cdc {

  /** Portable content-defined chunks: candidate cut at every position
    * whose trailing k-gram's md5-h60 (top 60 digest bits — the value
    * DuckDB spells `CAST('0x' || substring(md5(...), 1, 15) AS
    * BIGINT)`, pinned bit-equal by spec) is ≡ 0 (mod `divisor`),
    * accepted under min/max bounds by the shared boundary walk.
    * Expected chunk length ≈ minLen + divisor. Map-only: ONE native
    * per-row pass ([[graft.functions.Md5CdcChunks]] — a higher-order
    * transform/filter spelling evaluated its md5 chain interpreted
    * per position, ~60× slower) — no explode, no shuffle, text never
    * leaves its row. Output: (id, idx, start, len, digest) with
    * digest = md5 hex of the chunk text (engine-portable);
    * offsets/lengths in characters, hashing over UTF-8 bytes.
    * Empty/null text → no rows. One md5 per character, so ~4× the
    * gear path's cost per byte; production = [[chunks]]. */
  def chunksPortable(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, divisor: Int = 16, minLen: Int = 24,
      maxLen: Int = 96): DataFrame = {
    val t = col("__t")
    explodeChunks(
      docs.select(col(idCol).as("id"), col(textCol).as("__t"))
        .withColumn("__chunks",
          graft.functions.CdcFunctions.md5_cdc_chunks(t, k, divisor,
            minLen, maxLen)),
      md5(t.substr(col("__c.start") + 1, col("__c.len")).cast("binary")))
  }

  /** Production content-defined chunks: one native gear-hash pass per
    * row ([[graft.functions.GearCdcChunks]] — shift+add per char, the
    * hash's memory is the last 64 chars by construction). Expected
    * chunk length ≈ minLen + 2^maskBits. Output shape mirrors
    * [[chunksPortable]] with digest = xxhash64 of the chunk text
    * (bigint — the narrow join key for [[chunkReuse]] at scale). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      maskBits: Int = 6, minLen: Int = 64, maxLen: Int = 512): DataFrame = {
    val t = col("__t")
    explodeChunks(
      docs.select(col(idCol).as("id"), col(textCol).as("__t"))
        .withColumn("__chunks",
          graft.functions.CdcFunctions.gear_cdc_chunks(t, maskBits, minLen,
            maxLen)),
      xxhash64(t.substr(col("__c.start") + 1, col("__c.len"))))
  }

  private def explodeChunks(withChunks: DataFrame, digest: Column)
      : DataFrame =
    withChunks
      .select(col("id"), col("__t"),
        posexplode(col("__chunks")).as(Seq("idx", "__c")))
      .select(col("id"), col("idx"), col("__c.start").as("start"),
        col("__c.len").as("len"), digest.as("digest"))

  /** Cross-version chunk reuse: for every document of the NEW version,
    * how many of its chunks (and what fraction of its characters)
    * already exist anywhere in the OLD version's chunk set. Both
    * inputs are chunk frames from the same chunker/parameters. The old
    * side reduces to DISTINCT digests before the join — set semantics,
    * and the hot-digest guard: a boilerplate chunk repeated across the
    * old corpus contributes ONE join row, so no digest key explodes.
    * Only narrow (id, digest, len) rows shuffle; text never does.
    *
    * `minReuseLen` (production: the chunker's own minLen) excludes
    * sub-minimum chunks from matching on BOTH sides. The walk emits
    * such chunks only as forced TAILS, and a tail shorter than the
    * hash window is not a content-defined unit at all — measured live:
    * a 2-char tail ("59") matched 2-char tails across hundreds of
    * unrelated documents, exactly the junk-hit class that would make
    * every document in a billion-doc store read "partially reused".
    * Sub-min chunks still count in n_chunks/total_len (tiling truth)
    * but neither enter the old digest set nor the reuse DENOMINATOR:
    * an unedited re-crawl still reads exactly 1.0, a document whose
    * only chunk is sub-min reads null (no reusable chunks — both
    * engines spell 0/0 as NULL). Default 0 = every chunk matchable.
    *
    * Output: (id, n_chunks, n_reused, total_len, reused_len,
    * reused_frac) — reused_frac 6dp over REUSABLE chunks, the
    * portable-rounding house convention. */
  def chunkReuse(oldChunks: DataFrame, newChunks: DataFrame,
      minReuseLen: Int = 0): DataFrame = {
    val oldDigests = oldChunks.filter(col("len") >= minReuseLen)
      .select(col("digest")).distinct()
      .withColumn("__hit", lit(1))
    newChunks.select(col("id"), col("digest"), col("len"))
      .join(oldDigests, Seq("digest"), "left")
      .withColumn("__use",
        (col("len") >= minReuseLen).cast("int"))
      .withColumn("__r",
        when(col("__hit").isNotNull && col("__use") === 1, 1).otherwise(0))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("__r")).cast("long").as("n_reused"),
        sum(col("len")).cast("long").as("total_len"),
        sum(when(col("__r") === 1, col("len")).otherwise(lit(0)))
          .cast("long").as("reused_len"),
        sum(col("__use")).cast("long").as("__reusable"))
      .withColumn("reused_frac",
        // explicit NULL for the no-reusable-chunks case: double 0/0 is
        // NaN in Spark but NULL in DuckDB — spell the agreement out
        when(col("__reusable") === 0, lit(null).cast("double"))
          .otherwise(round(
            col("n_reused").cast("double") / col("__reusable"), 6)))
      .drop("__reusable")
  }
}
