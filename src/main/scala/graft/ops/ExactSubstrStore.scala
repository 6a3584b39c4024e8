package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental exact-substring dedup against a PERSISTED window index —
  * the store/shard-ingest twin of [[Dedup.exactSubstrDedup]] (Lee et
  * al. '22 ExactSubstr, keep-one), completing the family symmetry:
  * exact, MinHash ([[IncrementalDedup]]), and semantic dedup all have
  * touched-sized shard ingest; batch-only ExactSubstr would re-pay the
  * full corpus-wide window aggregate (~one window per token — ~180M
  * windows at the 10M-doc smoke point) on EVERY shard arrival.
  *
  * Index layout under one root path:
  *   - `windows/` — RAW anchor-window occurrences (gk, id, pos), one
  *     row per length-minLen token window, partitioned by
  *     `ingest_shard`. Narrow rows (~20 B/window where the text is
  *     ~6 B/token): ingest scans THIS, never the corpus text.
  *     DELIBERATELY unaggregated — storing per-key (count, canonical)
  *     would require a corpus-wide min(struct(id, pos)) aggregate at
  *     build time, carrying a struct buffer for every mostly-unique
  *     gram key: EXACTLY the fused-aggregate shape that OOM'd the 10M
  *     batch run and forced [[Dedup.exactSubstrDedup]]'s two-aggregate
  *     spelling. Raw rows make the build a pure map+write with NO
  *     aggregate at all; count and canonical are computed at PROBE
  *     time, after the semi-join prune, where every group is
  *     shard-touched by construction — the struct-buffer aggregate
  *     only ever runs over touched-sized input.
  *   - `meta/` — one row pinning (min_len, digest_keys): probes MUST
  *     window and key exactly like the build did, so [[addShard]]
  *     reads its parameters from the index instead of trusting the
  *     caller to repeat them.
  *
  * STATE EQUALITY (the contract every spec pins): the union of
  * `windows/` partitions IS the batch operator's span frame over the
  * union corpus — identical rows by construction, not an equivalent
  * summary — so any batch readout replayed over the store
  * ([[dedupWithIndex]]) equals [[Dedup.exactSubstrDedup]] over the
  * full union, and [[addShard]]'s as-of report equals the batch run
  * over the union-so-far restricted to the shard's ids.
  *
  * SCALE CONTRACT: per-shard ingest cost is bounded by shard size +
  * touched-occurrence count (prior occurrences of the shard's keys),
  * NOT by the accumulated corpus: the one index-sized operation is a
  * NARROW columnar scan of `windows/` under a broadcast semi-join on
  * the shard's distinct keys (shard-token-bounded, a few MB of longs
  * in digest mode) — index rows never ride an exchange, and the
  * corpus text is never re-read or re-tokenized.
  *
  * APPEND-ONLY CAVEAT (inherent to incremental publishing, the
  * [[IncrementalDedup]] precedent): a shard can duplicate a span that
  * was unique when an earlier shard published, or (smaller id) STEAL
  * the canonical from an already-published occurrence. The index
  * state stays exactly batch-equal; the earlier shard's published
  * text is not retracted by the ingest itself —
  * [[retractionsForShard]] emits the evidence feed that reconciles
  * downstream consumers.
  *
  * SINGLE-WRITER CONTRACT: one ingest at a time (same as
  * [[IncrementalDedup]]) — concurrent writers would interleave
  * dynamic partition overwrites. Requires ids globally unique across
  * shards and totally ordered (canonical selection is min (id, pos)).
  *
  * Reference behavior: Lee et al. '22 ("Deduplicating Training Data
  * Makes Language Models Better"), ExactSubstr; windowing per
  * [[Dedup.exactSubstrDedup]]'s anchor-window observation. */
object ExactSubstrStore {

  /** Index parameters, persisted in `meta/` and read back by probes. */
  final case class Params(minLen: Int = 50, digestKeys: Boolean = false)

  private def windowsPath(root: String) = s"$root/windows"
  private def metaPath(root: String) = s"$root/meta"

  private def windowsSchema(p: Params) = StructType(Seq(
    StructField("__gk", if (p.digestKeys) LongType else StringType),
    StructField("id", LongType), StructField("pos", IntegerType),
    StructField("ingest_shard", StringType)))

  private def writeMeta(spark: SparkSession, root: String, p: Params): Unit =
    spark.range(1).select(
      lit(p.minLen).as("min_len"), lit(p.digestKeys).as("digest_keys"))
      .write.mode("overwrite").parquet(metaPath(root))

  /** The parameters this index was built with (probes must match them). */
  def readMeta(spark: SparkSession, root: String): Params = {
    val r = spark.read.parquet(metaPath(root)).head()
    Params(r.getAs[Int]("min_len"), r.getAs[Boolean]("digest_keys"))
  }

  private def writeShardPartition(df: DataFrame, path: String,
      shardId: String): Unit =
    df.withColumn("ingest_shard", lit(shardId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_shard")
      .parquet(path)

  /** (id, pos, __gk) anchor windows of `docs` — the batch operator's
    * span frame, bit-identical keying (same tokenizer, same gram
    * join, same xxhash64 digest). */
  private def windowFrame(docs: DataFrame, idCol: String, textCol: String,
      p: Params): DataFrame =
    docs.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"), posexplode(
        graft.functions.WordGramFunctions.word_grams(col("toks"), p.minLen))
        .as(Seq("pos", "gram")))
      // digest map-side, BEFORE any shuffle consumer — gram strings
      // never leave codegen (the batch operator's convention)
      .select(
        (if (p.digestKeys) xxhash64(col("gram")) else col("gram"))
          .as("__gk"),
        col("id"), col("pos"))

  /** All stored window occurrences, optionally excluding one in-flight
    * shard (crash replay: a half-written previous attempt of the same
    * shard is invisible via partition pruning). Explicit schema: an
    * index built from an empty corpus has partition dirs with no data
    * files, where inference would fail. */
  private def readWindows(spark: SparkSession, root: String, p: Params,
      excludeShard: Option[String]): DataFrame = {
    val all = spark.read.schema(windowsSchema(p)).parquet(windowsPath(root))
    excludeShard.fold(all)(s => all.filter(col("ingest_shard") =!= lit(s)))
      .select(col("__gk"), col("id"), col("pos"))
  }

  /** Build the index from an initial corpus: window + write — a pure
    * map-side pass, no aggregate (see the layout scaladoc for why that
    * is load-bearing at scale). No report is computed here; the
    * initial corpus's own dedup verdicts come from
    * [[Dedup.exactSubstrDedup]] (batch) or [[dedupWithIndex]]. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      root: String, p: Params = Params(),
      shardId: String = "base"): Unit = {
    require(p.minLen >= 2, "need minLen >= 2")
    val spark = docs.sparkSession
    writeShardPartition(windowFrame(docs, idCol, textCol, p),
      windowsPath(root), shardId)
    writeMeta(spark, root, p)
  }

  /** Ingest one shard WITHOUT re-scanning the corpus: the shard's
    * windows join the narrow index under a broadcast semi-join on the
    * shard's distinct keys; count + canonical aggregate over
    * shard ∪ touched occurrences only (touched-sized groups, so the
    * min(struct) buffer is safe — see the layout scaladoc); coverage /
    * canonical protection / splice replay the batch operator's exact
    * stages over the shard's docs. Appends the shard's raw windows as
    * its partition (dynamic overwrite — failed-shard replay recomputes
    * an identical delta from identical pre-shard state).
    *
    * Returns the shard's as-of report (id, n_tokens, n_removed,
    * clean_text) — pinned equal to `Dedup.exactSubstrDedup(union so
    * far).filter(id in shard)`. */
  /** Broadcast gate for the key semi-join: a shard's distinct window
    * keys are ~its token count, and broadcasting is only sane while
    * that fits comfortably on the driver/executors (8 B longs in
    * digest mode → the default ~32 MB). A jumbo shard falls back to a
    * shuffle semi-join — the INDEX side then rides one gk exchange,
    * which is exactly the price batch would pay anyway at that shard
    * size, so the fallback degrades gracefully instead of OOMing the
    * driver with a hinted broadcast Spark cannot refuse. */
  val MaxBroadcastKeys: Long = 4000000L

  def addShard(spark: SparkSession, root: String, shard: DataFrame,
      idCol: String, textCol: String, shardId: String,
      maxBroadcastKeys: Long = MaxBroadcastKeys): DataFrame = {
    val p = readMeta(spark, root)
    val tok = shard.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val w = windowFrame(shard, idCol, textCol, p)
    val shardKeys = w.select(col("__gk")).distinct()
    // the ONE index-sized operation: narrow scan, no exchange of index
    // rows while the broadcast gate holds (see MaxBroadcastKeys)
    val touched = readWindows(spark, root, p, excludeShard = Some(shardId))
      .join(gateBroadcast(shardKeys, maxBroadcastKeys), Seq("__gk"),
        "left_semi")
    val unioned = w.unionByName(touched)
    // union-state per key: groups = shard keys only, so the fused
    // count+argmin is touched-sized by construction
    val dupState = unioned.groupBy(col("__gk"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id"), col("pos"))).as("__canon"))
      .filter(col("__c") >= 2)
    val shardHits = w.join(dupState.select(col("__gk")), Seq("__gk"),
      "left_semi")
    val report = spliceReport(tok,
      coverage(shardHits, dupState,
        broadcast(tok.select(col("id")).distinct()), p.minLen))
    // materialize the report BEFORE the index write: its lazy plan
    // scans windows/, and writing this shard's partition first would
    // re-trigger that lineage against a directory whose layout just
    // changed (the IncrementalDedup lineage-cut lesson)
    val out = report.localCheckpoint(true)
    graft.bench.StageTimers.time("exsubstore.shard_write") {
      writeShardPartition(w, windowsPath(root), shardId)
    }
    out
  }

  /** Batch-equal dedup readout from the store: verdicts for `docs`
    * (which must be the ingested union — or any subset of it, for
    * subset reports) computed from stored windows instead of a
    * re-windowing of the corpus. Count pass is count-ONLY (spillable
    * 8-byte buffers over the mostly-unique key space); the argmin runs
    * after the duplicate filter — the batch operator's two-aggregate
    * discipline, replayed over the store. */
  def dedupWithIndex(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val p = readMeta(spark, root)
    val wAll = readWindows(spark, root, p, excludeShard = None)
    val dupKeys = wAll.groupBy(col("__gk"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col("__gk"))
    val hits = wAll.join(dupKeys, Seq("__gk"), "left_semi")
    val dupState = hits.groupBy(col("__gk"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id"), col("pos"))).as("__canon"))
    val tok = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val ids = tok.select(col("id")).distinct()
    // only the requested docs' windows generate coverage rows; no
    // broadcast hint — for a full-union readout `ids` is corpus-sized
    val wDocs = hits.join(ids, Seq("id"), "left_semi")
    spliceReport(tok, coverage(wDocs, dupState, ids, p.minLen))
  }

  /** The evidence feed for already-published occurrences whose verdict
    * the named shard's arrival changed: every key the shard touched
    * whose canonical MOVED — either the key was unique before (its
    * single prior occurrence was implicitly kept, and the shard's
    * smaller-(id, pos) copy now claims canonical) or the shard stole
    * an existing canonical. Emits the displaced occurrence (id, pos,
    * prior canonical position of the key). Key-level evidence, the
    * [[IncrementalDedup.republishDelta]] contract: consumers re-run
    * [[dedupWithIndex]] over the named ids for exact rebuilt text
    * (a displaced position can still be protected by an overlapping
    * window that stayed canonical). Empty when every shard occurrence
    * lost to existing canonicals — the common append-mostly case. */
  def retractionsForShard(spark: SparkSession, root: String,
      shardId: String,
      maxBroadcastKeys: Long = MaxBroadcastKeys): DataFrame = {
    val p = readMeta(spark, root)
    val all = spark.read.schema(windowsSchema(p)).parquet(windowsPath(root))
    val wS = all.filter(col("ingest_shard") === lit(shardId))
      .select(col("__gk"), col("id"), col("pos"))
    val prior = all.filter(col("ingest_shard") =!= lit(shardId))
      .select(col("__gk"), col("id"), col("pos"))
    val shardKeys = wS.select(col("__gk")).distinct()
    val touched = prior.join(gateBroadcast(shardKeys, maxBroadcastKeys),
      Seq("__gk"), "left_semi")
    val oldCanon = touched.groupBy(col("__gk"))
      .agg(min(struct(col("id"), col("pos"))).as("__old"))
    val newCanon = touched.unionByName(wS).groupBy(col("__gk"))
      .agg(min(struct(col("id"), col("pos"))).as("__new"))
    oldCanon.join(newCanon, Seq("__gk"))
      .filter(col("__old") =!= col("__new"))
      .select(col("__old.id").as("id"), col("__old.pos").as("pos"))
      .distinct()
  }

  /** Consolidate the accumulated per-shard partitions of `windows/`
    * into one — the file-count hygiene a continuously-ingesting store
    * needs (daily shards for a year = 365 partition dirs whose listing
    * and footer reads tax every probe). The [[IncrementalDedup
    * .compactShards]] protocol: write the consolidated rows to a
    * SIBLING staging dir, rename it in as a fresh deterministic
    * partition, then delete the sources — every crash point is
    * duplicate-or-nothing. One store-specific sharpening: unlike
    * MinHash buckets/labels (where duplicate rows are harmless),
    * duplicated window rows INFLATE counts — a unique span would read
    * as duplicated — so (a) the consolidation dedups on the full
    * (gk, id, pos) row, making a re-run after any crash absorb and
    * repair leftovers, and (b) the crash window between rename and
    * source deletion is a documented read hazard: complete (or re-run)
    * a crashed compaction before trusting the next probe. Single
    * writer, same as ingest.
    *
    * Compaction ENDS THE REPLAY WINDOW for the absorbed shards: their
    * rows now live under the compacted partition, so a later
    * [[addShard]] under an absorbed shard id would no longer exclude
    * them (the in-flight filter prunes by partition name) and its
    * windows would count twice. Only compact shards whose ingest has
    * COMPLETED — the same upstream serialization the single-writer
    * contract already requires. (A post-compaction
    * [[retractionsForShard]] for an absorbed id likewise reads an
    * empty shard partition and returns an empty feed.)
    * Returns (partitions before, after). */
  def compactShards(spark: SparkSession, root: String): (Int, Int) = {
    val p = readMeta(spark, root)
    val path = windowsPath(root)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(dir)) return (0, 0)
    val shardDirs = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ingest_shard="))
      .map(_.getPath.getName.stripPrefix("ingest_shard="))
    if (shardDirs.size <= 1) return (shardDirs.size, shardDirs.size)
    val newId = "compacted_" + java.lang.Long.toHexString(
      shardDirs.sorted.map(s => s.hashCode.toLong).sum & Long.MaxValue)
    val stage = new org.apache.hadoop.fs.Path(path + "__compact_stage")
    fs.delete(stage, true) // leftover from a crashed attempt
    spark.read.schema(windowsSchema(p)).parquet(path)
      .drop("ingest_shard")
      .dropDuplicates("__gk", "id", "pos")
      .write.mode("overwrite").parquet(stage.toString)
    require(fs.rename(stage,
      new org.apache.hadoop.fs.Path(dir, s"ingest_shard=$newId")),
      s"compact promote failed: $stage")
    shardDirs.foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"ingest_shard=$s"), true)
    }
    (shardDirs.size, 1)
  }

  /** The batch operator's coverage stage over an externally supplied
    * window/dup-state pair: (id, p, protected) for every position of
    * an `ids` doc covered by a duplicated window, protection = covered
    * by a canonical window OF an `ids` doc (a canonical living in a
    * prior-corpus doc protects nothing here — its copy is not among
    * the docs being rebuilt). Mirrors [[Dedup.exactSubstrDedup]]'s
    * coverage stage bit for bit. `ids` arrives pre-wrapped by the
    * caller: [[addShard]] passes `broadcast(ids)` (shard-bounded);
    * [[dedupWithIndex]] passes it plain (a full-union readout's id set
    * is not broadcastable — AQE picks the join strategy). `hits` must
    * already be filtered to duplicated-key windows — hoisted to the
    * callers because [[dedupWithIndex]] arrives pre-filtered and a
    * second gk semi-join here would be two wasted exchanges. */
  private def coverage(hits: DataFrame, dupState: DataFrame,
      ids: DataFrame, minLen: Int): DataFrame = {
    val covDup = hits.select(col("id"),
        explode(sequence(col("pos"), col("pos") + (minLen - 1))).as("p"))
      .distinct()
    val covCanon = dupState
      .select(col("__canon.id").as("id"), col("__canon.pos").as("pos"))
      .join(ids, Seq("id"), "left_semi")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (minLen - 1))).as("p"))
      .distinct()
      .withColumn("__prot", lit(true))
    covDup.join(covCanon, Seq("id", "p"), "left")
      .select(col("id"), col("p"),
        coalesce(col("__prot"), lit(false)).as("protected"))
  }

  /** Apply the [[MaxBroadcastKeys]] gate: hint broadcast while the key
    * frame is provably small, else return it unhinted (the semi-join
    * then plans as a shuffle join — index rows pay one gk exchange,
    * the batch-equivalent price at jumbo shard sizes). The count is
    * one job over the shard-sized key frame — noise next to the probe
    * it sizes. */
  private def gateBroadcast(keys: DataFrame, maxKeys: Long): DataFrame =
    if (keys.count() <= maxKeys) broadcast(keys) else keys

  /** Rebuild leg shared by [[addShard]] / [[dedupWithIndex]]: the
    * batch operator's splice over (id, toks) x (id, p, protected). */
  private def spliceReport(tok: DataFrame, cov: DataFrame): DataFrame = {
    val rm = cov.filter(!col("protected"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("p"))).as("__rm"))
    tok.join(rm, Seq("id"), "left")
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(size(col("__rm")), lit(0)).cast("long").as("n_removed"),
        graft.functions.SpliceFunctions
          .token_splice(col("toks"), col("__rm")).as("clean_text"))
  }
}
