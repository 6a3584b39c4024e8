package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, ExactSubstrStore}

/** Incremental ExactSubstr against the persisted window index: every
  * readout must equal the BATCH operator over the union corpus — the
  * store's windows/ partitions are by construction the batch span
  * frame, so equality is checked end to end on the rebuilt text.
  *
  * Fixture geometry: doc i's tokens are `d{i}w0..w{L-1}` — disjoint
  * across docs, so the only repeated spans are the prefix clones a
  * test plants, and minLen = 5 makes span extents exact. */
class ExactSubstrStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String = {
    val d = System.getProperty("java.io.tmpdir") +
      s"/graft_exsub_store_spec_${tag}_p" + ProcessHandle.current().pid()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    d
  }

  /** `n` docs of 12 disjoint tokens each, ids starting at `idBase`. */
  private def docs(idBase: Long, n: Int): DataFrame =
    (0 until n).map { i =>
      (idBase + i, (0 until 12).map(t => s"d${idBase + i}w$t").mkString(" "))
    }.toDF("doc_id", "text")

  /** A clone of doc `src`'s first `keep` tokens under a new id. */
  private def clone(of: DataFrame, src: Long, newId: Long,
      keep: Int): DataFrame = {
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    of.filter(col("doc_id") === src)
      .select(lit(newId).as("doc_id"),
        concat_ws(" ", slice(toks, 1, keep)).as("text"))
  }

  private def collectReport(df: DataFrame): Seq[(Long, Long, Long, String)] =
    df.select(col("id"), col("n_tokens"), col("n_removed"), col("clean_text"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

  private def batch(union: DataFrame, minLen: Int,
      digest: Boolean): Seq[(Long, Long, Long, String)] =
    collectReport(Dedup.exactSubstrDedup(union, "doc_id", "text",
      minLen = minLen, digestKeys = digest))

  private val params = ExactSubstrStore.Params(minLen = 5)

  test("shard ingest: as-of reports and final readout equal batch over the union (both key modes)") {
    for (digest <- Seq(false, true)) {
      val root = tmpRoot(s"eq_$digest")
      val p = params.copy(digestKeys = digest)
      val base = docs(0, 6)
      // shard1: one whole-doc clone of doc 2 (union-duplicated 12-token
      // span; canonical = (2, 0) survives whole, clone loses all)
      val shard1 = docs(100, 3).unionByName(clone(base, 2L, 150L, 12))
      // shard2: a 7-token prefix clone of shard1's doc 100 AND a clone
      // of base doc 3 — cross-shard duplication in both directions
      val shard2 = clone(shard1, 100L, 200L, 7)
        .unionByName(clone(base, 3L, 201L, 9))
      ExactSubstrStore.buildIndex(base, "doc_id", "text", root, p)
      val rep1 = collectReport(ExactSubstrStore.addShard(spark, root,
        shard1, "doc_id", "text", "s1"))
      val union1 = base.unionByName(shard1)
      assert(rep1 == batch(union1, p.minLen, digest)
        .filter(r => r._1 >= 100L))
      val rep2 = collectReport(ExactSubstrStore.addShard(spark, root,
        shard2, "doc_id", "text", "s2"))
      val union2 = union1.unionByName(shard2)
      assert(rep2 == batch(union2, p.minLen, digest)
        .filter(r => r._1 >= 200L))
      // final store readout over the full union == one batch run
      val fin = collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
        union2, "doc_id", "text"))
      assert(fin == batch(union2, p.minLen, digest))
      // sanity on the fixture: the shard-1 clone really lost its copy
      assert(rep1.find(_._1 == 150L).get._3 == 12L)
      // and string vs digest keys are result-identical by construction
      // (same assertions against the same batch targets)
    }
  }

  test("failed-shard replay is idempotent: re-adding a shard leaves state and report unchanged") {
    val root = tmpRoot("replay")
    val base = docs(0, 4)
    val shard = docs(50, 2).unionByName(clone(base, 1L, 60L, 8))
    ExactSubstrStore.buildIndex(base, "doc_id", "text", root, params)
    val rep1 = collectReport(ExactSubstrStore.addShard(spark, root,
      shard, "doc_id", "text", "s1"))
    // simulate the crash-replay: the same shard ingests again under the
    // same shard id (dynamic overwrite replaces exactly its partition)
    val rep2 = collectReport(ExactSubstrStore.addShard(spark, root,
      shard, "doc_id", "text", "s1"))
    assert(rep1 == rep2)
    val union = base.unionByName(shard)
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text")) == batch(union, params.minLen, digest = false))
  }

  test("canonical never lost: k cross-shard copies keep exactly the smallest id whole") {
    val root = tmpRoot("canon")
    val base = docs(0, 3)
    ExactSubstrStore.buildIndex(base, "doc_id", "text", root, params)
    // three more verbatim copies of doc 1 across two shards
    ExactSubstrStore.addShard(spark, root,
      clone(base, 1L, 30L, 12).unionByName(clone(base, 1L, 31L, 12)),
      "doc_id", "text", "s1")
    ExactSubstrStore.addShard(spark, root, clone(base, 1L, 32L, 12),
      "doc_id", "text", "s2")
    val union = base.unionByName(clone(base, 1L, 30L, 12))
      .unionByName(clone(base, 1L, 31L, 12))
      .unionByName(clone(base, 1L, 32L, 12))
    val fin = collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text"))
    val copies = fin.filter(r => Seq(1L, 30L, 31L, 32L).contains(r._1))
    assert(copies.count(_._3 == 0L) == 1 && copies.head._1 == 1L &&
      copies.head._3 == 0L, s"copies=$copies")
    assert(copies.filter(_._1 != 1L).forall(_._3 == 12L))
  }

  test("retractionsForShard: a smaller-id shard copy displaces the published canonical; a larger-id copy retracts nothing") {
    val root = tmpRoot("retract")
    val base = docs(10, 3) // ids 10..12
    ExactSubstrStore.buildIndex(base, "doc_id", "text", root, params)
    // larger-id clone: existing occurrence stays canonical -> no feed
    ExactSubstrStore.addShard(spark, root, clone(base, 11L, 40L, 12),
      "doc_id", "text", "s1")
    assert(ExactSubstrStore.retractionsForShard(spark, root, "s1").count() == 0)
    // smaller-id clone of doc 12: the shard copy (id 5) steals canonical
    // for every one of doc 12's windows — the feed names doc 12's
    // displaced window positions (12 tokens, minLen 5 -> pos 0..7)
    ExactSubstrStore.addShard(spark, root, clone(base, 12L, 5L, 12),
      "doc_id", "text", "s2")
    val feed = ExactSubstrStore.retractionsForShard(spark, root, "s2")
      .as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(feed == (0 until 8).map(p => (12L, p)))
    // and the union readout agrees with batch: doc 5 (smallest id) is
    // now the surviving copy, doc 12 loses its span
    val union = base.unionByName(clone(base, 11L, 40L, 12))
      .unionByName(clone(base, 12L, 5L, 12))
    val fin = collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text"))
    assert(fin == batch(union, params.minLen, digest = false))
    assert(fin.find(_._1 == 5L).get._3 == 0L &&
      fin.find(_._1 == 12L).get._3 == 12L)
  }

  test("compactShards: one partition, identical readout; crash leftovers absorbed and repaired") {
    val root = tmpRoot("compact")
    val base = docs(0, 4)
    ExactSubstrStore.buildIndex(base, "doc_id", "text", root, params)
    ExactSubstrStore.addShard(spark, root, clone(base, 1L, 20L, 12),
      "doc_id", "text", "s1")
    ExactSubstrStore.addShard(spark, root, clone(base, 2L, 21L, 9),
      "doc_id", "text", "s2")
    val union = base.unionByName(clone(base, 1L, 20L, 12))
      .unionByName(clone(base, 2L, 21L, 9))
    val before = collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text"))
    assert(ExactSubstrStore.compactShards(spark, root) == ((3, 1)))
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text")) == before)
    // idempotent: a single partition is left alone
    assert(ExactSubstrStore.compactShards(spark, root) == ((1, 1)))
    // simulate the documented crash window (rename done, sources not yet
    // deleted): a leftover partition duplicating every row — a re-run
    // must absorb it and DEDUP, not double the counts
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wdir = new org.apache.hadoop.fs.Path(s"$root/windows")
    val parts = fs.listStatus(wdir)
      .filter(_.getPath.getName.startsWith("ingest_shard=")).map(_.getPath)
    org.apache.hadoop.fs.FileUtil.copy(fs, parts.head, fs,
      new org.apache.hadoop.fs.Path(wdir, "ingest_shard=leftover"),
      false, spark.sparkContext.hadoopConfiguration)
    assert(ExactSubstrStore.compactShards(spark, root) == ((2, 1)))
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text")) == before)
  }

  test("jumbo-shard bucketed probe (maxBroadcastKeys = 0, every leg unhinted) is result-identical") {
    // forces the sequential per-bucket legs with every leg OVER its own
    // gate — the doubly-degraded path (bucketed + per-bucket shuffle)
    val rootA = tmpRoot("gate_a")
    val rootB = tmpRoot("gate_b")
    val base = docs(0, 5)
    val shard = docs(60, 2).unionByName(clone(base, 3L, 70L, 10))
    for (root <- Seq(rootA, rootB))
      ExactSubstrStore.buildIndex(base, "doc_id", "text", root, params)
    val repBcast = collectReport(ExactSubstrStore.addShard(spark, rootA,
      shard, "doc_id", "text", "s1"))
    val repShuffle = collectReport(ExactSubstrStore.addShard(spark, rootB,
      shard, "doc_id", "text", "s1", maxBroadcastKeys = 0L))
    assert(repBcast == repShuffle)
    assert(repShuffle.find(_._1 == 70L).get._3 == 10L)
    assert(ExactSubstrStore.retractionsForShard(spark, rootB, "s1",
      maxBroadcastKeys = 0L).count() ==
      ExactSubstrStore.retractionsForShard(spark, rootA, "s1").count())
  }

  test("jumbo-shard bucketed probe with per-bucket broadcasts is result-identical; probe temp cleaned up") {
    // total keys above the gate, every bucket's keys below it — the
    // production jumbo-shard shape: sequential bucket legs, each a
    // broadcast semi-join pruned to its __bkt subdirectory
    val rootA = tmpRoot("legs_a")
    val rootB = tmpRoot("legs_b")
    val p4 = params.copy(nBuckets = 4)
    val base = docs(0, 6)
    val shard = docs(300, 8).unionByName(clone(base, 2L, 350L, 10))
    for (root <- Seq(rootA, rootB))
      ExactSubstrStore.buildIndex(base, "doc_id", "text", root, p4)
    val repBcast = collectReport(ExactSubstrStore.addShard(spark, rootA,
      shard, "doc_id", "text", "s1"))
    // shard carries ~70 distinct keys over 4 buckets (~18/bucket): 20
    // gates the TOTAL out but lets (most) per-bucket legs broadcast
    val repLegs = collectReport(ExactSubstrStore.addShard(spark, rootB,
      shard, "doc_id", "text", "s1", maxBroadcastKeys = 20L))
    assert(repBcast == repLegs)
    val union = base.unionByName(shard)
    assert(repLegs == batch(union, p4.minLen, digest = false)
      .filter(_._1 >= 300L))
    // the ingest probe's temp dir is deleted once the report is on disk
    assert(!new java.io.File(s"$rootB/__probe_ingest").exists())
    // the full-union readout over the bucketed-leg-built store agrees
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, rootB,
      union, "doc_id", "text")) == batch(union, p4.minLen, digest = false))
    // retraction feed through the bucketed legs agrees with broadcast
    assert(ExactSubstrStore.retractionsForShard(spark, rootB, "s1",
      maxBroadcastKeys = 20L).count() ==
      ExactSubstrStore.retractionsForShard(spark, rootA, "s1").count())
  }

  test("tiered compaction absorbs only small shards; the rename-done crash is detected by the deterministic name and finished") {
    val root = tmpRoot("tier")
    // sized so parquet DATA dominates footers (the size comparisons
    // below are meaningless at footer scale), few buckets for the same
    // reason: base ~2.5x each small shard, merged tier ~2x each
    val p4 = params.copy(nBuckets = 4)
    val base = docs(0, 500) // the big partition a tier must NOT rewrite
    ExactSubstrStore.buildIndex(base, "doc_id", "text", root, p4)
    ExactSubstrStore.addShard(spark, root, docs(1000, 200),
      "doc_id", "text", "s1")
    ExactSubstrStore.addShard(spark, root,
      docs(2000, 200).unionByName(clone(base, 1L, 2500L, 12)),
      "doc_id", "text", "s2")
    val union = base.unionByName(docs(1000, 200)).unionByName(docs(2000, 200))
      .unionByName(clone(base, 1L, 2500L, 12))
    val before = collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wdir = new org.apache.hadoop.fs.Path(s"$root/windows")
    def sizeOf(s: String): Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(wdir, s"ingest_shard=$s")).getLength
    def shards(): Set[String] = fs.listStatus(wdir)
      .filter(_.getPath.getName.startsWith("ingest_shard="))
      .map(_.getPath.getName.stripPrefix("ingest_shard=")).toSet
    val tier = math.max(sizeOf("s1"), sizeOf("s2"))
    require(sizeOf("base") > tier, "fixture: base must sit above the tier")
    // snapshot the small shards so the crash window can be recreated
    val snap = new org.apache.hadoop.fs.Path(root + "_snap")
    for (s <- Seq("s1", "s2"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(wdir, s"ingest_shard=$s"), fs,
        new org.apache.hadoop.fs.Path(snap, s"ingest_shard=$s"),
        false, spark.sparkContext.hadoopConfiguration)
    // tiered compact: s1 + s2 merge, base untouched
    assert(ExactSubstrStore.compactShards(spark, root, tier) == ((3, 2)))
    val tierName = (shards() - "base").head
    assert(tierName.startsWith("compacted_"))
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text")) == before)
    // recreate the documented crash window: rename completed (the tier
    // partition exists) but source deletion never ran
    for (s <- Seq("s1", "s2"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(snap, s"ingest_shard=$s"), fs,
        new org.apache.hadoop.fs.Path(wdir, s"ingest_shard=$s"),
        false, spark.sparkContext.hadoopConfiguration)
    require(sizeOf(tierName) > tier,
      "fixture: the merged tier must sit above the threshold so the " +
        "re-run selects exactly the crashed run's source set")
    // the re-run's source set hashes to the EXISTING tier partition:
    // detection branch — finish the deletion, write nothing
    assert(ExactSubstrStore.compactShards(spark, root, tier) == ((4, 2)))
    assert(shards() == Set("base", tierName))
    assert(collectReport(ExactSubstrStore.dedupWithIndex(spark, root,
      union, "doc_id", "text")) == before)
  }

  test("empty base corpus: the valid streaming start — first shard behaves like batch on itself") {
    val root = tmpRoot("empty")
    ExactSubstrStore.buildIndex(docs(0, 0), "doc_id", "text", root, params)
    val shard = docs(70, 2).unionByName(clone(docs(70, 2), 70L, 90L, 6))
    val rep = collectReport(ExactSubstrStore.addShard(spark, root,
      shard, "doc_id", "text", "s1"))
    assert(rep == batch(shard, params.minLen, digest = false))
    assert(rep.find(_._1 == 90L).get._3 == 6L)
  }
}
