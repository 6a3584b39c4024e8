package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted-index store: retrieval against store state
  * must equal [[TextAnalysis.bm25TopK]] over the union of everything
  * ingested — the store is that operator's incremental twin — with the
  * corpus tokenized once at ingest and never re-read by a probe. */
class Bm25StoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String = {
    val d = System.getProperty("java.io.tmpdir") +
      s"/graft_bm25_store_spec_${tag}_p" + ProcessHandle.current().pid()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    d
  }

  private def text(n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => s"w${rnd.nextInt(997)}").mkString(" ")
  }

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val qs = Seq((1L, "w1 w2 w3"), (2L, "w10 w500 w996"),
    (3L, "zzz_nowhere")).toDF("qid", "qtext")

  private def hits(df: DataFrame): Set[(Long, Long, Int, Double, Long)] =
    df.select(col("qid"), col("id").cast("long"), col("rank"),
        col("score"), col("n_terms"))
      .as[(Long, Long, Int, Double, Long)].collect().toSet

  private def batchHits(union: DataFrame, k: Int = 5)
      : Set[(Long, Long, Int, Double, Long)] =
    hits(TextAnalysis.bm25TopK(union, "doc_id", "text", qs, "qid",
      "qtext", k = k).withColumnRenamed("doc_id", "id"))

  private def repRow(df: DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    df.select(col("ingest_shard"), col("n_docs"), col("sum_dl"),
        col("n_postings"), col("n_terms"), col("n_new_terms"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  test("store topK = batch bm25TopK over the union; zero-token docs count in the scalars; compaction invisible") {
    val root = tmpRoot("twin")
    val base = docs((1L to 8L).map(i => i -> text(40, i.toInt)) :+
      (9L -> "") :+ (10L -> "   "): _*) // zero-token docs: in N/avgdl
    val shardA = docs(20L -> text(40, 3), 21L -> text(40, 77))
    val shardB = docs(30L -> text(40, 88), 31L -> "")
    Bm25Store.build(base, "doc_id", "text", root,
      Bm25Store.Params(nBuckets = 4))
    Bm25Store.addShard(spark, root, shardA, "doc_id", "text", "a")
    Bm25Store.addShard(spark, root, shardB, "doc_id", "text", "b")
    val union = base.unionByName(shardA).unionByName(shardB)
    val expect = batchHits(union)
    assert(expect.nonEmpty && expect.exists(_._1 == 1L))
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
      == expect, "state-backed retrieval = full re-tokenization")
    val st = Bm25Store.currentStats(spark, root)
      .as[(Long, Long)].head()
    assert(st._1 == 14L, "N counts zero-token docs")
    Bm25Store.compactShards(spark, root)
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
      == expect, "compaction is invisible to retrieval")
  }

  test("crash replay: re-ingesting the same shard id is idempotent on state AND report") {
    val root = tmpRoot("replay")
    Bm25Store.build(docs(1L -> text(30, 1), 2L -> text(30, 2)),
      "doc_id", "text", root, Bm25Store.Params(nBuckets = 2))
    val shard = docs(5L -> text(30, 1), 6L -> text(30, 6))
    val r1 = repRow(Bm25Store.addShard(spark, root, shard,
      "doc_id", "text", "s"))
    val h1 = hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
    val s1 = Bm25Store.currentStats(spark, root).as[(Long, Long)].head()
    val r2 = repRow(Bm25Store.addShard(spark, root, shard,
      "doc_id", "text", "s"))
    assert(r1 == r2, "replayed report identical (probe excludes in-flight shard)")
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5)) == h1,
      "replayed retrieval state identical (dynamic partition overwrite)")
    assert(Bm25Store.currentStats(spark, root).as[(Long, Long)].head() == s1,
      "replayed scalars identical — df and N never double-count")
  }

  test("cold start + vocabulary-growth report semantics") {
    val root = tmpRoot("cold")
    Bm25Store.build(docs().limit(0).select(col("doc_id"), col("text")),
      "doc_id", "text", root, Bm25Store.Params(nBuckets = 2))
    val t0 = text(30, 42)
    val r0 = repRow(Bm25Store.addShard(spark, root,
      docs(1L -> t0, 2L -> t0), "doc_id", "text", "s0"))
    val vocab0 = t0.split("\\s+").distinct.length.toLong
    assert(r0 == Set(("s0", 2L, 60L, 2 * vocab0, vocab0, vocab0)),
      "cold start: every term is new; intra-shard dups don't shrink it")
    // next shard: one doc repeats s0's vocabulary, one brings fresh terms
    val fresh = (0 until 10).map(i => s"only$i").mkString(" ")
    val r1 = repRow(Bm25Store.addShard(spark, root,
      docs(3L -> t0, 4L -> fresh), "doc_id", "text", "s1"))
    val freshVocab = 10L
    assert(r1 == Set(("s1", 2L, 30L + freshVocab, vocab0 + freshVocab,
      vocab0 + freshVocab, freshVocab)),
      "new terms = shard vocab minus the accumulated prior state")
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5)) ==
      batchHits(docs(1L -> t0, 2L -> t0, 3L -> t0, 4L -> fresh)))
  }

  test("jumbo path (maxBroadcastKeys = 0) is report-identical to the broadcast path") {
    val rootA = tmpRoot("jumboA")
    val rootB = tmpRoot("jumboB")
    val base = docs((1L to 6L).map(i => i -> text(40, i.toInt)): _*)
    val shard = docs(10L -> text(40, 3), 11L -> text(40, 99))
    for (root <- Seq(rootA, rootB))
      Bm25Store.build(base, "doc_id", "text", root,
        Bm25Store.Params(nBuckets = 4))
    val viaBroadcast = repRow(Bm25Store.addShard(spark, rootA, shard,
      "doc_id", "text", "s"))
    val viaLegs = repRow(Bm25Store.addShard(spark, rootB, shard,
      "doc_id", "text", "s", maxBroadcastKeys = 0L))
    assert(viaBroadcast == viaLegs, "per-bucket legs = broadcast result")
    assert(hits(Bm25Store.topK(spark, rootA, qs, "qid", "qtext", k = 5)) ==
      hits(Bm25Store.topK(spark, rootB, qs, "qid", "qtext", k = 5)))
    assert(!new java.io.File(s"$rootB/__probe_ingest").exists(),
      "probe temp cleaned up")
    // jumbo PROBE batch: past the gate the query side rides shuffle
    // equi-joins instead of broadcasts — result-identical
    assert(hits(Bm25Store.topK(spark, rootA, qs, "qid", "qtext", k = 5,
        maxBroadcastKeys = 0L)) ==
      hits(Bm25Store.topK(spark, rootA, qs, "qid", "qtext", k = 5)),
      "gated topK = broadcast topK")
  }

  test("tiered compaction folds the shard tail; crash-leftover duplicates repaired; stats untouched") {
    val p = Bm25Store.Params(nBuckets = 2)
    val root = tmpRoot("compact")
    def corpus(idBase: Long, n: Int): DataFrame =
      (0 until n).map(i => (idBase + i, text(12, (idBase + i).toInt)))
        .toDF("doc_id", "text")
    Bm25Store.build(corpus(0, 500), "doc_id", "text", root, p)
    Bm25Store.addShard(spark, root, corpus(1000, 120), "doc_id", "text", "s1")
    Bm25Store.addShard(spark, root, corpus(2000, 120), "doc_id", "text", "s2")
    val before = hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
    val statsBefore = Bm25Store.currentStats(spark, root)
      .as[(Long, Long)].head()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pdir = new org.apache.hadoop.fs.Path(s"$root/postings")
    def sizeOf(s: String): Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(pdir, s"ingest_shard=$s")).getLength
    def shards(): Set[String] = fs.listStatus(pdir)
      .filter(_.getPath.getName.startsWith("ingest_shard="))
      .map(_.getPath.getName.stripPrefix("ingest_shard=")).toSet
    val tier = math.max(sizeOf("s1"), sizeOf("s2"))
    require(sizeOf("base") > tier, "fixture: base must sit above the tier")
    val snap = new org.apache.hadoop.fs.Path(root + "_snap")
    for (s <- Seq("s1", "s2"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(pdir, s"ingest_shard=$s"), fs,
        new org.apache.hadoop.fs.Path(snap, s"ingest_shard=$s"),
        false, spark.sparkContext.hadoopConfiguration)
    assert(Bm25Store.compactShards(spark, root, tier) == ((3, 2)),
      "s1 + s2 fold into one tier, base untouched")
    val tierName = (shards() - "base").head
    assert(tierName.startsWith("compacted_"))
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
      == before, "tiered fold is invisible to retrieval")
    // recreate the documented crash window: rename completed but source
    // deletion never ran — the leftover sources DUPLICATE the tier's
    // postings until the re-run's (id, term) dedup folds them away
    for (s <- Seq("s1", "s2"))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(snap, s"ingest_shard=$s"), fs,
        new org.apache.hadoop.fs.Path(pdir, s"ingest_shard=$s"),
        false, spark.sparkContext.hadoopConfiguration)
    val (b1, a1) = Bm25Store.compactShards(spark, root, Long.MaxValue)
    assert(b1 == 4 && a1 == 1, "repair pass absorbs tier + leftovers")
    assert(hits(Bm25Store.topK(spark, root, qs, "qid", "qtext", k = 5))
      == before, "duplicate leftover postings deduped — df not inflated")
    assert(Bm25Store.currentStats(spark, root).as[(Long, Long)].head()
      == statsBefore, "scalar rows are never compacted, so never wrong")
    // the terms sidecar survived both folds: a follow-up ingest's
    // vocabulary report still sees the full accumulated vocabulary —
    // doc 90000 repeats base doc 3's text (same generator seed), so
    // only the two planted uniq_* tokens read as new
    val rep = repRow(Bm25Store.addShard(spark, root,
      docs(90000L -> text(12, 3), 90001L -> "uniq_a uniq_b"),
      "doc_id", "text", "s3"))
    assert(rep.head._6 == 2L,
      "post-compaction vocabulary probe sees every absorbed shard's terms")
  }

  test("property: store topK = batch bm25TopK across a corpus/split/query grid") {
    // explicit-grid style (CorpusPropertiesSpec — no scalacheck bridge
    // offline): corpora straddling the degenerate shapes — tiny vocab
    // (every df large, heavy score ties exercising the (score, id)
    // tie-break), empty docs, empty SHARDS, single-doc corpora, a
    // base-only store with no ingest — probed with multi-term,
    // repeated-token, absent-term, and empty-string queries
    val grid = Seq(
      // (tag, vocabSize, docLens per shard)
      ("tiny_vocab", 3, Seq(Seq(12, 7, 0, 9), Seq(5, 5))),
      ("empty_shard", 11, Seq(Seq(8, 8, 8), Seq(), Seq(4, 0))),
      ("single_doc", 7, Seq(Seq(30))),
      ("base_only", 17, Seq(Seq(6, 9, 12, 3, 0, 21))))
    val gq = Seq((1L, "v1 v2 v0"), (2L, "v2 v2 v2"), (3L, "zzz_missing"),
      (4L, ""), (5L, "v0 zzz_missing v3")).toDF("qid", "qtext")
    def gHits(df: DataFrame): Set[(Long, Long, Int, Double, Long)] =
      df.select(col("qid"), col("id").cast("long"), col("rank"),
          col("score"), col("n_terms"))
        .as[(Long, Long, Int, Double, Long)].collect().toSet
    for ((tag, vocab, shards) <- grid) {
      val root = tmpRoot(s"prop_$tag")
      val rnd = new scala.util.Random(tag.hashCode)
      var nextId = 0L
      val frames = shards.map { lens =>
        docs(lens.map { len =>
          nextId += 1
          nextId -> (0 until len).map(_ => s"v${rnd.nextInt(vocab)}")
            .mkString(" ")
        }: _*)
      }
      Bm25Store.build(frames.head, "doc_id", "text", root,
        Bm25Store.Params(nBuckets = 3))
      frames.tail.zipWithIndex.foreach { case (f, i) =>
        Bm25Store.addShard(spark, root, f, "doc_id", "text", s"s$i")
      }
      val union = frames.reduce(_ unionByName _)
      val expect = gHits(TextAnalysis.bm25TopK(union, "doc_id", "text",
        gq, "qid", "qtext", k = 3).withColumnRenamed("doc_id", "id"))
      assert(gHits(Bm25Store.topK(spark, root, gq, "qid", "qtext", k = 3))
        == expect, s"$tag: store ≡ batch before compaction")
      Bm25Store.compactShards(spark, root)
      assert(gHits(Bm25Store.topK(spark, root, gq, "qid", "qtext", k = 3))
        == expect, s"$tag: store ≡ batch after global compaction")
    }
  }

  test("meta round-trips and probes refuse a missing store") {
    val p = Bm25Store.Params(nBuckets = 8)
    val root = tmpRoot("meta")
    Bm25Store.build(docs(1L -> text(20, 1)), "doc_id", "text", root, p)
    assert(Bm25Store.readMeta(spark, root) == p)
    intercept[Exception] {
      Bm25Store.addShard(spark, tmpRoot("absent"), docs(1L -> "x"),
        "doc_id", "text", "s")
    }
  }
}
