package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalDedup}

/** Incremental dedup against the persisted MinHash index: the state after
  * shard-by-shard ingest must equal one full-union dedup — including
  * transitive chains that SPAN shards and duplicates of docs that were
  * themselves already dropped (the case a survivors-only index gets
  * wrong).
  *
  * Fixture geometry: doc i's tokens are `d{i}w0..d{i}w24` — fully disjoint
  * across docs, so the ONLY similarity is what a test plants via prefix
  * copies, and exact shingle counts make every Jaccard predictable:
  * 25 tokens -> 23 3-shingles; a keepFrac prefix of m tokens shares its
  * m-2 shingles with the source. k=64/bands=32 (r=2) keeps LSH recall at
  * J>=0.45 above 0.999 per pair, so planted pairs are found
  * deterministically at these sizes. */
class IncrementalDedupSpec extends SparkSpec {

  private def tmpRoot(tag: String): String = {
    val d = System.getProperty("java.io.tmpdir") +
      s"/graft_incdedup_spec_${tag}_p" + ProcessHandle.current().pid()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    d
  }

  /** 40 docs, 25 tokens each, token streams disjoint across docs. */
  private def baseDocs: DataFrame = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, (0 until 25).map(t => s"d${i}w$t").mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Keep the first `keepFrac` of tokens — a prefix near-dup whose Jaccard
    * vs the source is exactly (floor(25*keepFrac) - 2) / 23. */
  private def prefixCopy(docs: DataFrame, ids: Seq[Long], offset: Long,
      keepFrac: Double): DataFrame = {
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    docs.filter(col("doc_id").isin(ids: _*))
      .withColumn("doc_id", col("doc_id") + offset)
      .withColumn("text",
        concat_ws(" ", slice(toks, lit(1), (size(toks) * keepFrac).cast("int"))))
  }

  private val p = IncrementalDedup.Params(shingleW = 3, k = 64, bands = 32,
    threshold = 0.45, maxBucket = 256)

  private def fullDroppedSet(union: DataFrame,
      pp: IncrementalDedup.Params = p): Set[Long] = {
    val pairs = Dedup.minhashLshPairs(union, "doc_id", "text",
      shingleW = pp.shingleW, k = pp.k, bands = pp.bands,
      threshold = pp.threshold, maxBucketSize = pp.maxBucket)
      .select(col("id_a"), col("id_b"))
    Dedup.resolveClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
  }

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("shard-by-shard ingest state equals full-union dedup, chains spanning shards") {
    val root = tmpRoot("chain")
    val docs = baseDocs
    // batch1: originals + 90% copies of 0..9 (22 tokens -> 20 shingles,
    // J = 20/23 = 0.87 vs source: dropped within batch1)
    val b1 = docs.unionByName(prefixCopy(docs, 0L until 10L, 1000, 0.9))
    // batch2: 50% copies at +2000 (12 tokens -> 10 shingles). Jaccard vs
    // the ORIGINAL is 10/23 = 0.43 < 0.45 (no direct edge); vs the DROPPED
    // +1000 copy it is 10/20 = 0.50 >= 0.45 — the original is reachable
    // ONLY through a doc that was already dropped, the exact case a
    // survivors-only index would miss. Plus fresh internal duplicates
    // (disjoint new token streams) at +3000, exact-copied at +3100.
    import spark.implicits._
    val b2uniqDf = (0 until 5).map { j =>
      (3000L + j, (0 until 12).map(t => s"s${j}x$t").mkString(" "))
    }.toDF("doc_id", "text")
    val b2 = prefixCopy(docs, 0L until 10L, 2000, 0.5)
      .unionByName(b2uniqDf)
      .unionByName(b2uniqDf.withColumn("doc_id", col("doc_id") + 100))
    val rep1 = IncrementalDedup.buildIndex(b1, "doc_id", "text", root, p, "b1")
    val r1 = rep1.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (0L until 10L).foreach { i =>
      assert(r1(i), s"original $i must survive batch1")
      assert(!r1(i + 1000), s"copy ${i + 1000} must be dropped in batch1")
    }
    val rep2 = IncrementalDedup.addShard(spark, root, b2, "doc_id", "text", "b2")
    val r2 = rep2.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0L until 10L).foreach { i =>
      val (cl, surv) = r2(i + 2000)
      assert(!surv, s"prefix-of-prefix ${i + 2000} must be dropped")
      assert(cl === i,
        s"${i + 2000} must resolve to ORIGINAL $i through the dropped copy")
    }
    (0 until 5).foreach { j =>
      assert(r2(3000L + j)._2, s"fresh doc ${3000 + j} must survive")
      assert(!r2(3100L + j)._2, s"internal dup ${3100 + j} must be dropped")
      assert(r2(3100L + j)._1 === 3000L + j)
    }
    // the headline claim: index state ≡ one full-union dedup
    val incrDropped = IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(incrDropped === fullDroppedSet(b1.unionByName(b2)))
  }

  test("re-running a shard (crash replay) is idempotent") {
    val root = tmpRoot("idem")
    val docs = baseDocs
    val b2 = prefixCopy(docs, 0L until 8L, 1000, 0.9)
    IncrementalDedup.buildIndex(docs, "doc_id", "text", root, p, "b1")
    val first = IncrementalDedup.addShard(spark, root, b2, "doc_id", "text", "b2")
    val firstRows = first.orderBy("id").collect().toSeq
    val again = IncrementalDedup.addShard(spark, root, b2, "doc_id", "text", "b2")
    assert(again.orderBy("id").collect().toSeq === firstRows)
    // no duplicate index rows from the replay
    val bucketRows = spark.read.parquet(s"$root/buckets")
    assert(bucketRows.count() ===
      bucketRows.dropDuplicates("id", "band", "bucket").count())
    assert(labelSet(IncrementalDedup.currentLabels(spark, root)) ===
      labelSet(Dedup.resolveClusters(
        Dedup.minhashLshPairs(docs.unionByName(b2), "doc_id", "text",
          shingleW = p.shingleW, k = p.k, bands = p.bands,
          threshold = p.threshold, maxBucketSize = p.maxBucket)
          .select(col("id_a"), col("id_b")))))
  }

  test("a later bridge doc merges existing clusters in the index state") {
    val root = tmpRoot("bridge")
    import spark.implicits._
    val aToks = (0 until 20).map(t => s"aw$t")
    val bToks = (0 until 20).map(t => s"bw$t")
    val b1 = Seq((0L, aToks.mkString(" ")), (1L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    // bridge = first 14 tokens of each: shares 12 shingles with each side
    // (J = 12/(18 + 26 - 12) = 0.375 >= 0.3), similar to NEITHER alone at
    // batch1's 0-pair state — ingesting it must merge both clusters
    val bt = (aToks.take(14) ++ bToks.take(14)).mkString(" ")
    val b2 = Seq((100L, bt)).toDF("doc_id", "text")
    val loose = p.copy(threshold = 0.3)
    IncrementalDedup.buildIndex(b1, "doc_id", "text", root, loose, "b1")
    IncrementalDedup.addShard(spark, root, b2, "doc_id", "text", "b2")
    val labels = labelSet(IncrementalDedup.currentLabels(spark, root))
    assert(labels === Set((0L, 0L), (1L, 0L), (100L, 0L)),
      s"bridge must merge both clusters under root 0, got $labels")
    assert(IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet ===
      fullDroppedSet(b1.unionByName(b2), loose))
  }

  test("republishDelta emits exactly the relabeled members after a merge") {
    val root = tmpRoot("repub")
    import spark.implicits._
    val aToks = (0 until 20).map(t => s"aw$t")
    val bToks = (0 until 20).map(t => s"bw$t")
    // two exact-copy groups (disjoint token spaces -> J=0 across groups)
    val b1 = ((0L to 2L).map(i => (i, aToks.mkString(" "))) ++
      (100L to 102L).map(i => (i, bToks.mkString(" ")))).toDF("doc_id", "text")
    val loose = p.copy(threshold = 0.3)
    IncrementalDedup.buildIndex(b1, "doc_id", "text", root, loose, "b1")
    // a shard that does NOT merge: new exact copy of group A
    IncrementalDedup.addShard(spark, root,
      Seq((200L, aToks.mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", "b2")
    assert(IncrementalDedup.republishDelta(spark, root, Seq("b1"))
      .isEmpty, "a plain append must not retract anything")
    // bridge shard merges group B into group A (root 0)
    val bridge = (aToks.take(14) ++ bToks.take(14)).mkString(" ")
    IncrementalDedup.addShard(spark, root,
      Seq((300L, bridge)).toDF("doc_id", "text"), "doc_id", "text", "b3")
    val delta = IncrementalDedup.republishDelta(spark, root, Seq("b1", "b2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exactly group B's already-published members move 100 -> 0; the
    // bridge doc itself is new (published by its own shard's report)
    assert(delta === Set((100L, 100L, 0L), (101L, 100L, 0L), (102L, 100L, 0L)))
    // the touched-sized per-shard feed (reads one delta partition + the
    // prior rows of just its ids) equals the full-log reconciliation when
    // taken immediately after the shard
    assert(IncrementalDedup.retractionsForShard(spark, root, "b3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === delta)
    assert(IncrementalDedup.retractionsForShard(spark, root, "b2")
      .isEmpty, "a non-merging shard must retract nothing")
  }

  test("retraction feeds cover docs published as unlabeled singleton survivors") {
    // a doc that entered no pair has NO label row — it was published as an
    // implicit singleton survivor. When a later shard pulls it into a
    // cluster, both feeds must still retract it (prior existence comes
    // from the shingle table, not the label log).
    val root = tmpRoot("singleton")
    import spark.implicits._
    val u = (0 until 20).map(t => s"uw$t").mkString(" ")
    IncrementalDedup.buildIndex(Seq((20L, u)).toDF("doc_id", "text"),
      "doc_id", "text", root, p.copy(threshold = 0.3), "b1")
    assert(IncrementalDedup.currentLabels(spark, root).isEmpty,
      "fixture requires the published doc to be label-less")
    IncrementalDedup.addShard(spark, root,
      Seq((5L, u)).toDF("doc_id", "text"), "doc_id", "text", "b2")
    val expected = Set((20L, 20L, 5L))
    assert(IncrementalDedup.retractionsForShard(spark, root, "b2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === expected)
    assert(IncrementalDedup.republishDelta(spark, root, Seq("b1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === expected)
  }

  test("pre-delta-log label layout is detected, refused, and migrated") {
    val root = tmpRoot("legacy")
    val docs = baseDocs
    val b1 = docs.unionByName(prefixCopy(docs, 0L until 5L, 1000, 0.9))
    IncrementalDedup.buildIndex(b1, "doc_id", "text", root, p, "b1")
    val before = labelSet(IncrementalDedup.currentLabels(spark, root))
    // rewrite labels/ in the legacy flat layout (what the r6 swap-write
    // code left on disk): plain files, no ingest_shard= partitions
    val flatTmp = root + "_flat"
    IncrementalDedup.currentLabels(spark, root)
      .write.mode("overwrite").parquet(flatTmp)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/labels"), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(flatTmp),
      new org.apache.hadoop.fs.Path(s"$root/labels")))
    // readers refuse loudly instead of silently dropping the history
    intercept[IllegalArgumentException] {
      IncrementalDedup.currentLabels(spark, root)
    }
    assert(IncrementalDedup.migrateLegacyLabels(spark, root))
    assert(!IncrementalDedup.migrateLegacyLabels(spark, root)) // idempotent
    assert(labelSet(IncrementalDedup.currentLabels(spark, root)) === before)
    // and ingest proceeds against the migrated index
    val rep = IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 0L until 3L, 5000, 0.9), "doc_id", "text", "b2")
    assert(rep.filter(!col("survived")).count() === 3)
  }

  test("label ingest is delta-sized: an append-only shard writes only touched rows") {
    val root = tmpRoot("deltasize")
    val docs = baseDocs // 40 docs
    // pre-existing duplicate population: 90% copies of ALL 40 docs
    val b1 = docs.unionByName(prefixCopy(docs, 0L until 40L, 1000, 0.9))
    IncrementalDedup.buildIndex(b1, "doc_id", "text", root, p, "b1")
    val historyRows = spark.read.parquet(s"$root/labels")
      .filter(col("ingest_shard") === "b1").count()
    assert(historyRows === 80L) // 40 pairs -> 80 labeled ids
    // shard touching ONE cluster: another copy of doc 0
    IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, Seq(0L), 5000, 0.9), "doc_id", "text", "b2")
    val deltaRows = spark.read.parquet(s"$root/labels")
      .filter(col("ingest_shard") === "b2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ONLY the new doc's row lands — the 80-row history is untouched
    // (doc 0's cluster keeps root 0, so no existing row changes)
    assert(deltaRows === Set((5000L, 0L)),
      s"delta must be touched-sized, got ${deltaRows.size} rows")
    assert(spark.read.parquet(s"$root/labels")
      .filter(col("ingest_shard") === "b1").count() === historyRows)
  }

  test("forced two-scan path writes the identical delta, state, and report as the fast path") {
    // addShard routes small histories to a driver fast path; the at-scale
    // two-scan broadcast path must be value-identical on the same input
    // (localHistoryBytes = 0 forces it). The shard mixes chains reaching
    // originals only THROUGH already-dropped docs with fresh duplicates of
    // untouched clusters, so the delta logic is exercised on changed AND
    // unchanged components in both paths.
    val docs = baseDocs
    val b1 = docs.unionByName(prefixCopy(docs, 0L until 10L, 1000, 0.9))
    val shard = prefixCopy(docs, 0L until 10L, 2000, 0.5) // via-dropped chain
      .unionByName(prefixCopy(docs, 15L until 20L, 3000, 0.9))
    def runPath(tag: String, gate: Long): (Set[(Long, Long, String)],
        Seq[(Long, Long, Boolean)], Set[Long]) = {
      val root = tmpRoot(tag)
      IncrementalDedup.buildIndex(b1, "doc_id", "text", root, p, "b1")
      val rep = IncrementalDedup.addShard(spark, root, shard,
        "doc_id", "text", "b2", localHistoryBytes = gate)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      val labels = spark.read.parquet(s"$root/labels")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getString(2))).toSet
      val dropped = IncrementalDedup.droppedIds(spark, root)
        .collect().map(_.getLong(0)).toSet
      (labels, rep, dropped)
    }
    val (lFast, rFast, dFast) = runPath("pathfast", Long.MaxValue)
    val (lScan, rScan, dScan) = runPath("pathscan", 0L)
    assert(lFast === lScan, "per-shard label deltas must be identical")
    assert(rFast === rScan)
    assert(dFast === dScan)
  }

  test("hot-bucket cap: a true pair NOT adjacent to the star-link anchors still surfaces via its other bands") {
    // Adversarial fixture for the documented recall bound on crossProbe's
    // hot-bucket degradation: a boilerplate crowd pushes shared band
    // buckets far over maxBucket, so probes into those buckets pair only
    // with the bucket's min/max-id anchors. The planted TRUE pair (50,
    // 10000) sits strictly INSIDE the anchor range of every hot bucket —
    // star links alone can never produce it — and must be recovered
    // through the pair's OTHER bands: the two docs are exact copies, so
    // their signatures agree in every band, and any band where their
    // minhashes differ from the crowd's lands them in a small private
    // bucket that pairs them normally.
    val root = tmpRoot("hotbucket")
    import spark.implicits._
    val template = (0 until 30).map(t => s"tpl$t").mkString(" ")
    // crowd ids bracket 50 on both sides: per-bucket min is always <= 9
    // and max always >= 9000, so 50 is never an anchor
    val crowd = ((0 until 10).map(i =>
        (i.toLong, s"$template crowd${i}a crowd${i}b")) ++
      (0 until 10).map(i =>
        (9000L + i, s"$template crowd${9000 + i}a crowd${9000 + i}b")))
      .toDF("doc_id", "text")
    // 40-token distinctive tail: J(50, crowd) = 28/70 = 0.4 < 0.45, so
    // the pair under test is the ONLY cross edge expected for doc 50
    val special = template + " " + (0 until 40).map(t => s"hbx$t").mkString(" ")
    val hot = p.copy(maxBucket = 8)
    IncrementalDedup.buildIndex(
      crowd.unionByName(Seq((50L, special)).toDF("doc_id", "text")),
      "doc_id", "text", root, hot, "b1")
    val rep = IncrementalDedup.addShard(spark, root,
      Seq((10000L, special)).toDF("doc_id", "text"),
      "doc_id", "text", "b2")
    // fixture validity: the crowd really does push buckets over the cap,
    // and 50 is never a star-link anchor of any over-cap bucket
    val overCap = spark.read.parquet(s"$root/buckets")
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"), min($"id").as("mn"), max($"id").as("mx"))
      .filter($"n" > hot.maxBucket)
      .select($"n", $"mn", $"mx").collect()
    assert(overCap.nonEmpty, "fixture must create over-cap buckets")
    overCap.foreach { r =>
      assert(r.getLong(1) < 50L && r.getLong(2) > 50L,
        s"50 must sit strictly inside every hot bucket's anchor range: $r")
    }
    // the recall claim: the pair surfaced anyway — doc 10000 resolves
    // into doc 50's cluster, which star links alone cannot produce
    val row = rep.filter($"id" === 10000L).head()
    assert(row.getLong(1) === 50L && !row.getBoolean(2),
      s"true pair must be recovered through non-hot bands: $row")
  }

  test("property: any shard split of any corpus reproduces full-union state") {
    // seeded pseudo-random grid (explicit-grid style; scalacheck bridge is
    // offline): random token-stream corpora with random prefix near-dups,
    // split round-robin into 2-3 shards — so a duplicate can arrive BEFORE
    // its source — must always produce the full-union dropped set
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val root = tmpRoot(s"prop$trial")
      val nBase = 20 + rnd.nextInt(20)
      val base = (0 until nBase).map { i =>
        (i.toLong,
          (0 until (10 + rnd.nextInt(20))).map(t => s"p${trial}d${i}w$t").mkString(" "))
      }
      val dups = (0 until 10).map { j =>
        val toks = base(rnd.nextInt(nBase))._2.split(" ")
        val keep = math.max(4, (toks.length * (0.5 + rnd.nextDouble() * 0.5)).toInt)
        (1000L + j, toks.take(keep).mkString(" "))
      }
      val all = rnd.shuffle(base ++ dups)
      val nShards = 2 + rnd.nextInt(2)
      val shards = all.zipWithIndex.groupBy(_._2 % nShards)
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      import spark.implicits._
      IncrementalDedup.buildIndex(shards.head.toDF("doc_id", "text"),
        "doc_id", "text", root, p, "s0")
      shards.tail.zipWithIndex.foreach { case (sh, i) =>
        IncrementalDedup.addShard(spark, root, sh.toDF("doc_id", "text"),
          "doc_id", "text", s"s${i + 1}")
      }
      val incr = IncrementalDedup.droppedIds(spark, root)
        .collect().map(_.getLong(0)).toSet
      val full = fullDroppedSet(all.toDF("doc_id", "text"))
      assert(incr === full, s"trial $trial (${nShards} shards, $nBase base docs)")
    }
  }

  test("compactShards consolidates shard dirs; duplicates from a simulated crash are absorbed") {
    val root = tmpRoot("compact")
    val docs = baseDocs
    IncrementalDedup.buildIndex(docs, "doc_id", "text", root, p, "b1")
    IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 0L until 5L, 1000, 0.9), "doc_id", "text", "b2")
    IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 5L until 10L, 2000, 0.9), "doc_id", "text", "b3")
    val droppedBefore = IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    val bucketRowsBefore = spark.read.parquet(s"$root/buckets").count()
    val ((bBefore, bAfter), (sBefore, sAfter), (lBefore, lAfter)) =
      IncrementalDedup.compactShards(spark, root)
    assert(bBefore === 3 && bAfter === 1 && sBefore === 3 && sAfter === 1)
    // label deltas only exist for shards that changed labels: the
    // duplicate-free build wrote an empty delta (no partition dir)
    assert(lBefore === 2 && lAfter === 1)
    assert(spark.read.parquet(s"$root/buckets").count() === bucketRowsBefore)
    assert(IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet === droppedBefore)
    // ingest against the compacted index still equals full-union dedup
    val b4 = prefixCopy(docs, 10L until 15L, 3000, 0.9)
    IncrementalDedup.addShard(spark, root, b4, "doc_id", "text", "b4")
    val union = docs.unionByName(prefixCopy(docs, 0L until 5L, 1000, 0.9))
      .unionByName(prefixCopy(docs, 5L until 10L, 2000, 0.9))
      .unionByName(b4)
    assert(IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet === fullDroppedSet(union))
    // simulate a crash between promote and source deletion: a source dir
    // survives alongside the consolidated copy -> rows duplicated. Reads
    // must absorb it and the next compaction must converge
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val bucketsDir = new org.apache.hadoop.fs.Path(s"$root/buckets")
    val consolidated = fs.listStatus(bucketsDir)
      .filter(_.getPath.getName.startsWith("ingest_shard=compacted_")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, consolidated, fs,
      new org.apache.hadoop.fs.Path(bucketsDir, "ingest_shard=leftover"),
      false, spark.sparkContext.hadoopConfiguration)
    val rep = IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 15L until 20L, 4000, 0.9), "doc_id", "text", "b5")
    assert(rep.filter(!col("survived")).count() === 5) // dup rows absorbed
    val ((b2Before, b2After), _, _) = IncrementalDedup.compactShards(spark, root)
    assert(b2Before >= 3 && b2After === 1) // leftover + compacted + b4 + b5
    // retraction feeds naming a COLLAPSED shard must fail fast: the
    // published-shard filter would match no rows, old_cluster would fall
    // back to id, and the feed would silently retract every non-root
    // published doc (the r7 advisory finding). Post-compaction shard ids
    // keep working.
    val e1 = intercept[IllegalStateException] {
      IncrementalDedup.republishDelta(spark, root, Seq("b1", "b2")).count()
    }
    assert(e1.getMessage.contains("compactShards"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      IncrementalDedup.retractionsForShard(spark, root, "b4").count()
    }
    assert(e2.getMessage.contains("compactShards"), e2.getMessage)
    val liveShard = fs.listStatus(bucketsDir)
      .map(_.getPath.getName).filter(_.startsWith("ingest_shard="))
      .map(_.stripPrefix("ingest_shard=")).head
    IncrementalDedup.republishDelta(spark, root, Seq(liveShard)).count()
  }

  test("tiered compactShards merges only the small-shard tail; the base partition is untouched") {
    val root = tmpRoot("tiered")
    val docs = baseDocs
    IncrementalDedup.buildIndex(docs, "doc_id", "text", root, p, "big")
    IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 0L until 5L, 1000, 0.9), "doc_id", "text", "d1")
    IncrementalDedup.addShard(spark, root,
      prefixCopy(docs, 5L until 10L, 2000, 0.9), "doc_id", "text", "d2")
    val droppedBefore = IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val bucketsDir = new org.apache.hadoop.fs.Path(s"$root/buckets")
    def sizeOf(s: String): Long = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(bucketsDir, s"ingest_shard=$s"))
      .getLength
    val tier = math.max(sizeOf("d1"), sizeOf("d2"))
    require(sizeOf("big") > tier,
      "fixture: the base build must sit above the tier")
    val ((bB, bA), _, _) = IncrementalDedup.compactShards(spark, root, tier)
    assert(bB === 3 && bA === 2, s"buckets $bB -> $bA")
    val names = fs.listStatus(bucketsDir)
      .map(_.getPath.getName).filter(_.startsWith("ingest_shard="))
      .map(_.stripPrefix("ingest_shard=")).toSet
    assert(names.contains("big") && names.exists(_.startsWith("compacted_")),
      names.toString)
    assert(IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet === droppedBefore)
    // the untouched base still probes: a later ingest equals full-union
    val b4 = prefixCopy(docs, 10L until 15L, 3000, 0.9)
    IncrementalDedup.addShard(spark, root, b4, "doc_id", "text", "d3")
    val union = docs.unionByName(prefixCopy(docs, 0L until 5L, 1000, 0.9))
      .unionByName(prefixCopy(docs, 5L until 10L, 2000, 0.9))
      .unionByName(b4)
    assert(IncrementalDedup.droppedIds(spark, root)
      .collect().map(_.getLong(0)).toSet === fullDroppedSet(union))
  }

  test("hot index bucket star-links the cross probe instead of exploding candidates") {
    // 300 identical docs: every band's bucket holds all 300 (> maxBucket
    // 256). A probing shard doc with the same text must pair with only the
    // bucket's min/max anchors — 2 distinct candidates, not 300 — and
    // still be dropped through the anchor verify (J=1)
    val root = tmpRoot("hot")
    import spark.implicits._
    val text = (0 until 25).map(t => s"hotw$t").mkString(" ")
    val b1 = (0 until 300).map(i => (i.toLong, text)).toDF("doc_id", "text")
    IncrementalDedup.buildIndex(b1, "doc_id", "text", root, p, "b1")
    val shard = Seq((9000L, text)).toDF("doc_id", "text")
    val cross = IncrementalDedup.crossProbe(spark, root,
      IncrementalDedup.shardBuckets(shard, "doc_id", "text", p),
      "b2", p.maxBucket)
    val n = cross.distinct().count()
    assert(n <= 2, s"hot bucket exploded the probe: $n candidate pairs")
    val rep = IncrementalDedup.addShard(spark, root, shard,
      "doc_id", "text", "b2").head()
    assert(!rep.getBoolean(2), "hot-bucket duplicate must still be dropped")
    assert(rep.getLong(1) === 0L, "must resolve to the bucket's min anchor")
  }

  test("meta pins build parameters; probes reuse them") {
    val root = tmpRoot("meta")
    val custom = IncrementalDedup.Params(shingleW = 4, k = 16, bands = 4,
      threshold = 0.7, maxBucket = 64)
    IncrementalDedup.buildIndex(baseDocs, "doc_id", "text", root, custom, "b1")
    assert(IncrementalDedup.readMeta(spark, root) === custom)
  }
}
