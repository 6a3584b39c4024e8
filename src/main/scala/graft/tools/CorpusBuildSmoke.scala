package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Packing, Sampling, TextAnalysis}

/** End-to-end corpus-build rehearsal at smoke scale — the full
  * pretraining-data pipeline over the 1M-doc TextScaleSmoke word-soup
  * corpus, chained the way a production run chains it:
  *
  *   normalize -> langid route -> TRAINED quality gate (the x88/x90
  *   CCNet loop) -> dedup stack (exact digest + MinHash/LSH clusters +
  *   SemDeDup on an embedded subset) -> benchmark decontamination ->
  *   leakage-safe cluster-unit split (x103) -> sequence pack (x97)
  *
  * The per-op scale smokes prove each stage alone; THIS shakeout is for
  * cross-operator interface drift — column contracts, persist/unpersist
  * discipline across stage boundaries, survivor-frame joins — that
  * per-op runs cannot see. Per-stage wall times print for BASELINE.md
  * stage attribution.
  *
  * Planted structure (all deterministic, all found by their stages):
  *  - every 7th doc carries a spam marker tail -> the trained gate's
  *    drop class (labels derive from the marker, training sees ~1%)
  *  - every 50th+1 doc is an EXACT duplicate of its neighbor
  *  - every 50th+2 doc is an 80%-prefix NEAR duplicate of its neighbor
  *  - the benchmark set is 500 verbatim corpus docs -> decontamination
  *    must remove their survivors
  */
object CorpusBuildSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.local(cores = 8)
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[corpus-build] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    // content key: dup/near-dup docs share their neighbor's token stream
    val ck = when(col("id") % 50 === 1, col("id") - 1)
      .when(col("id") % 50 === 2, col("id") - 2)
      .otherwise(col("id"))
    val toks = transform(sequence(lit(0), lit(39)), p =>
      concat(lit("w"), pmod(xxhash64(lit(7), ck, p), lit(5000))))
    val body = when(col("id") % 50 === 2,
        concat_ws(" ", slice(toks, 1, 32)))          // 80% prefix near-dup
      .otherwise(concat_ws(" ", toks))
    val corpus = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"),
        when(col("id") % 7 === 0,
          concat(body, lit(" zz9 zz9 zz9 zz9")))      // spam marker class
          .otherwise(body).as("text"),
        concat(lit("lang"), pmod(col("id"), lit(8)).cast("string"))
          .as("lang"))

    time(s"0 corpus materialize ($n docs)")(corpus.count())

    // 1. normalize -------------------------------------------------------
    val normed = TextAnalysis.normalizeText(corpus, "text", "normalized")
      .select(col("doc_id"), col("normalized").as("text"), col("lang"))
    time("1 normalize (map-only)")(normed.count())

    // 2. langid route (word-soup is 'unknown' -> declared-lang fallback,
    // the production rule for sub-threshold detector confidence) --------
    val routed = TextAnalysis.languageId(normed)
      .withColumn("route",
        when(col("predicted_lang") === "unknown", col("lang"))
          .otherwise(col("predicted_lang")))
      .select(col("doc_id"), col("text"), col("route"))
      .persist()
    time("2 langid route")(routed.count())

    // 2b. rule-based filters (Gopher bundle + blocklist), measurement
    // pass — production runs rules BEFORE the learned gate; word-soup
    // passes them by construction, so this stage prices the map-only
    // scan and sanity-checks the pass rate rather than dropping rows
    time("2b rule filters (Gopher + blocklist, map-only)") {
      val ruled = TextAnalysis.blocklistFilter(
        TextAnalysis.gopherQualityRules(routed, "text", minWords = 20),
        "text", Seq("graftblockedterm", "graft blocked pair"))
      val r = ruled.agg(
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("pass"),
        sum(when(col("blocked"), 1L).otherwise(0L)).as("blocked")).head()
      require(r.getLong(1) == 0L, "blocklist must not fire on this corpus")
      println(s"[corpus-build]   gopher pass ${r.getLong(0)} of $n")
    }
    // 2c. entropy filter (r10 s2): one codegen'd per-row loop; word-soup
    // has healthy entropy by construction, so this prices the scan and
    // asserts the flag stays quiet rather than dropping rows
    time("2c char-entropy filter (map-only)") {
      val flagged = TextAnalysis.charEntropyProfile(routed, "doc_id", "text")
        .agg(sum(when(col("low_entropy"), 1L).otherwise(0L))).head().getLong(0)
      require(flagged == 0L, s"low-entropy flag fired $flagged times on word-soup")
    }
    // 2d. DSIR selection signal (r10 s2): target = route-0 docs; two
    // distribution aggregates to driver state, then a map-only scoring
    // scan — the ranking a target-domain selection would cut on
    time("2d DSIR importance (map-only scoring)") {
      val w = TextAnalysis.dsirImportance(routed,
          routed.filter(col("route") === "lang0"), "text",
          buckets = 1024)
        .agg(avg(col("log_weight")), max(col("log_weight"))).head()
      println(f"[corpus-build]   dsir mean=${w.getDouble(0)}%.4f max=${w.getDouble(1)}%.4f")
    }

    // 3. trained quality gate (x88 train on a ~1% labeled sample, x90
    // gate the full corpus with the learned weights) ---------------------
    val model = time("3a train hashed logreg (1% sample)") {
      val sample = routed.filter(col("doc_id") % 97 === 0)
        .withColumn("y", (col("doc_id") % 7 =!= 0).cast("int"))
      TextAnalysis.trainHashedLogReg(sample, "text", "y",
        buckets = 2048, epochs = 3, lr = 0.1)
    }
    val gated = TextAnalysis.hashedLinearScore(routed, "doc_id", "text",
        model.weights, model.bias)
      .filter(col("label"))
      .select(col("doc_id"), col("text"), col("route"))
      .persist()
    val nGated = time("3b gate corpus (map-only inference)")(gated.count())
    routed.unpersist()
    val keepFrac = nGated.toDouble / n
    println(f"[corpus-build]   gate kept $nGated (${keepFrac * 100}%.1f%%; spam class is 1/7)")
    require(keepFrac > 0.70 && keepFrac < 0.95,
      s"gate kept fraction $keepFrac outside sanity range — training drifted")

    // 4. dedup stack -----------------------------------------------------
    val exactIds = time("4a exact dedup (8-byte digest key)") {
      val s = Dedup.exactByDigest(gated, "text", "doc_id").persist()
      s.count(); s
    }
    val exactKept = gated.join(exactIds.select(col("doc_id")), Seq("doc_id"),
      "left_semi").persist()
    time("4b exact survivors (semi-join)")(exactKept.count())
    gated.unpersist(); exactIds.unpersist()
    val pairs = time("4c minhash/LSH near-dup pairs") {
      val p = Dedup.minhashLshPairs(exactKept, "doc_id", "text",
        shingleW = 3, k = 32, bands = 8, threshold = 0.5).persist()
      p.count(); p
    }
    val labels = time("4d cluster resolution (union-find)") {
      val l = Dedup.resolveClusters(pairs).persist(); l.count(); l
    }
    val nearKept = time("4e near-dup survivors") {
      val k = Dedup.dedupByClusters(exactKept, "doc_id", pairs).persist()
      k.count(); k
    }
    exactKept.unpersist()

    // SemDeDup leg on the embedded 5% subset (production embeds a slice,
    // not the corpus): 16-dim token-hash histograms as the stand-in
    // embedding, k-means centroids trained in-pipeline
    val semDropped = time("4f SemDeDup (5% embedded subset)") {
      val sub = nearKept.filter(col("doc_id") % 20 === 0)
      val hist = sub.select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"),
          pmod(xxhash64(col("t")), lit(16)).cast("int").as("pos"))
        .agg(count(lit(1)).cast("double").as("v"))
      val vecs = sub.select(col("doc_id"))
        .join(spark.range(16).select(col("id").cast("int").as("pos")))
        .join(hist, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"),
          coalesce(col("v"), lit(0.0)).as("v"))
        .groupBy(col("doc_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("vec"))
        .persist()
      val model = graft.ops.IVF.train(vecs, "doc_id", "vec",
        nc = 256, iters = 2)
      val cents = model.centroids.zipWithIndex
        .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("cid", "cv")
      val dropped = Dedup.semanticDedup(vecs, "doc_id", "vec", cents,
          "cid", "cv", threshold = 0.999, maxClusterSize = 20000L)
        .filter(!col("kept")).select(col("doc_id")).persist()
      dropped.count()
      vecs.unpersist()
      dropped
    }
    val deduped = nearKept.join(semDropped, Seq("doc_id"), "left_anti")
      .persist()
    time("4g post-dedup corpus")(deduped.count())
    nearKept.unpersist(); semDropped.unpersist()

    // 5. benchmark decontamination (500 verbatim corpus docs): the
    // production two-phase shape — map-only Bloom screen corpus-wide,
    // exact paragraph decontamination ONLY on the flagged slice (one-
    // sided error: the screen never misses, so the exact pass's input
    // is flagged-sized, not corpus-sized)
    val bench = corpus.filter(col("doc_id") % 2000 === 17)
      .select(col("text")).limit(500)
    val flagged = time("5a bloom screen (map-only, corpus-wide)") {
      val f = TextAnalysis.contaminationBloom(deduped, bench,
          "doc_id", "text")
        .filter(col("maybe_contaminated")).select(col("doc_id")).persist()
      val nf = f.count()
      println(s"[corpus-build]   screen flagged $nf docs for the exact pass")
      f
    }
    val cleaned = time("5b exact decontaminate (flagged slice only)") {
      val flaggedDocs = deduped.join(flagged, Seq("doc_id"), "left_semi")
      val dirty = TextAnalysis.decontaminateParagraphs(flaggedDocs, bench,
          "doc_id", "text")
        .filter(col("n_removed") > 0)
        .select(col("id").as("doc_id"))
      val c = deduped.join(dirty, Seq("doc_id"), "left_anti").persist()
      c.count(); c
    }
    flagged.unpersist()

    // 5c. winnow span audit (r12): the evidence-side complement of the
    // Bloom yes/no — native fingerprints both sides, benchmark side
    // broadcast, reports WHERE the benchmark text sits in each hit.
    // Corpus-wide map-only fingerprinting + one (doc, bench) aggregate.
    time("5c winnow span audit (corpus-wide, native)") {
      val benchIdx = bench.select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("text"))).cast("long").as("bench_id"), col("text"))
      val hits = graft.ops.Dedup.winnowContamination(deduped, "doc_id",
        "text", benchIdx, "bench_id", "text", k = 16, w = 4, minShared = 3)
      val r = hits.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      println(s"[corpus-build]   span hits=${r.getLong(0)} over " +
        s"${r.getLong(1)} docs (verbatim bench members must all surface)")
    }

    // 6. leakage-safe split on the near-dup cluster labels ---------------
    val split = time("6 leakage-safe cluster-unit split") {
      val s = Sampling.leakageSafeSplit(cleaned, "doc_id", labels).persist()
      val counts = s.groupBy(col("split")).count()
        .as[(String, Long)].collect().toMap
      println(s"[corpus-build]   split counts: $counts")
      s
    }
    cleaned.unpersist(); labels.unpersist(); pairs.unpersist()

    // 7. sequence pack (x97 concat-and-chunk over route shards) ----------
    time("7 sequence map (2048-token chunks)") {
      val packed = Packing.sequenceAssignments(
        split.withColumn("token_cnt", TextAnalysis.tokenCount(col("text"))),
        "route", "doc_id", "token_cnt", 2048L)
      val r = packed.agg(count(lit(1)).as("n_rows"),
        max(col("seq_id")).as("max_seq")).head()
      println(s"[corpus-build]   packed incidence rows=${r.getLong(0)} " +
        s"sequences=${r.getLong(1) + 1}")
    }

    // 7b. padded-batch plan (r12): the encoder-regime sibling of 7 —
    // length buckets bound per-doc padding; one (route, bucket) window
    time("7b length-bucketed padded batches (encoder regime)") {
      val b = Packing.lengthBucketedBatches(
        split.withColumn("token_cnt", TextAnalysis.tokenCount(col("text"))),
        "route", "doc_id", "token_cnt", batchTokens = 8192L,
        bucketWidth = 16)
      val r = b.agg(count(lit(1)),
        sum(col("bucket_cap") - col("token_cnt")),
        sum(col("token_cnt"))).head()
      val waste = r.getLong(1).toDouble /
        (r.getLong(1) + r.getLong(2)).toDouble
      println(f"[corpus-build]   batch rows=${r.getLong(0)} pad-waste=" +
        f"${waste * 100}%.1f%% (bucketWidth bounds it by construction)")
    }
    split.unpersist()

    spark.stop()
  }
}
