package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing fingerprints (Schleimer et al. '03): the native xxhash64
  * path, the portable md5 path, their shared selection guarantees, and
  * the overlap join. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  test("winnowFingerprints: every doc yields >= 1 fp; short docs one whole-text gram") {
    val df = Seq((1L, ""), (2L, "abc"), (3L, "a" * 100)).toDF("id", "text")
    val fps = Dedup.winnowFingerprints(df, "id", "text", k = 8, w = 4)
    val byId = fps.groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet === Set(1L, 2L, 3L)) // even the empty doc
    assert(byId(1L) === 1L && byId(2L) === 1L)
    // constant text: every gram identical -> one distinct (hash) but
    // rightmost-min re-selects a NEW position each window (ties break
    // right), so selections advance one per window
    assert(byId(3L) === (100 - 8 + 1 - 4 + 1).toLong)
  }

  test("winnowFingerprints: selection density and spacing obey the w-gap guarantee") {
    val text = (1 to 400).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val fps = Dedup.winnowFingerprints(Seq((1L, text)).toDF("id", "text"),
        "id", "text", k = 8, w = 4)
      .orderBy("pos").collect().map(_.getInt(1))
    // strictly increasing positions, no gap wider than w
    fps.sliding(2).foreach { case Array(a, b) =>
      assert(b > a && b - a <= 4, s"gap $a -> $b")
    }
  }

  test("winnowing guarantee: a copied span of >= k+w-1 chars shares a fingerprint (both families)") {
    // 40-char shared span embedded at different offsets in junk that
    // shares no 16-gram with anything
    val span = "the quick brown fox jumps over the lazy"
    val a = "A" * 37 + span + "B" * 23
    val b = "x1y2z3 " + span + " 9q8w7e"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    for (fps <- Seq(
        Dedup.winnowFingerprints(df, "id", "text", k = 16, w = 4),
        Dedup.winnowFingerprintsPortable(df, "id", "text", k = 16, w = 4))) {
      val shared = fps.filter(col("id") === 1L).select("fp")
        .intersect(fps.filter(col("id") === 2L).select("fp")).count()
      assert(shared >= 1L)
    }
  }

  test("portable and native paths recover the same planted copy pairs") {
    // per-(doc, pos) avalanche-mixed chars — docs share no 16-gram by
    // accident. A linear-congruence or multiply-shift fixture FAILS
    // here in two distinct ways (both hit while writing this spec):
    // mod-26 congruences make every doc a rotation of one cycle, and a
    // multiply-shift is a near-periodic Weyl sequence whose drift
    // still aligns 16-gram runs between docs. fmix64 avalanches.
    def fmix(v: Long): Long = {
      var x = v
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    val docs = (0L until 30L).map { i =>
      val txt = (1 to 200).map { p =>
        ('a' + math.floorMod(fmix(i * 1000003L + p), 26L).toInt).toChar
      }.mkString
      (i, txt)
    }
    val copies = docs.take(8).map { case (i, txt) =>
      (i + 1000L, s"junk${i}junk " + txt.substring(40, 160))
    }
    val df = (docs ++ copies).toDF("id", "text")
    // threshold 0.25: selection luck at span EDGES varies by hash
    // family, so per-pair overlap lands anywhere above ~0.3 for a
    // 120/200-char copy; unrelated docs share ZERO grams (mixed chars),
    // so the set is exact at any positive threshold
    def pairs(fps: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Dedup.winnowOverlapPairs(fps, maxDf = 4, minShared = 3)
        .filter(col("overlap") >= 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = pairs(Dedup.winnowFingerprints(df, "id", "text", 16, 4))
    val portable = pairs(Dedup.winnowFingerprintsPortable(df, "id", "text", 16, 4))
    val want = (0L until 8L).map(i => (i, i + 1000L)).toSet
    assert(native === want)
    assert(portable === want)
  }

  test("winnowFingerprintsPortable: rightmost-min tie rule and window truncation") {
    // identical chars -> every gram hash equal -> each window's min is
    // its RIGHTMOST gram; doc shorter than w grams keeps only the
    // pos-0 truncated window
    val df = Seq((1L, "aaaaaaaaaaaa"), (2L, "ab")).toDF("id", "text")
    val fps = Dedup.winnowFingerprintsPortable(df, "id", "text", k = 8, w = 4)
      .orderBy("id", "pos").collect()
    val d1 = fps.filter(_.getLong(0) == 1L).map(r => r.getInt(1))
    // 12 chars, k=8 -> 5 grams, windows start at 0..1, rightmost of
    // [0..3] is 3, of [1..4] is 4
    assert(d1.toSeq === Seq(3, 4))
    val d2 = fps.filter(_.getLong(0) == 2L).map(r => r.getInt(1))
    assert(d2.toSeq === Seq(0)) // one whole-text gram, one window
  }

  test("winnowFingerprintsPortable: native pass equals the replaced column spelling bit-for-bit") {
    // The r16 rewrite replaced the explode-per-gram + doc-keyed-window +
    // distinct() column spelling with one native per-row pass
    // (Md5WinnowFingerprints). This pins the two bit-equal on the edge
    // battery: empty text, len < k, len == k, exactly one full window
    // (len == k+w-1), all-identical chars (every window a w-way hash
    // tie), multi-byte UTF-8 (gram offsets are CHAR offsets, md5 runs
    // over UTF-8 bytes), and a long mixed doc. Null text is excluded:
    // the native expression returns NULL (doc absent after explode)
    // where the old spelling emitted an (id, pos, fp=NULL) row — no
    // declared table carries null text (checked across all SFs) and no
    // winnow frame is ever persisted, so the contract change is
    // unreachable; documented here rather than replicated.
    val docs = Seq(
      (1L, ""), (2L, "short"), (3L, "exactly-16-chars"),
      (4L, "exactly one full 19"), (5L, "z" * 64),
      (6L, "héllo wörld ünïcode — ΑΒΓΔ καὶ 中文字符串 🙂 end of doc"),
      (7L, (1 to 500).map(i => ('a' + (i * 31 % 26)).toChar).mkString))
      .toDF("id", "text")
    for ((k, w) <- Seq((16, 4), (8, 4), (4, 7), (1, 1))) {
      val native = Dedup.winnowFingerprintsPortable(docs, "id", "text", k, w)
      val old = {
        val grams = docs.select(col("id").as("id"),
            greatest(length(col("text")) - (k - 1), lit(1)).as("__m"),
            col("text").as("__t"))
          .select(col("id"), col("__m"),
            explode(sequence(lit(0), col("__m") - 1)).as("pos"), col("__t"))
          .withColumn("h", conv(substring(md5(
              col("__t").substr(col("pos") + 1, lit(k)).cast("binary")),
            1, 15), 16, 10).cast("long"))
          .select(col("id"), col("__m"), col("pos"), col("h"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("pos")).rowsBetween(0, w - 1)
        grams
          .withColumn("__sel", min(struct(col("h"),
            (lit(1048575) - col("pos")).as("rp"))).over(win))
          .filter(col("pos") <= greatest(col("__m") - w, lit(0)))
          .select(col("id"), (lit(1048575) - col("__sel.rp")).as("pos"),
            col("__sel.h").as("fp"))
          .distinct()
      }
      val onlyNative = native.exceptAll(old).count()
      val onlyOld = old.exceptAll(native).count()
      assert(onlyNative === 0L && onlyOld === 0L,
        s"k=$k w=$w: native-only=$onlyNative old-only=$onlyOld")
    }
  }

  test("winnowContamination: planted slice flagged with span evidence; clean docs silent") {
    def fmix(v: Long): Long = {
      var x = v
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    val docs = (0L until 20L).map { i =>
      (i, (1 to 200).map { p =>
        ('a' + math.floorMod(fmix(i * 999983L + p), 26L).toInt).toChar
      }.mkString)
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("bench_id"),
        substring(col("text"), 41, 120).as("text"))
    for (out <- Seq(
        Dedup.winnowContamination(docs, "doc_id", "text",
          bench, "bench_id", "text", k = 16, w = 4, minShared = 3),
        Dedup.winnowContaminationPortable(docs, "doc_id", "text",
          bench, "bench_id", "text", k = 16, w = 4, minShared = 3))) {
      val rows = out.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4)))
      // exactly the two sliced docs, each against its own slice
      assert(rows.map(r => (r._1, r._2)).toSeq === Seq((0L, 0L), (1L, 1L)))
      rows.foreach { case (_, _, shared, s, e) =>
        assert(shared >= 3L)
        // slice covers 0-based chars [40, 160): matched fingerprints
        // must sit inside it (grams start <= 160 - k)
        assert(s >= 40 && e <= 160 - 16, s"span [$s, $e]")
      }
    }
  }

  test("icwsBuckets: identical bags share every sample; both hash families") {
    val tf = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 2L), (2L, "b", 1L),
      (3L, "zq", 7L)).toDF("id", "tok", "w")
    for (hashed <- Seq(false, true)) {
      val bk = Dedup.icwsBuckets(tf, "id", "tok", "w", k = 8, hashed = hashed)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      assert(bk.count(_._1 == 1L) === 8)
      val m1 = bk.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
      val m2 = bk.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
      assert(m1 === m2) // same bag -> same draw, all 8 samples
      // single-dimension doc: its encoded bucket always carries the
      // dimension hash of its only token in the low 10^18 slot
      val d3 = bk.filter(_._1 == 3L).map(_._3)
      assert(d3.length === 8)
      val lowSlots = d3.map(b => BigInt(b) mod BigInt("1000000000000000000"))
      assert(lowSlots.distinct.length === 1) // same d -> same h60 slot
    }
  }

  test("icwsBuckets md5 family: native draws equal the replaced column spelling bit-for-bit") {
    // r16 rewrite: the six interpreted conv(substring(md5(...)))
    // chains per exploded (row, sample) became one native pass
    // (Md5IcwsDraws). This reconstructs the replaced spelling column
    // for column and pins the bucket frames frame-equal, unicode
    // dimensions included (draw strings concatenate the raw dimension).
    val tf = Seq(
      (1L, "alpha", 3L), (1L, "beta", 1L), (1L, "中文", 7L),
      (2L, "alpha", 2L), (2L, "gamma", 5L), (2L, "🙂", 1L),
      (3L, "x", 1000000L), (3L, "beta", 1L))
      .toDF("id", "tok", "w")
    for ((kk, rpb) <- Seq((8, 1), (8, 2), (4, 4))) {
      val got = Dedup.icwsBuckets(tf, "id", "tok", "w", k = kk,
        hashed = false, rowsPerBand = rpb)
      val old = {
        def u(i: Int) =
          (conv(substring(md5(concat(lit("icws|"), col("__d"), lit("|"),
            col("j").cast("string"), lit(s"|$i")).cast("binary")), 1, 13),
            16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0)
        val hd = pmod(conv(substring(md5(col("__d").cast("binary")),
          1, 15), 16, 10).cast("long"), lit(1000000000000000000L))
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val drawn = tf
          .filter(col("w").cast("double") > 0.0)
          .select(col("id"), col("tok").cast("string").as("__d"),
            col("w").cast("double").as("__w"))
          .withColumn("j",
            explode(array((0 until kk).map(i => lit(i)): _*)))
          .withColumn("__r", -(log(u(1)) + log(u(2))))
          .withColumn("__c", -(log(u(3)) + log(u(4))))
          .withColumn("__beta", u(5))
          .withColumn("__t",
            floor(round(log(col("__w")) / col("__r") + col("__beta"), 6)))
          .withColumn("__enc", (round((log(col("__c")) -
            col("__r") * (col("__t") - col("__beta")) - col("__r")) * 1e6)
            .cast("long") + lit(1000000000L)).cast(dec) *
            lit(1000000000000000000L) + hd.cast(dec))
        val perSample = drawn.groupBy(col("id"), col("j"))
          .agg(min(col("__enc")).as("__m"))
        if (rpb == 1)
          perSample.select(col("id"), col("j").as("band"),
            col("__m").cast("string").as("bucket"))
        else
          perSample.groupBy(col("id"),
              (col("j") / rpb).cast("int").as("band"))
            .agg(concat_ws("|", transform(
              sort_array(collect_list(struct(col("j"),
                col("__m").cast("string").as("e")))),
              x => x.getField("e"))).as("bucket"))
      }
      assert(got.exceptAll(old).count() === 0L,
        s"k=$kk rpb=$rpb: native-only rows")
      assert(old.exceptAll(got).count() === 0L,
        s"k=$kk rpb=$rpb: old-only rows")
    }
  }

  test("weightedJaccardPairs: TF-aware where set minhash is blind; exact verify values") {
    // doc 2 = doc 1's bag doubled: SET jaccard 1, weighted 3/6 = 0.5;
    // doc 3 = identical bag to doc 1 -> 1.0; doc 4 disjoint
    val tf = Seq(
      (1L, "a", 2L), (1L, "b", 1L),
      (2L, "a", 4L), (2L, "b", 2L),
      (3L, "a", 2L), (3L, "b", 1L),
      (4L, "x", 3L), (4L, "y", 1L)
    ).toDF("id", "tok", "w")
    for (hashed <- Seq(false, true)) {
      val got = Dedup.weightedJaccardPairs(tf, "id", "tok", "w", k = 8,
          threshold = 0.4, hashed = hashed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got.contains((1L, 3L, 1.0)))
      // candidate recall for J_w=0.5 at k=8 is 1-(1/2)^8 per the draw;
      // whatever the draw does, a FOUND pair must verify to exactly 0.5
      got.filter(p => Set(p._1, p._2) == Set(1L, 2L))
        .foreach(p => assert(p._3 === 0.5))
      got.filter(p => Set(p._1, p._2) == Set(2L, 3L))
        .foreach(p => assert(p._3 === 0.5))
      // disjoint doc 4 never pairs (no shared dimension, no collision)
      assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    }
  }

  test("weightedJaccardPairs: refuses fractional weights loudly") {
    // identical single-token bags always collide -> the verify leg is
    // guaranteed to evaluate the weight rows and hit the guard; the
    // old long cast would have truncated 0.5 -> 0 silently
    val tf = Seq((1L, "a", 0.5), (2L, "a", 0.5)).toDF("id", "tok", "w")
    val ex = intercept[Throwable] {
      Dedup.weightedJaccardPairs(tf, "id", "tok", "w", k = 2,
        threshold = 0.1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("non-integer weight")),
      msgs(ex).mkString("; "))
  }

  test("winnowOverlapPairs: maxDf drops boilerplate, overlap is containment-style") {
    // fp 100 in every doc (boilerplate); docs 1,2 share rare fps 7,8;
    // doc 3 shares nothing rare
    val fps = Seq(
      (1L, 0, 100L), (2L, 0, 100L), (3L, 0, 100L),
      (1L, 5, 7L), (2L, 9, 7L),
      (1L, 8, 8L), (2L, 14, 8L),
      (3L, 4, 9L)
    ).toDF("id", "pos", "fp")
    val got = Dedup.winnowOverlapPairs(fps, maxDf = 2, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // doc1 has 3 fps, doc2 has 3 -> overlap = 2/3
    assert(got.toSeq === Seq((1L, 2L, 2L, 0.666667)))
  }
}
