package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking: the walk semantics, both hash families'
  * shared contract (bounds, concatenation identity, determinism), the
  * property the operator exists for (post-edit boundary
  * resynchronization — fixed windows lose every downstream chunk, CDC
  * loses only the edited neighborhood), and the [[Cdc.chunkReuse]]
  * readout. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val words = (0 until 400).map(i => s"w${i * 7919 % 997}")
  // seeded PRNG per doc: different seeds yield INDEPENDENT word
  // streams (an affine (i*31+seed) index would make every doc a
  // shifted window of one cyclic stream — and chunks really would
  // repeat across "unrelated" docs)
  private def text(n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def checkContract(chunks: DataFrame, source: DataFrame,
      minLen: Int, maxLen: Int): Unit = {
    val byDoc = chunks.groupBy("id")
      .agg(collect_list(struct(col("idx"), col("start"), col("len")))
        .as("cs"))
      .join(source.withColumnRenamed("doc_id", "id"), Seq("id"))
      .collect()
    assert(byDoc.nonEmpty)
    byDoc.foreach { r =>
      val t = r.getAs[String]("text")
      val cs = r.getSeq[org.apache.spark.sql.Row](1)
        .sortBy(_.getInt(0))
      // contiguity + concatenation identity: chunks tile the text
      var pos = 0
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getInt(0) == i, "idx is the 0-based chunk ordinal")
        assert(c.getInt(1) == pos, s"chunk $i starts where $i-1 ended")
        pos += c.getInt(2)
      }
      assert(pos == t.length, "chunks cover the text exactly")
      // bounds: every chunk <= maxLen; every non-tail chunk >= minLen
      cs.foreach(c => assert(c.getInt(2) <= maxLen))
      cs.dropRight(1).foreach(c => assert(c.getInt(2) >= minLen))
    }
  }

  test("portable: contract (tiling, bounds) on mixed-length docs") {
    val d = docs(1L -> text(60, 1), 2L -> text(5, 2), 3L -> "short",
      4L -> text(200, 3))
    checkContract(Cdc.chunksPortable(d, "doc_id", "text"), d, 24, 96)
  }

  test("gear: contract (tiling, bounds) on mixed-length docs") {
    val d = docs(1L -> text(60, 1), 2L -> text(5, 2), 3L -> "short",
      4L -> text(200, 3))
    checkContract(Cdc.chunks(d, "doc_id", "text", maskBits = 5,
      minLen = 24, maxLen = 96), d, 24, 96)
  }

  test("empty and null text produce no chunks; determinism across runs") {
    val d = Seq((1L, Some(text(40, 4))), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    val p = Cdc.chunksPortable(d, "doc_id", "text")
    val g = Cdc.chunks(d, "doc_id", "text", maskBits = 4, minLen = 8,
      maxLen = 64)
    for (c <- Seq(p, g)) {
      val ids = c.select("id").distinct().as[Long].collect().toSet
      assert(ids == Set(1L), "empty/null docs yield zero chunk rows")
    }
    assert(p.collect().toSet == Cdc.chunksPortable(d, "doc_id", "text")
      .collect().toSet, "portable chunking is deterministic")
    assert(g.collect().toSet == Cdc.chunks(d, "doc_id", "text",
      maskBits = 4, minLen = 8, maxLen = 64).collect().toSet,
      "gear chunking is deterministic")
  }

  test("walk forces max-length cuts through candidate deserts") {
    // no candidates at all (divisor too selective for a short doc):
    // the walk must emit ceil(len/maxLen) forced chunks, all maxLen
    // except the tail
    val t0 = "a" * 250
    val out = Cdc.chunksPortable(docs(1L -> t0), "doc_id", "text",
        k = 16, divisor = 1000000000, minLen = 24, maxLen = 96)
      .orderBy("idx").collect()
    assert(out.map(_.getAs[Int]("len")).toSeq == Seq(96, 96, 58))
  }

  test("edit resynchronization: both families, vs the fixed-window loss") {
    // one 11-char insertion at the head of a 200-word doc; compare the
    // chunk-digest multisets of original vs edited
    val orig = text(200, 9)
    val edited = "EDIT-BURST " + orig
    def digestOverlap(chunker: DataFrame => DataFrame): (Long, Long) = {
      val c = chunker(docs(1L -> orig, 2L -> edited))
      val a = c.filter($"id" === 1L).select("digest")
      val b = c.filter($"id" === 2L).select("digest")
      (b.intersect(a.select("digest")).count(), b.count())
    }
    val (sharedP, totalP) = digestOverlap(
      Cdc.chunksPortable(_, "doc_id", "text"))
    val (sharedG, totalG) = digestOverlap(
      Cdc.chunks(_, "doc_id", "text", maskBits = 5, minLen = 24,
        maxLen = 96))
    assert(sharedP >= (totalP * 3) / 4,
      s"portable resyncs: $sharedP/$totalP chunks survive a head edit")
    assert(sharedG >= (totalG * 3) / 4,
      s"gear resyncs: $sharedG/$totalG chunks survive a head edit")
    // the fixed-window strawman on the same pair: every 64-char window
    // after the insertion shifts, so (near-)zero digests survive
    val fixedShared = {
      val d = docs(1L -> orig, 2L -> edited)
        .select($"doc_id", posexplode(split(rpad($"text",
          (ceil(length($"text") / 64) * 64).cast("int"), lit(" ")),
          "(?<=\\G.{64})")).as(Seq("i", "w")))
        .select($"doc_id", md5($"w").as("digest"))
      d.filter($"doc_id" === 2L).select("digest")
        .intersect(d.filter($"doc_id" === 1L).select("digest")).count()
    }
    assert(fixedShared <= 1,
      s"fixed windows lose (nearly) everything after the edit: $fixedShared")
  }

  test("gear hash locality: a mid-document edit leaves distant chunks bit-identical") {
    // edit in the MIDDLE: chunks strictly before the edit are untouched
    // (prefix-identical input), and the walk re-syncs after it — check
    // both tails of the chunk sequence, not just multiset overlap
    val orig = text(300, 11)
    val mid = orig.length / 2
    val edited = orig.substring(0, mid) + " SPLICED-EDIT " + orig.substring(mid)
    val c = Cdc.chunks(docs(1L -> orig, 2L -> edited), "doc_id", "text",
      maskBits = 5, minLen = 24, maxLen = 96)
    val a = c.filter($"id" === 1L).orderBy("idx")
      .select("digest").as[Long].collect()
    val b = c.filter($"id" === 2L).orderBy("idx")
      .select("digest").as[Long].collect()
    val commonPrefix = a.zip(b).takeWhile { case (x, y) => x == y }.length
    val commonSuffix = a.reverse.zip(b.reverse)
      .takeWhile { case (x, y) => x == y }.length
    assert(commonPrefix >= 1, "pre-edit chunks are shared")
    assert(commonSuffix >= 1, "post-resync chunks are shared")
    assert(commonPrefix + commonSuffix >= a.length - 4,
      s"at most 4 chunks differ around the edit " +
        s"(prefix=$commonPrefix suffix=$commonSuffix of ${a.length})")
  }

  test("chunkReuse: per-doc counts, set semantics on the old side") {
    val v1 = docs(1L -> text(100, 21), 2L -> text(100, 22),
      3L -> text(100, 23))
    // v2: doc 1 unchanged, doc 2 head-edited, doc 4 fresh
    val v2 = docs(1L -> text(100, 21),
      2L -> ("REV2 " + text(100, 22)), 4L -> text(100, 24))
    val c1 = Cdc.chunksPortable(v1, "doc_id", "text")
    val c2 = Cdc.chunksPortable(v2, "doc_id", "text")
    val r = Cdc.chunkReuse(c1, c2).collect()
      .map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("n_reused"), x.getAs[Long]("n_chunks"))).toMap
    assert(r(1L)._1 == r(1L)._2, "unchanged doc reuses every chunk")
    assert(r(2L)._1 >= (r(2L)._2 * 3) / 4, "edited doc resyncs")
    assert(r(4L)._1 <= r(4L)._2 / 4, "fresh doc reuses (almost) nothing")
    // duplicating the old side must not double-count reuse hits
    val rDup = Cdc.chunkReuse(c1.unionByName(c1), c2).collect()
      .map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("n_reused"), x.getAs[Long]("n_chunks"))).toMap
    assert(rDup == r, "old-side digests are a SET")
  }

  test("minReuseLen: tails excluded from set AND denominator; all-sub-min doc reads null") {
    // doc 1 has a sub-min forced tail (its last chunk < minLen); an
    // identical re-crawl must STILL read exactly 1.0 — the tail is out
    // of the denominator, not counted as a miss. Doc 3's junk tail
    // matching doc 1's tail must NOT read as reuse. Doc 4 is shorter
    // than minLen entirely: no reusable chunks -> frac null.
    val t1 = text(100, 31)
    val v1 = docs(1L -> t1)
    val tail2 = t1.takeRight(2)
    val v2 = docs(10L -> t1,                    // identical re-crawl
      11L -> (text(100, 32) + " q" + tail2),    // unrelated + same 2-char tail
      12L -> "tiny")                            // all-sub-min doc
    val c = (d: DataFrame) => Cdc.chunksPortable(d, "doc_id", "text",
      k = 16, divisor = 16, minLen = 24, maxLen = 96)
    val r = Cdc.chunkReuse(c(v1), c(v2), minReuseLen = 24).collect()
      .map(x => x.getAs[Long]("id") -> x).toMap
    assert(r(10L).getAs[Double]("reused_frac") == 1.0,
      "identical doc reads 1.0 even with a sub-min tail")
    assert(r(11L).getAs[Long]("n_reused") == 0L,
      "a junk tail match never counts as reuse")
    assert(r(12L).isNullAt(r(12L).fieldIndex("reused_frac")),
      "no reusable chunks -> null frac")
    assert(r(12L).getAs[Long]("n_chunks") == 1L,
      "sub-min chunks still count in the tiling columns")
  }

  test("portable candidates match the oracle hash spelling") {
    // h60(p) for the k-gram ending at p, spelled exactly as the DuckDB
    // oracle spells it — pin one literal so a refactor of h60 cannot
    // silently diverge from the committed oracle SQL
    val t = "abcdefghijklmnopqrstuvwxyz"
    val k = 16
    val got = spark.range(1)
      .select(conv(substring(md5(lit(t.substring(0, k)).cast("binary")),
        1, 15), 16, 10).cast("long")).head().getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(t.substring(0, k).getBytes("UTF-8"))
    val expect = md.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xFF)) >>> 4
    assert(got == expect, "h60 = top 60 bits of md5")
  }
}
