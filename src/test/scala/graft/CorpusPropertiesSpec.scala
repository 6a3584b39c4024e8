package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Packing, TextAnalysis}

/** Property-style tests for the corpus-prep operators (same explicit-grid
  * style as QualityPropertiesSpec — the scalatest/scalacheck bridge isn't
  * on the offline classpath): structural invariants that must hold for
  * every input size, not just the crafted examples. */
class CorpusPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val chunkSize = 32
  private val overlap = 8
  private val stride = chunkSize - overlap

  test("property: chunking covers every token exactly once after overlap removal") {
    // grid straddles the boundaries: empty, under-overlap, exact chunk,
    // one-past, multiple strides, non-aligned tails
    val ns = Seq(0, 1, 5, 8, 9, 24, 25, 32, 33, 56, 57, 80, 100, 257)
    val docs = ns.map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkByTokens(docs, "doc_id", "text", chunkSize, overlap)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    ns.foreach { n =>
      if (n == 0) assert(!chunks.contains(0L), "empty doc must yield no chunks")
      else {
        val cs = chunks(n.toLong)
        assert(cs.head._2 == 0, s"n=$n: chunk ids must start at 0")
        assert(cs.map(_._2).toSeq == cs.indices.toSeq, s"n=$n: chunk ids contiguous")
        // every non-final chunk is full
        cs.init.foreach(c => assert(c._3 == chunkSize, s"n=$n chunk ${c._2} short"))
        // dropping the overlap from every chunk after the first reconstructs
        // the document exactly — no token lost, none duplicated
        val rebuilt = cs.head._4.split(" ").toSeq ++
          cs.tail.toSeq.flatMap(_._4.split(" ").drop(overlap).toSeq)
        assert(rebuilt == (1 to n).map(i => s"t$i"), s"n=$n reconstruction")
      }
    }
  }

  test("property: packing bins equal a driver-side cumulative-sum recompute") {
    val grids = Seq(
      Seq(1, 1, 1),
      Seq(100, 2000, 5, 49, 1900, 2048, 1),
      Seq(5000, 10, 10),
      (1 to 40).map(i => i * 37))
    grids.zipWithIndex.foreach { case (tokens, g) =>
      val df = tokens.zipWithIndex
        .map { case (t, i) => (i.toLong, s"shard$g", t) }
        .toDF("doc_id", "shard", "token_cnt")
      val got = Packing.packByBudget(df, "shard", "doc_id", "token_cnt", 2048)
        .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
      var cum = 0L
      val want = tokens.zipWithIndex.map { case (t, i) =>
        val start = cum; cum += t; i.toLong -> start / 2048
      }.toMap
      assert(got == want, s"grid $g")
    }
  }

  test("property: paragraph dedup keeps exactly the min-(id,pos) occurrence of every distinct paragraph") {
    // paragraph pools of varying size -> dense cross-document duplication
    // with colliding positions; the rule must hold for every mix
    Seq(3, 7, 20).foreach { pool =>
      val docs = (0 until 25).map { i =>
        (i.toLong, (0 until 4).map(j => s"para${(i * 4 + j * 7) % pool}")
          .mkString("\n\n"))
      }.toDF("doc_id", "text")
      val rows = Dedup.paragraphDedup(docs, "doc_id", "text")
        .as[(Long, Int, String, Boolean)].collect()
      val first = rows.groupBy(_._3).view
        .mapValues(rs => rs.map(r => (r._1, r._2)).min).toMap
      rows.foreach { case (id, pos, para, kept) =>
        assert(kept == (first(para) == ((id, pos))), s"pool=$pool ($id,$pos)")
      }
      assert(rows.count(_._4) == rows.map(_._3).distinct.length, s"pool=$pool")
    }
  }

  test("property: mixture rates and mod-path sample match a driver recompute") {
    val grids = Seq(Seq(("a", 50), ("b", 10)), Seq(("a", 200), ("b", 3), ("c", 40)))
    grids.foreach { strata =>
      val data = strata.flatMap { case (nm, n) => Seq.fill(n)(nm) }
        .zipWithIndex.map { case (nm, i) => (i.toLong, nm, 10L + i % 7) }
      val budget = 300L
      val out = graft.ops.Sampling
        .mixtureByTokenBudget(data.toDF("id", "src", "tok"), "src", "id",
          "tok", budget, byHash = false)
        .as[(String, Long, Long, Double)].collect().toSet
      val totals = data.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val rate = totals.map { case (k, v) =>
        k -> math.min(1.0, budget.toDouble / v) }
      val expected = data
        // kept residues = round(rate * den), matching the rounded
        // threshold stratifiedSampleByMod applies
        .filter { case (id, nm, _) => (id % 100) < math.round(rate(nm) * 100) }
        .map(r => (r._2, r._1, r._3, rate(r._2))).toSet
      assert(out == expected, s"strata $strata")
    }
  }

  test("property: digest dedup equals full-text dedup for every group-size mix") {
    val sizes = Seq(Seq(1, 1, 1), Seq(2, 3, 1), Seq(7, 1, 4, 4), Seq(20))
    sizes.zipWithIndex.foreach { case (mix, g) =>
      val rows = mix.zipWithIndex.flatMap { case (sz, grp) =>
        (0 until sz).map(i => ((grp * 1000 + i).toLong, s"group $g-$grp body text"))
      }
      val df = rows.toDF("doc_id", "text")
      val full = Dedup.exact(df, "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      val digest = Dedup.exactByDigest(df, "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(digest == full, s"mix $mix")
      assert(full.values.toSeq.sorted == mix.map(_.toLong).sorted, s"mix $mix counts")
    }
  }

  test("property: pairMetrics equals a driver-side reference on adversarial pair grids") {
    // deterministic LCG pair soup: duplicates, reversals, self-pairs,
    // disjoint and overlapping predicted/truth — the reference computes
    // canonicalized-set P/R/F1 independently of the operator's plan
    def lcgPairs(seed: Long, count: Int, idSpace: Long): Seq[(Long, Long)] = {
      var s = seed
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
      (0 until count).map { _ =>
        (math.floorMod(next(), idSpace), math.floorMod(next(), idSpace))
      }
    }
    val grids = Seq(
      (lcgPairs(1, 0, 10), lcgPairs(2, 30, 10)),   // empty predicted
      (lcgPairs(3, 30, 10), lcgPairs(4, 0, 10)),   // empty truth
      (lcgPairs(5, 50, 8), lcgPairs(6, 50, 8)),    // dense overlap, many dups
      (lcgPairs(7, 40, 1000), lcgPairs(8, 40, 1000)), // sparse, mostly disjoint
      (lcgPairs(9, 200, 15), lcgPairs(10, 7, 15)))    // pred >> truth
    grids.zipWithIndex.foreach { case ((p, t), g) =>
      def canon(xs: Seq[(Long, Long)]) = xs
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val (cp, ct) = (canon(p), canon(t))
      val hit = cp.intersect(ct).size
      val prec = if (cp.isEmpty) 0.0 else hit.toDouble / cp.size
      val rec = if (ct.isEmpty) 0.0 else hit.toDouble / ct.size
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      val got = Dedup.pairMetrics(
          if (p.isEmpty) Seq((0L, 0L)).toDF("id_a", "id_b").filter(lit(false))
          else p.toDF("id_a", "id_b"),
          if (t.isEmpty) Seq((0L, 0L)).toDF("id_a", "id_b").filter(lit(false))
          else t.toDF("id_a", "id_b"),
          "id_a", "id_b")
        .as[(Long, Long, Long, Double, Double, Double)].head()
      assert(got == ((ct.size.toLong, cp.size.toLong, hit.toLong,
        r6(prec), r6(rec), r6(f1))), s"grid $g: $got")
    }
  }

  test("property: chatTurns round-trips every serialized transcript exactly") {
    // seeded generator over the parser's WHOLE input space (minus the
    // documented ambiguity: a continuation line that itself looks like a
    // `role:` header is indistinguishable from a header by construction,
    // so generated content lines never start with a role word + colon):
    // 0-3 preamble lines, 1-8 turns with cycling/random roles, 0-3
    // continuation lines per turn, empty contents, random casing and
    // spacing around the header colon
    val rnd = new scala.util.Random(1234)
    val roles = Seq("system", "user", "assistant")
    def contentLine(): String =
      (0 until rnd.nextInt(6)).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
    val cases = (0 until 40).map { docId =>
      val preamble = (0 until rnd.nextInt(3)).map(_ => "pre " + contentLine())
      val turns = (0 until 1 + rnd.nextInt(8)).map { _ =>
        val role = roles(rnd.nextInt(3))
        val header = (if (rnd.nextBoolean()) role.toUpperCase else role) +
          (" " * rnd.nextInt(2)) + ":" + (" " * rnd.nextInt(2))
        val first = contentLine()
        val cont = (0 until rnd.nextInt(3)).map(_ => contentLine())
        (role, header, (first +: cont))
      }
      val text = (preamble ++ turns.flatMap { case (_, h, ls) =>
        (h + ls.head) +: ls.tail }).mkString("\n")
      val expected =
        (if (preamble.nonEmpty)
          Seq(("unknown", preamble.mkString("\n"))) else Nil) ++
        turns.map { case (r, _, ls) => (r, ls.mkString("\n")) }
      (docId.toLong, text, expected)
    }.filter(_._2.nonEmpty)
    val parsed = graft.ops.TextAnalysis.chatTurns(
        cases.map(c => (c._1, c._2)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select($"doc_id", $"turn_idx", $"role", $"content")
      .as[(Long, Long, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq)
      .toMap
    cases.foreach { case (id, _, expected) =>
      assert(parsed(id) == expected, s"doc $id:\n got ${parsed(id)}\n exp $expected")
    }
  }
}
