package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.PqFunctions

/** Product-quantization contracts: encode determinism (self-code on
  * codewords, lowest-code ties), ADC ≡ the exact sum of subspace
  * distances to the coded words, training distortion monotonicity,
  * ragged input, and codegen survival at the paper's ks=256. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val rnd = new scala.util.Random(7919L * (i + 1))
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    }

  private def plantedModel(rows: Seq[(Long, Seq[Double])], m: Int, ks: Int): PQ.Model = {
    val dim = rows.head._2.length
    val subDim = dim / m
    PQ.Model(Array.tabulate(m)(s => rows.take(ks).map(_._2
      .slice(s * subDim, (s + 1) * subDim).toArray).toArray))
  }

  test("encode maps each codeword-source vector to its own code in every subspace") {
    val rows = vecs(40, 16)
    val model = plantedModel(rows, m = 4, ks = 8)
    val df = rows.toDF("id", "v")
    val coded = PQ.encode(df, "v", model).filter(col("id") < 8)
      .select(col("id"), col("pq_code")).collect()
    coded.foreach { r =>
      val id = r.getLong(0).toInt
      assert(r.getSeq[Int](1) == Seq.fill(4)(id))
    }
  }

  test("encode ties resolve to the lowest code id") {
    // two identical codewords: code 1 duplicates code 0 -> argmin must pick 0
    val cw = Array(0.5, -0.25)
    val model = PQ.Model(Array(Array(cw, cw.clone(), Array(9.0, 9.0))))
    val df = Seq((1L, Seq(0.5, -0.25))).toDF("id", "v")
    val code = PQ.encode(df, "v", model).select(col("pq_code")).head().getSeq[Int](0)
    assert(code == Seq(0))
  }

  test("ADC distance equals the sum of exact subspace distances to the coded words") {
    val rows = vecs(60, 16)
    val model = plantedModel(rows, m = 4, ks = 8)
    val df = rows.toDF("id", "v")
    val coded = PQ.encode(df, "v", model)
    val q = rows(3)._2
    val got = PQ.searchAdc(coded, Seq((0L, q)).toDF("qid", "qvec"),
      "id", "qid", model, 60).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap

    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { case (id, v) =>
      val codes = (0 until 4).map { s =>
        val sv = v.slice(s * 4, s * 4 + 4)
        model.codebooks(s).zipWithIndex.minBy { case (c, j) => (sq(sv, c.toSeq), j) }._2
      }
      val expected = (0 until 4).map(s =>
        sq(q.slice(s * 4, s * 4 + 4), model.codebooks(s)(codes(s)).toSeq)).sum
      assert(math.abs(got(id) - expected) < 1e-5, s"id=$id")
    }
  }

  test("searchAdc orders ascending by distance with id tiebreak and respects k") {
    val rows = vecs(50, 16)
    val model = plantedModel(rows, m = 4, ks = 8)
    val coded = PQ.encode(rows.toDF("id", "v"), "v", model)
    val all = PQ.searchAdc(coded, Seq((7L, rows(5)._2)).toDF("qid", "qvec"),
      "id", "qid", model, 50).collect()
      .map(r => (r.getDouble(2), r.getLong(1))).sorted
    val out = PQ.searchAdc(coded, Seq((7L, rows(5)._2)).toDF("qid", "qvec"),
      "id", "qid", model, 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(0) == 7L))
    // the selected set IS the k smallest by (dist, id) — rows come off the
    // bounded heap unordered; callers add the final orderBy (x115 does)
    val got = out.map(r => (r.getDouble(2), r.getLong(1))).sorted
    assert(got.toSeq == all.take(10).toSeq)
  }

  test("train distortion is non-increasing over Lloyd's iterations") {
    val rows = vecs(120, 16)
    val df = rows.toDF("id", "v")
    def meanDistortion(iters: Int): Double = {
      val model = PQ.train(df, "id", "v", m = 4, ks = 8, iters = iters)
      df.select(avg(PQ.distortionExpr(col("v"), model))).head().getDouble(0)
    }
    val d0 = meanDistortion(0)
    val d2 = meanDistortion(2)
    val d5 = meanDistortion(5)
    assert(d2 <= d0 + 1e-9)
    assert(d5 <= d2 + 1e-9)
  }

  test("ragged input truncates subspace loops instead of failing") {
    val model = PQ.Model(Array(
      Array(Array(1.0, 1.0), Array(0.0, 0.0)),
      Array(Array(2.0, 2.0), Array(5.0, 5.0))))
    // 3 elements for subDim=2, m=2: second subspace sees only element 3
    val df = Seq((1L, Seq(0.1, 0.1, 2.0))).toDF("id", "v")
    val code = PQ.encode(df, "v", model).select(col("pq_code")).head().getSeq[Int](0)
    assert(code == Seq(1, 0)) // sub0: nearer (0,0); sub1: |2-2| < |2-5|
  }

  test("train rejects ragged input at training time") {
    // a short vector would otherwise yield a (sub, code) codeword with
    // fewer than subDim positions and fail much later in Model.flat
    val df = Seq((1L, Seq(0.1, 0.2, 0.3, 0.4)), (2L, Seq(0.5, 0.6))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      PQ.train(df, "id", "v", m = 2, ks = 1, iters = 1)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("pq_adc_dist raises on a lut/ks shape mismatch instead of zeroing") {
    val codes = Seq((1L, Seq(0, 1))).toDF("id", "pq_code")
    // lut of length 4 = 2 subs * ks=2 is fine; claiming ks=3 must raise
    val lutOk = typedLit(Seq(1.0, 2.0, 3.0, 4.0))
    assert(codes.select(graft.functions.PqFunctions
      .pq_adc_dist(col("pq_code"), lutOk, 2).as("d")).head().getDouble(0) == 1.0 + 4.0)
    val e = intercept[Exception] {
      codes.select(graft.functions.PqFunctions
        .pq_adc_dist(col("pq_code"), lutOk, 3).as("d")).head()
    }
    assert(e.getMessage.contains("pq_adc_dist") ||
      Option(e.getCause).exists(_.getMessage.contains("pq_adc_dist")))
  }

  test("float input columns encode identically to double") {
    val rows = vecs(20, 16)
    val model = plantedModel(rows, m = 4, ks = 8)
    val d = PQ.encode(rows.toDF("id", "v"), "v", model)
      .select(col("id"), col("pq_code"))
    val f = PQ.encode(rows.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("id", "v"), "v", model)
      .select(col("id"), col("pq_code"))
    assert(d.except(f).isEmpty && f.except(d).isEmpty)
  }

  test("searchIvfAdc: probing every list equals plain ADC; nprobe=1 stays in the top list") {
    val rows = vecs(80, 16)
    val pq = plantedModel(rows, m = 4, ks = 8)
    val coarse = IVF.Model(rows.take(4).map(_._2.toArray).toArray)
    val df = rows.toDF("id", "v")
    val codes = PQ.encode(IVF.assign(df, "v", coarse), "v", pq)
      .select(col("id"), col("centroid_id"), col("pq_code"))
    val q = Seq((0L, rows(9)._2)).toDF("qid", "qvec")
    def key(r: org.apache.spark.sql.Row) = (r.getDouble(2), r.getLong(1))
    val full = PQ.searchIvfAdc(codes, q, "id", "qid", coarse, pq,
      k = 15, nprobe = 4).collect().map(key).sorted
    val plain = PQ.searchAdc(codes.select(col("id"), col("pq_code")), q,
      "id", "qid", pq, 15).collect().map(key).sorted
    assert(full.toSeq == plain.toSeq)
    // nprobe=1: every hit comes from the query's own nearest list
    val assignedMap = codes.select(col("id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topList = IVF.assign(q.select(col("qvec").as("v")), "v", coarse)
      .select(col("centroid_id")).head().getInt(0)
    val pruned = PQ.searchIvfAdc(codes, q, "id", "qid", coarse, pq,
      k = 15, nprobe = 1).collect()
    assert(pruned.nonEmpty)
    pruned.foreach(r => assert(assignedMap(r.getLong(1)) == topList))
  }

  test("searchAdcRerank at rerank=corpus-size equals exact brute force") {
    val rows = vecs(60, 16)
    val model = plantedModel(rows, m = 4, ks = 8)
    val df = rows.toDF("id", "v")
    val codes = PQ.encode(df, "v", model).select(col("id"), col("pq_code"))
    val queries = Seq((1L, rows(3)._2), (2L, rows(17)._2)).toDF("qid", "qvec")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val rr = PQ.searchAdcRerank(codes, df, queries, "id", "qid", "v",
      model, k = 10, rerank = 6).collect().map(key).sorted
    val brute = Similarity.bruteForceKnnBatch(df, queries, "id", "v",
      "qid", 10).collect().map(key).sorted
    assert(rr.toSeq == brute.toSeq)
    // a tight shortlist is still a subset of what ADC admits
    val tight = PQ.searchAdcRerank(codes, df, queries, "id", "qid", "v",
      model, k = 5, rerank = 2).collect()
    assert(tight.length == 10) // 5 per query
  }

  test("residual encode: centroid + codeword reconstructs to its own code; ADC matches hand math") {
    val rnd = new scala.util.Random(101)
    val m = 4; val sd = 4; val ks = 6; val dim = m * sd
    val coarse = IVF.Model(Array.fill(2)(Array.fill(dim)(rnd.nextDouble() * 10)))
    val cb = Array.fill(m)(Array.fill(ks)(Array.fill(sd)(rnd.nextDouble() - 0.5)))
    val model = PQ.Model(cb)
    // v = coarse[1] + (codeword 3 of every subspace) -> residual codes all 3
    val v = (0 until dim).map(i => coarse.centroids(1)(i) + cb(i / sd)(3)(i % sd))
    val df = Seq((1L, v)).toDF("id", "v")
      .withColumn("centroid_id", lit(1))
    val code = PQ.encodeResidual(df, "v", coarse, model)
      .select(col("pq_code")).head().getSeq[Int](0)
    assert(code == Seq.fill(m)(3), code)
    // residual ADC distance against a random query matches hand math
    val q = (0 until dim).map(_ => rnd.nextDouble() * 10)
    val codes = PQ.encodeResidual(df, "v", coarse, model)
      .select(col("id"), col("centroid_id"), col("pq_code"))
    val got = PQ.searchIvfAdcResidual(codes,
      Seq((0L, q)).toDF("qid", "qvec"), "id", "qid", coarse, model,
      k = 1, nprobe = 2).head().getDouble(2)
    val expected = (0 until m).map { s =>
      (0 until sd).map { d =>
        val r = (q(s * sd + d) - coarse.centroids(1)(s * sd + d)) - cb(s)(3)(d)
        r * r
      }.sum
    }.sum
    assert(math.abs(got - expected) < 1e-5, s"got $got expected $expected")
  }

  test("residual codebooks beat raw codebooks on clustered data at the same budget") {
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextDouble() * 20 - 10))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.indices.map(d => c(d) + (rnd.nextDouble() - 0.5) * 0.5).toSeq)
    }
    val df = rows.toDF("id", "v")
    val coarse = IVF.Model(centers)
    val assigned = IVF.assign(df, "v", coarse).persist()
    val rawModel = PQ.train(df, "id", "v", m = 4, ks = 4, iters = 3)
    val resModel = PQ.trainResidual(assigned, "id", "v", coarse,
      m = 4, ks = 4, iters = 3)
    val rawDist = df.select(avg(PQ.distortionExpr(col("v"), rawModel)))
      .head().getDouble(0)
    // residual distortion: ADC self-distance of the residual codes
    // against each row's own residual LUT
    import graft.functions.PqFunctions
    val resDist = assigned.select(avg(PqFunctions.pq_adc_dist(
        PqFunctions.pq_encode_residual(col("v"), col("centroid_id"),
          coarse.centroids, resModel.flat, 4, 4),
        PqFunctions.pq_lut_residual(col("v"), col("centroid_id"),
          coarse.centroids, resModel.flat, 4, 4), 4)))
      .head().getDouble(0)
    assigned.unpersist()
    assert(resDist < rawDist,
      s"residual $resDist must beat raw $rawDist on clustered data")
  }

  test("partitioned PQ code index: search equals in-memory and prunes to the probed directories") {
    val rows = vecs(120, 16)
    val pq = plantedModel(rows, m = 4, ks = 8)
    val coarse = IVF.Model(rows.take(6).map(_._2.toArray).toArray)
    val df = rows.toDF("id", "v")
    val codes = PQ.encode(IVF.assign(df, "v", coarse), "v", pq)
      .select(col("id"), col("centroid_id"), col("pq_code"))
    val dir = java.nio.file.Files.createTempDirectory("pq_part_idx").toString + "/idx"
    IVF.writeIndexPartitioned(codes, dir)
    val queries = Seq((0L, rows(9)._2), (1L, rows(44)._2)).toDF("qid", "qvec")
    val part = PQ.searchIvfAdcPartitioned(spark, dir, queries, "id", "qid",
      coarse, pq, k = 8, nprobe = 2)
    val plain = PQ.searchIvfAdc(codes, queries, "id", "qid", coarse, pq,
      k = 8, nprobe = 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(part.collect().map(key).toSet == plain.collect().map(key).toSet)
    // scale claims on the executed plan (final AQE section only — the
    // Initial Plan echo would double-count): probe prune = directory
    // skipping at the scan, query side broadcast, index side never
    // shuffles beyond the one top-k exchange
    val plan = part.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(plan).isDefined,
      plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(800))
  }

  test("whole-stage codegen survives ks=256 (the Janino 64KB regime)") {
    val rows = vecs(300, 16)
    val dim = 16; val m = 4; val ks = 256; val subDim = dim / m
    val rnd = new scala.util.Random(42)
    val model = PQ.Model(Array.fill(m)(Array.fill(ks)(
      Array.fill(subDim)(rnd.nextDouble()))))
    // repartition keeps the local relation from folding to a
    // LocalTableScan; count() first so AQE finalizes the executed plan
    val coded = PQ.encode(rows.toDF("id", "v").repartition(2), "v", model)
      .withColumn("d", PqFunctions.pq_adc_dist(col("pq_code"),
        PqFunctions.pq_lut(col("v"), model.flat, m, ks), ks))
    val out = coded.collect() // force execution so AQE finalizes the plan
    assert(out.length == 300)
    // AQE's final-plan format prints codegen stages as `*(n)` prefixes
    val plan = coded.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      "\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"no codegen span:\n$plan")
    // every adc self-distance (= distortion) is finite and non-negative
    val bad = coded.filter(col("d") < 0 || isnan(col("d"))).count()
    assert(bad == 0)
  }
}
