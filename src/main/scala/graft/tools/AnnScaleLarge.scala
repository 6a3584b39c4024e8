package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{IVF, PQ}

/** Third point on the ANN scale curve — the partitioned-PQ path alone
  * at large n (default 8M vectors, dim 32). The full [[AnnScaleSmoke]]
  * deliberately carries O(n·q) exact baselines (brute, ADC full-scan)
  * that saturate an 8-core host well before this n; the 100×-scale
  * question for the curve's next point is about the SCALE paths only —
  * coarse assign, PQ encode, the partitioned code index, and probe-
  * pruned IVFADC — so this tool runs exactly those, with the in-memory
  * IVFADC as the comparator the 2M point also measured.
  *
  *   runMain graft.tools.AnnScaleLarge [n]
  *
  * Curve so far (8 cores, quiet host): PQ encode 0.46s @500k → 1.70s
  * @2M; IVFADC batch 2.29 → 7.99; partitioned-IVFADC 2.72 → 10.34.
  * Linear (≈4× per 4× data) through this tool's n would extend the
  * no-super-linear-stage evidence one more order of magnitude. */
object AnnScaleLarge {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val dim = 32
    val nq = 200
    val spark = graft.GraftSession.local(cores = 8)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ann-large] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    val corpus = spark.range(0, n, 1, 64)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(997)).cast("double") - 498.0) / 498.0)
          .as("embedding"))
      .persist()
    time(s"corpus materialize ($n x $dim)")(corpus.count())
    val queries = corpus.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    // 1% sample at this n keeps trainer input ~80k rows (the 4% of the
    // 2M run) — trainer cost should stay FLAT on the curve, not grow
    val model = time("IVF train nc=256 (iters=2, 1% sample)")(
      IVF.train(corpus.filter(col("vec_id") % 100 === 0), "vec_id",
        "embedding", nc = 256, iters = 2))
    val assigned = IVF.assign(corpus, "embedding", model).persist()
    time(s"IVF assign nc=256 (full $n corpus)")(assigned.count())

    val pqModel = time("PQ train (m=8, ks=64, iters=2, 1% sample)")(
      PQ.train(corpus.filter(col("vec_id") % 100 === 0), "vec_id",
        "embedding", m = 8, ks = 64, iters = 2))
    val pqCodes = PQ.encode(assigned, "embedding", pqModel)
      .select(col("vec_id"), col("centroid_id"), col("pq_code")).persist()
    time(s"PQ encode (full $n corpus)")(pqCodes.count())
    corpus.unpersist(); assigned.unpersist()

    time(s"IVFADC batch in-memory ($nq queries, nprobe=4)")(
      PQ.searchIvfAdc(pqCodes, queries, "vec_id", "query_id", model,
        pqModel, k = 10, nprobe = 4).count())

    val pqIdx = System.getProperty("java.io.tmpdir") +
      s"/graft_pq_large_p${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(pqIdx))
    time("PQ writeIndexPartitioned (by centroid_id)")(
      IVF.writeIndexPartitioned(pqCodes, pqIdx))
    // clustered (topic-coherent) batch: the probe union covers a few
    // lists, so the partitioned scan opens only those directories —
    // the workload where the file layout pays
    val base = pqCodes.sparkSession.range(1)
    val baseVec = queries.filter(col("query_id") === 0)
      .select(col("qvec").as("v"))
    val clustered = spark.range(nq).crossJoin(baseVec)
      .select(col("id").as("query_id"),
        transform(col("v"), (x, i) =>
          x * (lit(1.0) +
            (pmod(xxhash64(col("id"), i), lit(3)).cast("double") - 1.0) * 0.02))
          .as("qvec"))
      .persist()
    clustered.count()
    for (rep <- 1 to 2)
      time(s"IVFADC partitioned (clustered $nq, nprobe=4) rep$rep")(
        PQ.searchIvfAdcPartitioned(spark, pqIdx, clustered, "vec_id",
          "query_id", model, pqModel, k = 10, nprobe = 4).count())
    for (rep <- 1 to 2)
      time(s"IVFADC in-memory (clustered $nq, nprobe=4) rep$rep")(
        PQ.searchIvfAdc(pqCodes, clustered, "vec_id", "query_id", model,
          pqModel, k = 10, nprobe = 4).count())
    pqCodes.unpersist()
    val _ = base
    spark.stop()
  }
}
