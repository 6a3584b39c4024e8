package graft.tools

import org.apache.spark.sql.functions._

/** ICWS + prefix-filter Jaccard scale probe, standalone. The full
  * [[DedupScaleSmoke]] runs these as its last phase after ~6 min of
  * minhash/incremental stages; the r12 1M attempt died there when a
  * concurrent sbt compile replaced classfiles under the running JVM, so
  * this runner carries ONLY the zipf corpus + the two r12 pair
  * generators — cheap to re-run from a snapshotted classpath. Same
  * fixture as DedupScaleSmoke's zipf section: 1M-word Zipf-ish vocab
  * (near-unique tokens — the open-vocabulary operating regime both
  * operators document), 5k planted copies mutating the last 8 of 40
  * positions (set/weighted Jaccard ≈ 0.67 > the 0.6 threshold),
  * xxhash64 production family. Run at 250k and 1M to read the scaling
  * exponent per stage. */
object IcwsScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.local(cores = 4)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[icws-scale] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    def zipfText(idCol: org.apache.spark.sql.Column, mutateTail: Boolean) =
      concat_ws(" ", (0 until 40).map { p =>
        val h = xxhash64(lit(if (mutateTail && p >= 32) 13 else 12),
          idCol, lit(p))
        val h2 = xxhash64(lit(99), idCol, lit(p))
        concat(lit("z"),
          pmod(h, pmod(h2, lit(999983)) + 1).cast("string"))
      }: _*)

    val zbase = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"), zipfText(col("id"), mutateTail = false).as("text"))
    val zdups = spark.range(0, 5000, 1, 8)
      .select((col("id") + 10000000L).as("doc_id"),
        zipfText(col("id"), mutateTail = true).as("text"))
    val zPath = System.getProperty("java.io.tmpdir") +
      s"/graft_icws_smoke_p${ProcessHandle.current().pid()}"
    zbase.unionByName(zdups).write.mode("overwrite").parquet(zPath)
    val zCorpus = spark.read.parquet(zPath)
    time(s"zipf corpus count (${n + 5000})")(zCorpus.count())

    // prefix-jaccard IN REGIME: 5-gram shingles keep token df flat in N
    // (word-level df grows WITH the corpus on this fixture — the r13
    // finding; the raw-token call below demonstrates the guard). The
    // planted copies share their first 32 of 40 words = 28 of 36
    // shingles -> J = 28/44 = 0.636 >= 0.6.
    val toks = split(col("text"), " ")
    val shingled = zCorpus.select(col("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), size(toks) - 5),
        i => concat_ws("_", slice(toks, i + 1, lit(5))))).as("text"))
    val sPath = zPath + "_sh"
    shingled.write.mode("overwrite").parquet(sPath)
    val sCorpus = spark.read.parquet(sPath)
    time(s"shingled corpus count")(sCorpus.count())
    val (pj, nPj) = time("prefix-filter jaccard 5-gram (t=0.6)") {
      val d = graft.ops.Dedup.prefixFilterJaccardPairs(sCorpus, "doc_id",
        "text", 0.6).persist()
      (d, d.count())
    }
    val pjPlanted = pj.filter(col("id_b") === col("id_a") + 10000000L).count()
    println(s"[icws-scale] prefix-jaccard pairs=$nPj planted=$pjPlanted/5000")
    pj.unpersist()

    // the out-of-regime spelling refuses loudly instead of dying in the
    // verify join's spill (the r13 1M finding: 239M candidates, no
    // single hot bucket)
    time("raw-token guard (maxCandidates=50M)") {
      try {
        graft.ops.Dedup.prefixFilterJaccardPairs(zCorpus, "doc_id",
          "text", 0.6, maxCandidates = 50000000L).count()
        println("[icws-scale] raw-token call COMPLETED under the cap")
      } catch {
        case e: IllegalArgumentException =>
          println(s"[icws-scale] guard fired: ${e.getMessage.take(160)}")
      }
    }

    val ztf = zCorpus.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w"))
      .persist()
    val (wj, nWj) = time("ICWS weighted jaccard (t=0.6, k=24, r=2)") {
      val d = graft.ops.Dedup.weightedJaccardPairs(ztf, "doc_id", "tok",
        "w", k = 24, threshold = 0.6, hashed = true, rowsPerBand = 2)
        .persist()
      (d, d.count())
    }
    val wjPlanted = wj.filter(col("id_b") === col("id_a") + 10000000L).count()
    println(s"[icws-scale] icws pairs=$nWj planted=$wjPlanted/5000")

    graft.bench.StageTimers.drain().toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"[icws-scale]   stage $k%-32s $v%8.2fs")
    }
    spark.stop()
  }
}
