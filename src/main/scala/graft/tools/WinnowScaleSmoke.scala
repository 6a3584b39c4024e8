package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Winnow-JOIN-at-scale probe: the r12 evidence pinned the 1M-doc
  * map-only fingerprint point but not the join paths built on it. This
  * measures [[graft.ops.Dedup.winnowOverlapPairs]] (df-capped
  * fingerprint self-join) and [[graft.ops.Dedup.winnowContamination]]
  * (small broadcast bench side) on an n-doc zipf word-soup corpus
  * (near-unique tokens — the open-vocabulary operating regime) with 5k
  * planted partial copies sharing their first 32 of 40 tokens (a ~200
  * shared leading chars span, far past the k+w−1 = 19 guarantee) and a
  * 2k-doc bench side sliced out of corpus texts (the x166 fixture shape
  * at 2000× the bench size). xxhash64 production family throughout.
  * Run at two sizes (e.g. 250000 and 1000000) to read the scaling
  * exponent per stage. */
object WinnowScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.local(cores = 4)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[winnow-scale] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    // the DedupScaleSmoke zipf generator: w = h mod (h2 mod 999983 + 1)
    // gives every doc several near-unique tokens (real text's long
    // tail), so fingerprints are near-unique outside planted overlaps
    def zipfText(idCol: org.apache.spark.sql.Column, mutateTail: Boolean) =
      concat_ws(" ", (0 until 40).map { p =>
        val h = xxhash64(lit(if (mutateTail && p >= 32) 13 else 12),
          idCol, lit(p))
        val h2 = xxhash64(lit(99), idCol, lit(p))
        concat(lit("z"),
          pmod(h, pmod(h2, lit(999983)) + 1).cast("string"))
      }: _*)

    val base = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"), zipfText(col("id"), mutateTail = false).as("text"))
    val dups = spark.range(0, 5000, 1, 8)
      .select((col("id") + 10000000L).as("doc_id"),
        zipfText(col("id"), mutateTail = true).as("text"))
    // materialize as parquet first (the DedupScaleSmoke rationale: time
    // operators over files, not over re-generation of a computed column)
    val path = System.getProperty("java.io.tmpdir") +
      s"/graft_winnow_smoke_p${ProcessHandle.current().pid()}"
    base.unionByName(dups).write.mode("overwrite").parquet(path)
    val corpus = spark.read.parquet(path)
    time(s"corpus count (${n + 5000})")(corpus.count())

    val (fps, nFps) = time("fingerprints (k=16, w=4)") {
      val f = Dedup.winnowFingerprints(corpus, "doc_id", "text").persist()
      (f, f.count())
    }
    println(s"[winnow-scale] fingerprint rows=$nFps")

    val (op, nOp) = time("overlap pairs (maxDf=64, minShared=3)") {
      val d = Dedup.winnowOverlapPairs(fps, maxDf = 64, minShared = 3)
        .persist()
      (d, d.count())
    }
    val planted = op.filter(col("id_b") === col("id_a") + 10000000L).count()
    println(s"[winnow-scale] overlap pairs=$nOp planted=$planted/5000")
    fps.unpersist(); op.unpersist()

    val bench = corpus.filter(col("doc_id") < 2000)
      .select(col("doc_id").as("bench_id"),
        substring(col("text"), 40, 160).as("text"))
    val (ct, nCt) = time("contamination (2k bench, minShared=3)") {
      val d = Dedup.winnowContamination(corpus, "doc_id", "text",
        bench, "bench_id", "text").persist()
      (d, d.count())
    }
    val selfHits = ct.filter(col("doc_id") === col("bench_id")).count()
    println(s"[winnow-scale] contamination rows=$nCt self-hits=$selfHits/2000")

    graft.bench.StageTimers.drain().toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"[winnow-scale]   stage $k%-32s $v%8.2fs")
    }
    spark.stop()
  }
}
