package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Detector-evaluation readout: precision/recall/F1 of the three
  * candidate generators — MinHash+LSH (x06), SimHash (x07), rare-n-gram
  * linking (x67) — against exact-Jaccard ground truth on ONE shared
  * fixture (the x06/x08 near-dup corpus: every doc_id < 50 cloned at
  * +10000 with an 80% token prefix). The QA yardstick
  * [[graft.ops.Dedup.pairMetrics]] promises: tune a detector's knobs
  * (bands/rows, hamming radius, df caps) here before a production run.
  *
  * Ground truth is COMPLETE at fixture scale: all pairs sharing >= 1
  * 3-gram (a pair with Jaccard >= 0.5 necessarily shares one) get exact
  * [[Dedup.ngramJaccard]]; threshold 0.5. The shared-gram prefilter is
  * quadratic per gram bucket, so this tool is for fixture-sized corpora
  * (sf0.01 and below) — production detectors are evaluated on planted
  * SAMPLES, not corpus-wide truth. */
object DetectorEval {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(cores = 8)
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = TextAnalysis.tokens(col("text"))
    val mutated = docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text",
        concat_ws(" ", slice(toks, lit(1), (size(toks) * 0.8).cast("int"))))
    val corpus = docs.unionByName(mutated)
      .select(col("doc_id"), col("text")).cache()

    // complete ground truth: shared-3-gram candidate pairs -> exact Jaccard
    val grams = corpus.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(TextAnalysis.tokens(col("text")), 3)))
        .as("g"))
    val cand = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val truth = Dedup.ngramJaccard(cand, corpus, "doc_id", "text", n = 3)
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b")).cache()
    println(s"[detector-eval] corpus=${corpus.count()} truth_pairs=${truth.count()}")

    def report(name: String, pred: org.apache.spark.sql.DataFrame): Unit = {
      val r = Dedup.pairMetrics(pred, truth, "id_a", "id_b")
        .as[(Long, Long, Long, Double, Double, Double)].head()
      println(f"[detector-eval] $name%-26s n_pred=${r._2}%5d hit=${r._3}%4d " +
        f"precision=${r._4}%6.4f recall=${r._5}%6.4f f1=${r._6}%6.4f")
    }

    // The P/R FRONTIER the yardstick was built for: one knob axis per
    // generator (bands at fixed k for minhash — more bands = smaller
    // rows-per-band = looser match; hamming radius for simhash; df cap
    // for rare-ngram), so a production run picks its operating point
    // from a table instead of re-tuning blind. The x06/x07/x67
    // production knob points are members of each grid.
    for ((k, bands) <- Seq((32, 4), (32, 8), (32, 16), (64, 8), (64, 16)))
      report(f"minhash-lsh k=$k%2d bands=$bands%-2d" +
          (if (k == 32 && bands == 8) " (x06)" else ""),
        Dedup.minhashLshPairs(corpus, "doc_id", "text",
          shingleW = 3, k = k, bands = bands, threshold = 0.4))
    for (h <- Seq(2, 4, 6))
      report(s"simhash maxHamming=$h" + (if (h == 6) " (x07)" else ""),
        Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = h))
    for (df <- Seq(4, 8, 16))
      report(s"rare-ngram maxDf=$df" + (if (df == 8) " (x67)" else ""),
        Dedup.rareNgramPairs(corpus, "doc_id", "text",
            n = 3, maxDf = df, minShared = 2)
          .select(col("id_a"), col("id_b")))
    spark.stop()
  }
}
