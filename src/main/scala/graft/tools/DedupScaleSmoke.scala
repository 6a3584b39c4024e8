package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Dedup-at-scale probe: 200k synthetic word-soup documents (distributed
  * generation, ~40 tokens each) with 5k planted near-duplicates, through
  * MinHash+LSH candidate generation and cluster resolution. Evidence that
  * the (band, bucket) shuffle shape and the explode+agg signature job hold
  * far beyond the harness corpus (40x sf0.1). */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.GraftSession.local(cores = 4)

    // deterministic word-soup: 40 words per doc drawn from a 5k-word vocab
    // by hashing (docid, position); near-dups: docs 0..4999 cloned with the
    // last 8 words re-rolled
    def text(idCol: org.apache.spark.sql.Column, salt: Int, mutateTail: Boolean) =
      concat_ws(" ", (0 until 40).map { p =>
        val h = xxhash64(lit(if (mutateTail && p >= 32) salt + 1 else salt),
          idCol, lit(p))
        concat(lit("w"), pmod(h, lit(5000)).cast("string"))
      }: _*)

    val base = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"), text(col("id"), 7, mutateTail = false).as("text"))
    val dups = spark.range(0, 5000, 1, 8)
      .select((col("id") + 10000000L).as("doc_id"),
        text(col("id"), 7, mutateTail = true).as("text"))
    val corpus = base.unionByName(dups)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dedup-scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    time(s"corpus count (${n + 5000})")(corpus.count())
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      shingleW = 3, k = 32, bands = 8, threshold = 0.5)
    val nPairs = time("minhash LSH pairs")(pairs.count())
    println(s"[dedup-scale] pairs=$nPairs (planted 5000)")
    val planted = pairs.filter(col("id_b") >= 10000000L &&
      col("id_a") === col("id_b") - 10000000L).count()
    println(s"[dedup-scale] planted recovered=$planted/5000")
    val survivors = time("cluster dedup")(
      Dedup.dedupByClusters(corpus, "doc_id", pairs).count())
    println(s"[dedup-scale] survivors=$survivors of ${n + 5000}")
    spark.stop()
  }
}
