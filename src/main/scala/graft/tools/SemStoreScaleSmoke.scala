package graft.tools

import org.apache.spark.sql.functions._

/** SemDedupStore at scale: a 300k-vector store (nc=256), then a 2%
  * shard ingested incrementally vs the full-union batch re-dedup a
  * store-less pipeline would have to run — the [[DedupScaleSmoke]]
  * incremental-vs-full argument replayed for the semantic path. The
  * ingest pays shard-internal + shard×prior cosines in the touched
  * clusters; the rebuild pays EVERY in-cluster pair of the union again
  * (~(n/nc)²·nc/2), which is where the ~an-order-of-magnitude gap
  * comes from and why it widens linearly with history. Batch-vs-store
  * flag totals are checked equal at the end (the x157 contract at
  * smoke scale).
  *
  *   runMain graft.tools.SemStoreScaleSmoke [n]
  */
object SemStoreScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val dim = 32
    val spark = graft.GraftSession.local(cores = 8)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[semstore-scale] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    def vecs(ids: org.apache.spark.sql.DataFrame, salt: Int) =
      ids.select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(lit(salt), col("id"), i), lit(997))
            .cast("double") - 498.0) / 498.0).as("v"))

    val corpus = vecs(spark.range(0, n, 1, 32).toDF("id"), 7).persist()
    time(s"corpus materialize ($n x $dim)")(corpus.count())
    // centroids: 256 corpus vectors — spread enough on a hash corpus
    val cents = corpus.filter(col("vec_id") < 256)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    val root = System.getProperty("java.io.tmpdir") +
      s"/graft_semstore_smoke_p${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))

    time(s"buildStore ($n vectors, nc=256)")(
      graft.ops.SemDedupStore.buildStore(corpus, "vec_id", "v",
        cents, "cid", "cv", 0.95, root, "base").count())

    // 2% fresh shard + 1k planted near-dups of corpus vectors (tiny
    // elementwise perturbation keeps cosine ~0.9996 >> 0.95)
    val fresh = vecs(spark.range(n, n + n / 50, 1, 8).toDF("id"), 11)
    val planted = corpus.filter(col("vec_id") < 1000)
      .select((col("vec_id") + 20000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x * (lit(1.0) + (pmod(xxhash64(col("vec_id"), i), lit(3))
            .cast("double") - 1.0) * 0.01)).as("v"))
    val shard = fresh.unionByName(planted).persist()
    shard.count()

    // force INSIDE every timed block — addShard writes eagerly but the
    // returned state frame (and batch semanticDedup below) is lazy; an
    // outside agg would charge the whole computation to the readout line
    val storeDups = time(s"addShard (${n / 50 + 1000} rows)")(
      graft.ops.SemDedupStore.addShard(spark, root, shard,
        "vec_id", "v", "s1").agg(
        sum(when(col("is_dup"), 1).otherwise(0)),
        sum(when(col("kept"), 0).otherwise(1))).head())
    println(s"[semstore-scale] store: is_dup=${storeDups.getLong(0)} " +
      s"removed=${storeDups.getLong(1)}")

    val batchDups = time("vs full batch semanticDedup (union)")(
      graft.ops.Dedup.semanticDedup(corpus.unionByName(shard),
        "vec_id", "v", cents, "cid", "cv", 0.95).agg(
        sum(when(col("is_dup"), 1).otherwise(0)),
        sum(when(col("kept"), 0).otherwise(1))).head())
    println(s"[semstore-scale] batch: is_dup=${batchDups.getLong(0)} " +
      s"removed=${batchDups.getLong(1)}")
    println(s"[semstore-scale] store==batch flag totals: " +
      s"${storeDups == batchDups}")

    // r16: the compaction leg — global mode rewrites base+shard (the
    // cost tiering avoids on the accumulated base) and the state must
    // read back identical
    val compacted = time("compactShards (global)")(
      graft.ops.SemDedupStore.compactShards(spark, root))
    println(s"[semstore-scale] compacted assign ${compacted._1._1} -> " +
      s"${compacted._1._2}, flags ${compacted._2._1} -> ${compacted._2._2}")
    val postDups = graft.ops.SemDedupStore.currentState(spark, root).agg(
      sum(when(col("is_dup"), 1).otherwise(0)),
      sum(when(col("kept"), 0).otherwise(1))).head()
    require(postDups == storeDups,
      s"post-compaction state drifted: $postDups vs $storeDups")
    println("[semstore-scale] post-compaction state identical")
    spark.stop()
  }
}
