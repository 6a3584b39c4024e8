package graft.ops
import org.apache.spark.sql.functions._
/** Dev probe: per-stage attribution of weightedJaccardPairs on the
  * DedupScaleSmoke zipf fixture. */
object IcwsProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.GraftSession.local(cores = 8)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[icws-prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    def zipfText(idCol: org.apache.spark.sql.Column, mutateTail: Boolean) =
      concat_ws(" ", (0 until 40).map { p =>
        val h = xxhash64(lit(if (mutateTail && p >= 32) 13 else 12), idCol, lit(p))
        val h2 = xxhash64(lit(99), idCol, lit(p))
        concat(lit("z"), pmod(h, pmod(h2, lit(999983)) + 1).cast("string"))
      }: _*)
    val corpus = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"), zipfText(col("id"), false).as("text"))
      .unionByName(spark.range(0, 5000, 1, 8)
        .select((col("id") + 10000000L).as("doc_id"), zipfText(col("id"), true).as("text")))
      .persist()
    corpus.count()
    val ztf = corpus.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w")).persist()
    time("tf materialize")(ztf.count())
    val bk = time("icwsBuckets (k=8, hashed)")(
      { val b = Dedup.icwsBuckets(ztf, "doc_id", "tok", "w", 8, hashed = true).persist(); b.count(); b })
    val szs = bk.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("c"))
    println("[icws-prof] bucket size histo: " + szs.groupBy(
      when(col("c") === 1, "1").when(col("c") <= 8, "2-8")
        .when(col("c") <= 64, "9-64").when(col("c") <= 256, "65-256")
        .otherwise(">256").as("sz")).agg(count(lit(1)), sum(col("c")))
      .collect().mkString(" "))
    val cand = time("bucketCandidates")({
      val c = Dedup.bucketCandidates(bk, 256).persist(); println(s"[icws-prof] candidates=${c.count()}"); c })
    time("FULL op (k=24, rowsPerBand=2)") {
      val d = Dedup.weightedJaccardPairs(ztf, "doc_id", "tok", "w",
        k = 24, threshold = 0.6, hashed = true, rowsPerBand = 2)
      println(s"[icws-prof] banded verified pairs=${d.count()} " +
        s"planted=${d.filter(col("id_b") === col("id_a") + 10000000L).count()}")
    }
    time("verify (exact weighted jaccard)") {
      val tf2 = ztf.select(col("doc_id").as("__tid"), col("tok").as("__d"), col("w").cast("long").as("__w"))
      val pairs = Skew.repartitionForPairCompute(cand, col("id_a"))
      val wa = pairs.join(tf2.select(col("__tid").as("id_a"), col("__d"), col("__w").as("__wa")), Seq("id_a"))
      val wb = pairs.join(tf2.select(col("__tid").as("id_b"), col("__d"), col("__w").as("__wb")), Seq("id_b"))
      val out = wa.join(wb, Seq("id_a", "id_b", "__d"), "full")
        .na.fill(0L, Seq("__wa", "__wb"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("__wa"), col("__wb"))).as("mn"),
          sum(greatest(col("__wa"), col("__wb"))).as("mx"))
        .filter(round(col("mn").cast("double") / col("mx"), 6) >= 0.6)
      println(s"[icws-prof] verified pairs=${out.count()}")
    }
    spark.stop()
  }
}
