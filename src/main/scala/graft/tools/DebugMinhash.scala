package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Dev scratch: stage-by-stage timing of the MinHash LSH pipeline. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = TextAnalysis.tokens(col("text"))
    val corpus = docs.unionByName(docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", concat_ws(" ", slice(toks, lit(1), (size(toks) * 0.8).cast("int")))))

    time("corpus.count")(corpus.count())
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 32)
    time("signatures.count")(sigs.count())
    val buckets = sigs.select(col("id"), explode(Dedup.lshBandHashes(col("sig"), 32, 8)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    time("buckets.count")(buckets.count())
    val a = buckets.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    time("cand.count")(cand.count())
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 32, 8, 0.4)
    time("pairs.count")(pairs.count())
    spark.stop()
  }
}
