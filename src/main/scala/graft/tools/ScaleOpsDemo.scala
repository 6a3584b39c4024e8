package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

import graft.functions.VectorFunctions
import graft.ops.Skew
import graft.sinks.Sinks

/** CLI drive of the scale utilities: native vector expression over real
  * embeddings, salted join equivalence, bucketed no-shuffle join. */
object ScaleOpsDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. native cosine over real embeddings, timed vs fold-based
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val crossed = emb.crossJoin(broadcast(q))
    // warm both paths once
    crossed.select(sum(VectorFunctions.cosine_sim($"embedding", $"qvec"))).head()
    crossed.select(sum(graft.ops.Similarity.cosineBuiltins($"embedding", $"qvec"))).head()
    val (nativeSum, tn) = time(crossed.select(
      sum(VectorFunctions.cosine_sim($"embedding", $"qvec"))).head().getDouble(0))
    val (foldSum, tf) = time(crossed.select(
      sum(graft.ops.Similarity.cosineBuiltins($"embedding", $"qvec"))).head().getDouble(0))
    println(f"[scale] native cosine sum=$nativeSum%.9f in $tn%.2fs; fold sum=$foldSum%.9f in $tf%.2fs; equal=${nativeSum == foldSum}")

    // 2. salted join == plain join on a skewed frame
    val fact = spark.range(0, 200000)
      .withColumn("key", when(col("id") % 10 === 0, "hot").otherwise(concat(lit("k"), col("id") % 100)))
    val dim = fact.select(col("key")).distinct().withColumn("label", upper(col("key")))
    val plain = fact.join(dim, Seq("key")).count()
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8).count()
    println(s"[scale] salted join rows=$salted plain=$plain equal=${salted == plain}")

    // 3. bucketed join: zero exchanges
    Sinks.writeBucketed(spark.range(0, 100000).withColumn("v", col("id") * 2).toDF(), "demo_bkt_a", Seq("id"), 8)
    Sinks.writeBucketed(spark.range(0, 100000).withColumn("w", col("id") * 3).toDF(), "demo_bkt_b", Seq("id"), 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("demo_bkt_a").join(spark.table("demo_bkt_b"), Seq("id"))
    val nEx = j.queryExecution.executedPlan.collect { case e: Exchange => e }.size
    println(s"[scale] bucketed join exchanges=$nEx rows=${j.count()}")
    spark.sql("DROP TABLE IF EXISTS demo_bkt_a")
    spark.sql("DROP TABLE IF EXISTS demo_bkt_b")
    spark.stop()
  }
}
