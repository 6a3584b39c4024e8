package graft.tools

import org.apache.spark.sql.functions._

/** PageRank at iteration-loop scale: a formula graph (3 coprime-stride
  * out-edges per node) large enough that the per-round join+aggregate
  * dominates — evidence the Pregel-lite loop holds when edges stop
  * fitting a single task. Run: `sbt "runMain graft.tools.GraphScaleSmoke
  * 2000000"`. */
object GraphScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = graft.GraftSession.local(cores = 8)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graph-scale] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    val nodes = spark.range(0, n, 1, 32).select(col("id").as("src"))
    val edges = nodes
      .select(col("src"), ((col("src") * 7 + 3) % n).as("dst"))
      .unionByName(nodes.select(col("src"), ((col("src") * 13 + 5) % n).as("dst")))
      .unionByName(nodes.select(col("src"), ((col("src") * 31 + 11) % n).as("dst")))
    val r = time(s"pageRank ($n nodes, ${3 * n} edges, 5 iters)")(
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 5)
        .agg(sum("rank").as("mass"), max("rank").as("max_rank")).head())
    println(s"[graph-scale] mass=${r.getDouble(0)} max=${r.getDouble(1)}")
    // r9: the long-chain regime checkpointEvery exists for — 25 rounds
    // with mid-loop lineage truncation every 10; without it the analyzer
    // cost of the ~50-operator chain dwarfs the actual compute
    val r25 = time(s"pageRank ($n nodes, 25 iters, checkpointEvery=10)")(
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 25)
        .agg(sum("rank").as("mass"), max("rank").as("max_rank")).head())
    println(s"[graph-scale] 25-iter mass=${r25.getDouble(0)} max=${r25.getDouble(1)}")
    spark.stop()
  }
}
