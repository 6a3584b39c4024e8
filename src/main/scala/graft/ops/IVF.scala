package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: k-means-partition the
  * corpus into `nc` lists, search only the `nprobe` lists nearest the
  * query. The centroid set is tiny driver state (nc x dim doubles — the
  * same shape every production IVF keeps), so:
  *  - training iterations broadcast centroids as literals and compute
  *    assignments with the native [[graft.functions.CosineSimilarity]]
  *    expression — one codegen'd pass per iteration, no joins;
  *  - the corpus is assigned once (a narrow column), and a search prunes to
  *    `nprobe` lists before exact re-ranking — the at-scale path when the
  *    corpus stops being scannable per query. Partitioning/bucketing the
  *    stored corpus by `centroid_id` turns that pruning into file skipping.
  *
  * Deterministic: initial centroids are the `nc` lowest-id vectors and
  * Lloyd's iterations are fixed-count (`iters`), so results are stable
  * across runs and engines.
  */
object IVF {

  final case class Model(centroids: Array[Array[Double]]) {
    def nc: Int = centroids.length
  }

  private def toDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  private def cosineToLit(vec: Column, c: Array[Double]): Column =
    graft.functions.VectorFunctions.cosine_sim(vec,
      array(c.map(lit): _*))

  /** Nearest-centroid id for a vector column given literal centroids. */
  private def assignExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosineToLit(vec, c).as("cos"), lit(i).as("cid"))
    }
    // array_max on struct orders lexicographically: best cosine, then
    // highest cid — deterministic tie-break
    array_max(array(scored: _*)).getField("cid")
  }

  /** Train `nc` centroids with `iters` Lloyd's iterations (cosine metric,
    * mean recombination). Collects only (nc x dim) doubles per iteration. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      nc: Int = 16, iters: Int = 5): Model = {
    // one projected+persisted copy of the training vectors: every Lloyd's
    // iteration re-scans this narrow frame instead of re-reading (and
    // re-casting) the source — at corpus scale the input scan would
    // otherwise run iters+1 times
    val base = emb.select(col(idCol).as("__ivf_id"), toDouble(col(vecCol)).as("v"))
      .persist()
    var centroids: Array[Array[Double]] = base
      .orderBy(col("__ivf_id")).limit(nc)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = base.select(col("v"),
        assignExpr(col("v"), centroids).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
      it += 1
    }
    base.unpersist()
    Model(centroids)
  }

  /** Corpus assignment: adds `centroid_id` (partition/bucket by it when
    * persisting the index). */
  def assign(emb: DataFrame, vecCol: String, model: Model): DataFrame =
    emb.withColumn("centroid_id", assignExpr(toDouble(col(vecCol)), model.centroids))

  /** ANN search: probe the `nprobe` centroid lists nearest to the query,
    * exact cosine re-rank inside them. `assigned` is the [[assign]] output
    * (precomputed once per corpus, reused across queries). */
  def search(assigned: DataFrame, queryVec: DataFrame, idCol: String,
      vecCol: String, model: Model, k: Int, nprobe: Int = 4): DataFrame = {
    val q = queryVec.head().getSeq[Any](0).map(_.toString.toDouble).toArray
    val probeIds = model.centroids.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(q).map { case (a, b) => a * b }.sum
      val denom = math.sqrt(c.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum)
      (if (denom > 0) dot / denom else 0.0, i)
    }.sortBy(-_._1).take(nprobe).map(_._2).toSeq
    assigned.filter(col("centroid_id").isin(probeIds: _*))
      .crossJoin(broadcast(queryVec))
      .withColumn("cosine_sim",
        round(Similarity.cosine(col(vecCol), col("qvec")), 6))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .select(col(idCol), col("cosine_sim"))
      .limit(k)
  }

  /** Batched ANN search: a query FRAME (qidCol, qvec) probes its `nprobe`
    * nearest lists wholly inside the plan — per-query probe ids come from a
    * literal-centroid expression (sorted (cosine, cid) struct array, top
    * `nprobe` exploded), NOT a driver `head()` per query like [[search]].
    * The probe join equi-joins on `centroid_id`, so each query scores only
    * its probed lists (with the corpus bucketed/partitioned by
    * `centroid_id` that pruning is file skipping); per-query k-selection
    * runs on the bounded-heap [[graft.plans.TopK]] operator. Equals N
    * [[search]] calls (pinned by spec). */
  def searchBatch(assigned: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, model: Model, k: Int,
      nprobe: Int = 4): DataFrame = {
    // (cos, -cid) sort key ascending, reversed -> cosine desc with cid-asc
    // tie-break: the same order sortBy(-cos) yields in [[search]]
    val scoredCentroids = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(cosineToLit(toDouble(col("qvec")), c).as("cos"),
        lit(-i).as("negcid"))
    }: _*)
    val probes = slice(reverse(array_sort(scoredCentroids)), 1, nprobe)
    val q = queries
      .withColumn("__probe", explode(probes)) // generators must be top-level
      .withColumn("centroid_id", -col("__probe").getField("negcid"))
      .select(col(qidCol), col("qvec"), col("centroid_id"))
    val scored = assigned.join(q, Seq("centroid_id"))
      .withColumn("cosine_sim",
        round(Similarity.cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    Similarity.topKPerQuery(scored, qidCol, idCol, k, queries)
  }
}
