package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PqFunctions, PqLayout}

/** Product quantization (Jegou et al., TPAMI 2011): compress each vector
  * into m small code ids (one per subspace) and answer nearest-neighbor
  * queries with asymmetric distance computation (ADC) — per query, one
  * m*ks lookup table of exact query-to-codeword distances; per corpus
  * row, m array reads. This is the path that keeps a 100 TB embedding
  * table searchable: the scan side carries m ints per vector instead of
  * the full float array (~32x smaller at m=8 over 64 float dims), the
  * scoring loop is memory-bound array indexing inside whole-stage
  * codegen, and the LUT rides the broadcast side of the join so the
  * corpus never shuffles.
  *
  * Complements the existing retrieval stack: [[Similarity.quantizeInt8]]
  * shrinks bytes 4x but still scans full-dimension vectors;
  * [[IVF]] prunes WHICH rows are scanned; PQ shrinks WHAT each scanned
  * row costs. Production composes IVF (prune) + PQ (cheap scan) + exact
  * re-rank on the short list ([[Similarity.knnQuantizedRerank]]'s
  * pattern).
  *
  * Reference behavior target: the banking ETL reference has no vector
  * ops at all (its scope ends at SQL aggregates); this module is part of
  * the training-data-pipeline extension surface the build mandates.
  *
  * Determinism contract (oracle-replayable end to end): squared-L2
  * subspace metric, encode ties to the LOWEST code id, ADC sums lut
  * entries in subspace order, distances rounded 6dp in query output,
  * final order (adc_dist asc, id asc).
  */
object PQ {

  /** codebooks(sub)(code) = codeword vector of length subDim. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ks: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
    private[ops] lazy val flat: Array[Array[Double]] = PqLayout.flatten(codebooks)._1
  }

  private def toDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** PQ codes for `vecCol` as a new `pq_code` array<int> column — map-only,
    * one codegen'd m*ks loop per row, no shuffle. The expression reads
    * float or double elements natively — no `transform`-cast wrapper (a
    * higher-order function would drop the per-element loop to interpreted
    * dispatch on exactly the corpus-sized hot path). */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("pq_code",
      PqFunctions.pq_encode(col(vecCol), model.flat, model.m, model.ks))

  /** Quantization distortion of one vector under the model: squared L2
    * between the vector and its reconstruction, computed as
    * adc_dist(encode(x), lut(x)) — the m diagonal lut entries. */
  def distortionExpr(vec: Column, model: Model): Column =
    PqFunctions.pq_adc_dist(
      PqFunctions.pq_encode(vec, model.flat, model.m, model.ks),
      PqFunctions.pq_lut(vec, model.flat, model.m, model.ks), model.ks)

  /** Train per-subspace codebooks with `iters` Lloyd's iterations
    * (squared-L2 metric, mean recombination; empty clusters keep their
    * codeword — the [[IVF.train]] convention). Init = the first `ks`
    * vectors by `idCol`, sliced per subspace.
    *
    * Scale shape: ONE exploded (sub, subvector) frame is persisted —
    * same total bytes as the input vectors — and every iteration is one
    * scan of it: a per-row when-chain assignment (m single-subspace
    * encode loops, constant code size at any ks) into one
    * (sub, code, pos)-keyed mean aggregate; only the (m*ks x subDim)
    * codebook doubles ever reach the driver. At corpus scale, train on a
    * sample (the PQ paper trains on ~100k vectors) — pass the sampled
    * frame in; encode then runs over the full corpus. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ks: Int = 16, iters: Int = 5): Model = {
    require(m >= 1 && ks >= 1)
    val v = toDouble(col(vecCol))
    // One aggregate instead of head(): rejects ragged input at training
    // time. A short vector otherwise yields a (sub, code) mean with fewer
    // than subDim positions, and the failure only surfaces later in
    // Model.flat's flatten() — far from the cause.
    val lens = emb.agg(min(size(col(vecCol))).as("lo"),
      max(size(col(vecCol))).as("hi")).head()
    val dim = lens.getInt(0)
    require(dim == lens.getInt(1),
      s"ragged $vecCol: lengths span $dim..${lens.getInt(1)}; PQ training requires uniform dimension")
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    val base = emb.select(posexplode(array((0 until m).map(s =>
        slice(v, s * subDim + 1, subDim)): _*)).as(Seq("sub", "sv")))
      .persist()

    var codebooks: Array[Array[Array[Double]]] = {
      val seed = emb.orderBy(col(idCol)).limit(ks)
        .select(v.as("v")).collect()
        .map(_.getSeq[Double](0).toArray)
      require(seed.length == ks, s"need >= $ks training vectors, got ${seed.length}")
      Array.tabulate(m)(s => seed.map(_.slice(s * subDim, (s + 1) * subDim)))
    }

    var it = 0
    while (it < iters) {
      // per-row assignment: subspace s rows run s's single-subspace encode
      val codeExpr = (0 until m).map { s =>
        (col("sub") === s,
          element_at(PqFunctions.pq_encode(col("sv"), codebooks(s), 1, ks), 1))
      }.foldRight(lit(-1)) { case ((cond, value), acc) => when(cond, value).otherwise(acc) }
      val means = base.select(col("sub"), codeExpr.as("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x")).as("mean"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cw"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      codebooks = Array.tabulate(m)(s => Array.tabulate(ks)(j =>
        means.getOrElse((s, j), codebooks(s)(j))))
      it += 1
    }
    base.unpersist()
    Model(codebooks)
  }

  /** Batched ADC top-k: `codes` is the [[encode]] output (idCol, pq_code),
    * `queries` a bounded frame (qidCol, qvec). Each query computes its LUT
    * once on the broadcast side; the corpus side reads only the m-int code
    * column — no vector bytes move. k-selection per query runs on the
    * bounded-heap [[graft.plans.TopK]] operator (ascending distance, ties
    * by id). Output: (qidCol, idCol, adc_dist rounded 6dp). */
  def searchAdc(codes: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, model: Model, k: Int): DataFrame =
    searchAdcCounted(codes, queries, idCol, qidCol, model, k, queries.count())

  /** [[searchAdc]] with the query count already in hand — so callers
    * that also need the count ([[searchAdcRerank]]) launch the cheap
    * query-frame job exactly once. */
  private def searchAdcCounted(codes: DataFrame, queries: DataFrame,
      idCol: String, qidCol: String, model: Model, k: Int,
      nQ: Long): DataFrame = {
    val q = queries.withColumn("__lut",
      PqFunctions.pq_lut(col("qvec"), model.flat, model.m, model.ks))
    val scored = codes.crossJoin(broadcast(q))
      .withColumn("adc_dist",
        round(PqFunctions.pq_adc_dist(col("pq_code"), col("__lut"), model.ks), 6))
      .select(col(qidCol), col(idCol), col("adc_dist"))
    Similarity.selectTopK(scored, qidCol,
      Seq(("adc_dist", true), (idCol, true)), k, nQ)
  }

  /** IVFADC — the composed FAISS-style architecture: the IVF coarse
    * quantizer prunes WHICH lists are scanned ([[IVF.assign]]'s
    * `centroid_id`, cosine metric, the repo's coarse contract) and PQ
    * shrinks WHAT each scanned row costs (m code ints, ADC scoring).
    * `codes` is the [[IVF.assign]] + [[encode]] output
    * (idCol, centroid_id, pq_code); each query explodes to its `nprobe`
    * nearest lists via the native [[graft.functions.NearestCentroidIds]]
    * loop (cosine desc, cid-asc ties) and carries its LUT on the
    * broadcast side of one centroid_id equi-join — with the codes frame
    * partitioned/bucketed by `centroid_id` ([[IVF.writeIndexPartitioned]])
    * the probe is file skipping, and unprobed lists are never read.
    * Output: (qidCol, idCol, adc_dist 6dp), bounded-heap top-k per
    * query, ascending distance, ties by id. */
  def searchIvfAdc(codes: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, coarse: IVF.Model, model: Model, k: Int,
      nprobe: Int = 4): DataFrame = {
    val q = queries
      .withColumn("__lut",
        PqFunctions.pq_lut(col("qvec"), model.flat, model.m, model.ks))
      .withColumn("centroid_id",
        explode(graft.functions.VectorFunctions.nearest_centroid_ids(
          transform(col("qvec"), x => x.cast("double")),
          coarse.centroids, nprobe)))
      .select(col(qidCol), col("centroid_id"), col("__lut"))
    val scored = codes.join(broadcast(q), Seq("centroid_id"))
      .withColumn("adc_dist",
        round(PqFunctions.pq_adc_dist(col("pq_code"), col("__lut"), model.ks), 6))
      .select(col(qidCol), col(idCol), col("adc_dist"))
    Similarity.selectTopK(scored, qidCol,
      Seq(("adc_dist", true), (idCol, true)), k, queries.count())
  }

  /** The residual v - coarse[centroid_id] as a column — for TRAINING the
    * residual codebooks (sample-sized input by the [[train]] contract);
    * the hot encode/search paths never materialize residuals (the
    * subtraction fuses into [[graft.functions.PqEncodeResidual]] /
    * [[graft.functions.PqLutResidual]]'s distance loops). */
  def residualExpr(vec: Column, cid: Column, coarse: IVF.Model): Column = {
    val cm = typedlit(coarse.centroids.map(_.toSeq).toSeq)
    zip_with(toDouble(vec), element_at(cm, cid + 1), (a, b) => a - b)
  }

  /** Train residual codebooks: [[train]] over the residuals of an
    * [[IVF.assign]]-ed (sample) frame. Standard IVFADC training order —
    * coarse quantizer first, fine quantizer on what it leaves behind. */
  def trainResidual(assigned: DataFrame, idCol: String, vecCol: String,
      coarse: IVF.Model, m: Int = 8, ks: Int = 16, iters: Int = 5): Model =
    train(assigned.select(col(idCol),
      residualExpr(col(vecCol), col("centroid_id"), coarse).as("__res")),
      idCol, "__res", m, ks, iters)

  /** Residual PQ codes over an [[IVF.assign]]-ed frame — the textbook
    * IVFADC fine quantizer: each list's codebook only covers the spread
    * around its centroid, markedly lower distortion at the same m*ks
    * budget than raw-vector codes. Map-only; the residual never
    * materializes (fused into the codegen'd loop). */
  def encodeResidual(assigned: DataFrame, vecCol: String, coarse: IVF.Model,
      model: Model): DataFrame =
    assigned.withColumn("pq_code",
      PqFunctions.pq_encode_residual(col(vecCol), col("centroid_id"),
        coarse.centroids, model.flat, model.m, model.ks))

  /** IVFADC over a centroid_id-PARTITIONED code index
    * ([[IVF.writeIndexPartitioned]] applied to the [[encodeResidual]] /
    * [[encode]]+[[IVF.assign]] output — codes ride it as-is): the
    * batch's distinct probed list ids are collected first (one job on
    * the |queries| x nprobe probe rows, never the corpus — the
    * [[IVF.probedLists]] contract) and pushed as an `isin` filter, so
    * probe pruning lands as PartitionFilters DIRECTORY SKIPPING at the
    * scan; unprobed lists are never opened, and the only bytes read per
    * probed row are the m-int codes. Equals [[searchIvfAdc]] over the
    * in-memory frame (pinned by spec). */
  def searchIvfAdcPartitioned(spark: org.apache.spark.sql.SparkSession,
      dir: String, queries: DataFrame, idCol: String, qidCol: String,
      coarse: IVF.Model, model: Model, k: Int, nprobe: Int = 4): DataFrame = {
    val probed = IVF.probedLists(queries, qidCol, coarse, nprobe)
    val codes = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(probed.map(Int.box): _*))
    searchIvfAdc(codes, queries, idCol, qidCol, coarse, model, k, nprobe)
  }

  /** Residual IVFADC search: like [[searchIvfAdc]] but each (query,
    * probed list) pair carries its OWN lookup table — distances from the
    * query's residual AGAINST THAT LIST's centroid to the codewords, the
    * Jegou §III.B formulation. Still nprobe LUTs per query on the
    * broadcast side; the corpus side is unchanged (codes only). */
  def searchIvfAdcResidual(codes: DataFrame, queries: DataFrame,
      idCol: String, qidCol: String, coarse: IVF.Model, model: Model,
      k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries
      .withColumn("centroid_id",
        explode(graft.functions.VectorFunctions.nearest_centroid_ids(
          toDouble(col("qvec")), coarse.centroids, nprobe)))
      .withColumn("__lut",
        PqFunctions.pq_lut_residual(col("qvec"), col("centroid_id"),
          coarse.centroids, model.flat, model.m, model.ks))
      .select(col(qidCol), col("centroid_id"), col("__lut"))
    val scored = codes.join(broadcast(q), Seq("centroid_id"))
      .withColumn("adc_dist",
        round(PqFunctions.pq_adc_dist(col("pq_code"), col("__lut"), model.ks), 6))
      .select(col(qidCol), col(idCol), col("adc_dist"))
    Similarity.selectTopK(scored, qidCol,
      Seq(("adc_dist", true), (idCol, true)), k, queries.count())
  }

  /** ADC shortlist + exact cosine re-rank — the two-stage recipe that
    * recovers the recall PQ's compression gives up (the
    * [[Similarity.knnQuantizedRerank]] pattern, with PQ codes as the
    * cheap stage): the corpus-sized scan touches only the m-int codes,
    * and full vectors enter through ONE candidate-sized join
    * (|queries| * k * rerank rows) at the end. Equals brute force
    * whenever the true top-k survive the ADC cut (pinned by spec at
    * rerank = corpus size). Output: (qidCol, idCol, cosine_sim 6dp),
    * descending similarity, ties by id. */
  def searchAdcRerank(codes: DataFrame, vectors: DataFrame,
      queries: DataFrame, idCol: String, qidCol: String, vecCol: String,
      model: Model, k: Int, rerank: Int = 4): DataFrame = {
    require(rerank >= 1, "rerank factor must be >= 1")
    val nQ = queries.count() // one cheap job on the SMALL query frame
    val shortlist = searchAdcCounted(codes, queries, idCol, qidCol, model,
      k * rerank, nQ).select(col(qidCol), col(idCol))
    val exact = shortlist
      .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col("qvec"))), Seq(qidCol))
      .withColumn("cosine_sim",
        round(Similarity.cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    Similarity.selectTopK(exact, qidCol,
      Seq(("cosine_sim", false), (idCol, true)), k, nQ)
  }
}
