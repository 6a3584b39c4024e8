package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`). Extension surface (north star; not in reference scope).
  *
  * Two paths:
  *  - [[bruteForceKnn]]: exact cosine top-k — the correctness baseline. The
  *    query vector is a broadcast one-row frame, so the "join" is a
  *    broadcast nested loop over a single row: one scan, no shuffle, then a
  *    `TakeOrderedAndProject` top-k (never a global sort).
  *  - [[lshKnn]]: random-hyperplane LSH (Charikar sign-random-projection).
  *    Hyperplane components are pseudo-random +-1 derived from xxhash64 of
  *    (plane, dimension) — data-independent and reproducible cluster-wide
  *    with zero driver state. Candidates = same-signature bucket, re-ranked
  *    exactly. At scale the bucket join hash-partitions on the signature, so
  *    each task only scores its bucket — the scale path when the corpus no
  *    longer scan-fits.
  */
object Similarity {

  /** Dot product of two array<numeric> columns in double precision — native
    * codegen'd expression ([[graft.functions.DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision (0 when either norm is 0) —
    * native codegen'd expression ([[graft.functions.CosineSimilarity]]);
    * bit-identical to [[cosineBuiltins]], ~an order of magnitude faster
    * (tight primitive loop vs interpreted per-element lambdas). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_sim(a, b)

  /** Built-ins-only formulation (higher-order fold), kept as the reference
    * implementation the native expression is verified against. */
  def cosineBuiltins(a: Column, b: Column): Column = {
    def foldDot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val d = foldDot(a, b)
    val n = sqrt(foldDot(a, a)) * sqrt(foldDot(b, b))
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Exact cosine top-k against one query vector (given as a 1-row frame
    * with column `qvec`). Returns (idCol, cosine_sim) the k best, ties
    * broken by id for determinism. */
  def bruteForceKnn(df: DataFrame, queryVec: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    df.crossJoin(broadcast(queryVec))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .select(col(idCol), col("cosine_sim"))
      .limit(k)

  /** Batched exact cosine top-k: one QUERY FRAME (qidCol, qvec) against the
    * corpus — the shape a training-data pipeline actually runs (millions of
    * retrievals per day, not one). Scoring is a broadcast nested loop over
    * the (small) query frame — every corpus partition scores its rows
    * against all queries locally, no corpus shuffle — and the k-selection
    * is [[graft.plans.TopK.perGroup]] per query id: a bounded k-heap per
    * query behind ONE hash exchange of the narrow (qid, id, score) triples.
    * The exchange carries |corpus| x |queries| triples, which is the honest
    * cost of EXACT batch search; when that product stops fitting, the scale
    * paths are [[lshKnnBatch]] / [[IVF.searchBatch]], whose bucket joins
    * only score same-bucket candidates. Results equal N [[bruteForceKnn]]
    * calls (pinned by spec); ties break by id for determinism. */
  def bruteForceKnnBatch(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    topKPerQuery(scored, qidCol, idCol, k, queries)
  }

  /** Embedding-table health check — the QA readout run before any
    * vector index is built or refreshed: per-group (source, label,
    * model version…) L2-norm mean/stddev, zero-vector and non-finite
    * counts, and the dimension spread. What it catches: embedding
    * COLLAPSE (norm stddev crashing toward 0 — every text mapping to
    * one point), a half-failed encoder deploy (zero or NaN vectors from
    * the broken replica), and silent dimension drift after a model swap
    * (mixed dims in one table break every dot product downstream).
    *
    * Map-only per-row norm/dim expressions into ONE group-keyed
    * aggregate — no explode, vectors never shuffle (the aggregate
    * carries a handful of doubles per group). 6dp rounding; stddev is
    * the sample form (stddev_samp), pinned by the oracle. Non-finite =
    * NaN, null, or ±Infinity elements (a real broken-encoder output
    * emits Inf, not just NaN); such vectors are counted in
    * `n_nonfinite` and EXCLUDED from the norm statistics — one Inf
    * vector must show up in its own column, not silently turn
    * norm_mean into Infinity and norm_std into NaN. */
  def embeddingHealth(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    val norm = sqrt(aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val finite = forall(col(vecCol), { x =>
      val d = x.cast("double")
      not(isnan(d)) && !d.isNull && abs(d) =!= lit(Double.PositiveInfinity)
    })
    df.select(col(groupCol).as("group_id"), norm.as("__n"),
        size(col(vecCol)).as("__d"), finite.as("__f"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(when(col("__f"), col("__n"))), 6).as("norm_mean"),
        round(stddev_samp(when(col("__f"), col("__n"))), 6).as("norm_std"),
        sum(when(col("__f") && col("__n") === 0, 1L).otherwise(0L))
          .as("n_zero"),
        sum(when(!col("__f"), 1L).otherwise(0L)).as("n_nonfinite"),
        min(col("__d")).as("dim_min"), max(col("__d")).as("dim_max"))
  }

  /** One-pass distributed embedding moments — the statistical core of
    * whitening/PCA preprocessing for retrieval (compute mean vector +
    * covariance HERE, distributed; the d×d Cholesky/eigendecomposition
    * is driver-side by nature and the resulting whitening matrix applies
    * via [[projectRandom]]'s map-only matrix-multiply shape): one row
    * per dimension pair i ≤ j with n, the 6dp means m_i/m_j, the second
    * moment exy = E[v_i·v_j], and the SAMPLE covariance
    * (exy − m_i·m_j)·n/(n−1).
    *
    * Determinism contract: sums ride DECIMAL(38,18) (exact integer
    * arithmetic — partition-count-invariant and engine-replayable, the
    * [[graft.ops.IVF.trainPortable]] convention), means/moments round
    * 6dp, covariance derives from the ROUNDED moments so every engine
    * computes the identical double expression.
    *
    * Scale shape: the pair explode emits d(d+1)/2 narrow rows per
    * vector into ONE (i,j)-keyed aggregate — map-side partials collapse
    * each partition to ≤ d(d+1)/2 rows before the exchange, so the
    * shuffle carries O(partitions·d²) bytes, never the corpus; means
    * ride a second posexplode pass of the same shape (O(d) per row).
    * The per-row pair generator is a nested `transform()` HOF
    * (interpreted): acceptable because the explode's row fanout
    * dominates the lambda cost at any d worth whitening; a corpus
    * where THIS pass is hot wants the fused-expression treatment
    * first. */
  def embeddingMoments(df: DataFrame, vecCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val v = transform(col(vecCol), x => x.cast("double"))
    val d = size(v)
    val pairs = flatten(transform(sequence(lit(0), d - 1), i =>
      transform(sequence(i, d - 1), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(v, i + 1) * element_at(v, j + 1)).as("xy")))))
    val second = df.select(explode(pairs).as("p"))
      .select(col("p")("i").as("i"), col("p")("j").as("j"),
        col("p")("xy").as("xy"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("xy").cast(dec)).cast("double") / count(lit(1)), 6)
          .as("exy"))
    val means = df.select(posexplode(v).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(round(sum(col("x").cast(dec)).cast("double") / count(lit(1)), 6)
        .as("m"))
    val nD = col("n").cast("double")
    second
      .join(broadcast(means.select(col("pos").as("i"), col("m").as("m_i"))),
        Seq("i"))
      .join(broadcast(means.select(col("pos").as("j"), col("m").as("m_j"))),
        Seq("j"))
      .select(col("i"), col("j"), col("n"), col("m_i"), col("m_j"),
        col("exy"),
        round((col("exy") - col("m_i") * col("m_j")) * nD / (nD - 1.0), 6)
          .as("cov"))
  }

  /** ColBERT-style late-interaction MaxSim retrieval (Khattab & Zaharia
    * '20): score(doc) = Σ_{query tokens} max_{doc tokens}
    * cos(q_tok, d_tok) — token-level matching that single-vector
    * retrieval collapses away (a doc matching ALL query terms somewhere
    * beats one matching a blend of them). Inputs are TOKEN-level vector
    * frames (the scalable representation — one narrow row per token,
    * never a ragged matrix column): `docToks` = (idCol, vecCol) rows,
    * `queryToks` = (qtokCol, vecCol) rows for ONE query.
    *
    * Scale shape: the query's token frame rides a BROADCAST nested loop
    * over the corpus token scan (queries are tens of tokens; the corpus
    * side is never shuffled for scoring), then two doc-keyed aggregates
    * (per-(doc, q-token) max, per-doc sum) with map-side partials, then
    * the bounded top-k. Cosines round 6dp and the per-doc sum rides
    * DECIMAL(38,18) (exact, order-independent — the
    * [[embeddingMoments]] convention), so scores replay cross-engine.
    * The ANN composition at corpus scale is the standard ColBERT
    * recipe: [[lshKnn]]/IVF shortlist on pooled vectors, MaxSim re-rank
    * on the shortlist — this operator is the re-rank/exact leg. */
  def maxSimTopK(docToks: DataFrame, queryToks: DataFrame, idCol: String,
      qtokCol: String, vecCol: String, k: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val q = broadcast(queryToks.select(col(qtokCol).as("__qt"),
      col(vecCol).as("__qv")))
    docToks.select(col(idCol), col(vecCol).as("__dv"))
      .crossJoin(q)
      .select(col(idCol), col("__qt"),
        round(cosine(col("__dv"), col("__qv")), 6).as("__c"))
      .groupBy(col(idCol), col("__qt"))
      .agg(max(col("__c")).as("__mx"))
      .groupBy(col(idCol))
      .agg(round(sum(col("__mx").cast(dec)).cast("double"), 6).as("maxsim"))
      .orderBy(col("maxsim").desc, col(idCol))
      .limit(k)
  }

  /** Element-wise mean pooling of a vector column per group — the
    * standard chunk-embeddings -> document-embedding (or token ->
    * sentence) reduction in retrieval pipelines: embed bounded chunks,
    * mean-pool to one vector per document. Emits narrow (group, pos,
    * v) rows — the join-able long form; [[assemblePooled]] folds them
    * back to arrays when a vector column is needed.
    *
    * Scale shape: ONE posexplode to (group, pos, value) narrow rows and
    * ONE (group, pos)-keyed aggregate with map-side partial combine —
    * the exchange carries (8+4+8)-byte rows bounded by groups x dim,
    * never the raw vectors; no window, no collect. Values rounded 6dp
    * (cross-engine float determinism). Ragged inputs are legal: each
    * position averages over the vectors that HAVE it (pad upstream if
    * strict-length semantics are needed). */
  def meanPoolVectors(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol).as("group_id"),
        posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col("group_id"), col("pos"))
      .agg(round(avg(col("__v").cast("double")), 6).as("v"))

  /** (group, pos, v) long form -> (group, vector) — a dim-bounded
    * collect_list per group. */
  def assemblePooled(pooled: DataFrame): DataFrame =
    pooled.groupBy(col("group_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("pooled"))

  /** Hard-negative mining for embedding/retrieval training (the DPR /
    * Contriever recipe): for each query, the top-k most-similar corpus
    * vectors EXCLUDING its known positives — the near-misses that
    * actually tighten a contrastive loss, where random negatives are
    * trivially separable and teach nothing. Exclusion happens BEFORE
    * k-selection (an anti-join on (query, id)), so the output is exactly
    * the top-k of the positive-free candidate set — not "top-k minus
    * positives", which silently under-fills k whenever a positive ranks
    * high (i.e. always, for a trained model).
    *
    * Scale shape: identical to [[bruteForceKnnBatch]] — broadcast query
    * frame, narrow (qid, id, score) triples into the bounded-heap
    * k-selection — plus one broadcast left-anti join against the
    * positives frame, which is (queries x positives-per-query)-bounded
    * by contract. This is the exact baseline; when |corpus| x |queries|
    * stops fitting, run the same anti-join + selection over
    * [[lshKnnBatch]] / [[IVF.searchBatch]] candidates with a widened
    * internal k. */
  def hardNegatives(df: DataFrame, queries: DataFrame, positives: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    val pruned = scored.join(
      broadcast(positives.select(col(qidCol), col(idCol))),
      Seq(qidCol, idCol), "left_anti")
    topKPerQuery(pruned, qidCol, idCol, k, queries)
  }

  /** Symmetric int8 scalar quantization of a vector column — the classic
    * vector-store memory/bandwidth recipe (FAISS SQ8): per-vector scale =
    * max|x| / 127, code_i = round(x_i · 127 / max|x|) ∈ [-127, 127].
    * Adds `qcode` (int8-valued codes) and `qscale`; a zero vector
    * quantizes to zeros with scale 0. Stored codes are 4-8× smaller than
    * the float vectors, so at corpus scale the CODES table is what scans
    * and shuffles; full-precision vectors are consulted only through the
    * candidate-pruned join in [[knnQuantizedRerank]]. The quantized dot
    * product reconstructs as dot(code_a, code_b)·scale_a·scale_b. The
    * multiply-before-divide order (x·127/ma) is pinned so DuckDB replays
    * the code values bit-for-bit (a/(ma/127) differs in the last ulp). */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val ma = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.withColumn("__ma", ma)
      .withColumn("qscale",
        when(col("__ma") > 0, col("__ma") / 127.0d).otherwise(lit(0.0d)))
      .withColumn("qcode",
        when(col("__ma") > 0,
          transform(col(vecCol),
            x => round(x.cast("double") * 127.0d / col("__ma")).cast("long")))
          .otherwise(transform(col(vecCol), _ => lit(0L))))
      .drop("__ma")
  }

  /** Quantized retrieval with exact re-rank — the production two-stage
    * recipe: rank the WHOLE corpus per query with the cheap int8 dot
    * product (integer multiply-adds over 4-8× fewer bytes), keep the top
    * `rerank`·k candidates, re-score ONLY those with exact double cosine,
    * return the final top-k. Exactness degrades gracefully: the answer
    * equals brute force whenever the true top-k survive the approximate
    * cut (pinned by spec at rerank = corpus size), and the int8 scoring
    * error is bounded by the two vectors' quantization steps. Scale
    * shape: the crossed stage carries only (id, codes, scale) — never
    * full vectors — and both k-selections ride the bounded-heap
    * TopKPerGroup operator; full vectors enter through one
    * candidate-sized join at the end. */
  def knnQuantizedRerank(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, rerank: Int = 4): DataFrame = {
    require(rerank >= 1, "rerank factor must be >= 1")
    val codes = quantizeInt8(df, vecCol)
      .select(col(idCol), col("qcode"), col("qscale"))
    val qcodes = quantizeInt8(queries, "qvec")
      .select(col(qidCol), col("qcode").as("__qc"), col("qscale").as("__qs"))
    val approx = codes.crossJoin(broadcast(qcodes))
      .withColumn("approx_score",
        aggregate(zip_with(col("qcode"), col("__qc"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).cast("double") *
          col("qscale") * col("__qs"))
      .select(col(qidCol), col(idCol), col("approx_score"))
    val nQ = queries.count() // one cheap job on the SMALL query frame
    val cand = selectTopK(approx, qidCol,
      Seq(("approx_score", false), (idCol, true)), k * rerank, nQ)
    val exact = cand
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col("qvec"))), Seq(qidCol))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    selectTopK(exact, qidCol, Seq(("cosine_sim", false), (idCol, true)),
      k, nQ)
  }

  /** One-bit (sign) binary quantization of a vector column, packed into
    * 63-bit words — the most aggressive vector-store compression tier
    * below [[quantizeInt8]] (BQ in the FAISS/vector-DB sense): bit b of
    * word w is set when v[w·63 + b] > 0 (strictly — zeros and negatives
    * clear). A d-dim float vector (4d bytes) becomes ceil(d/63) longs
    * (~d/8 bytes, 32× smaller), and distance becomes popcount(xor) —
    * integer ops over one long per 63 dims. 63 bits per word (not 64)
    * keeps every packed value non-negative in a signed BIGINT, the same
    * portability convention as the 60-bit simhash family, so the DuckDB
    * oracle replays codes with `1::BIGINT << b` arithmetic alone.
    * Adds `bcode` (array<long>). Empty vectors pack to an empty code. */
  def quantizeBinary(df: DataFrame, vecCol: String): DataFrame = {
    val d = size(col(vecCol))
    // (d + 62) / 63 words; sequence() infers a NEGATIVE step for
    // stop < start, so the d = 0 case must short-circuit to an empty
    // array rather than reach sequence(0, -1)
    val words = ((d + lit(62)) / lit(63)).cast("int")
    df.withColumn("bcode",
      when(d === 0, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(0), words - 1), w =>
          aggregate(
            sequence(lit(0L), least(lit(62L),
              d.cast("long") - w.cast("long") * 63L - 1L)),
            lit(0L),
            (acc, b) => acc + when(
              element_at(col(vecCol),
                (w.cast("long") * 63L + b + 1L).cast("int"))
                .cast("double") > 0d,
              // 2^b is a power of two — exact as a double for b <= 62,
              // so the cast back to long is exact (shiftleft takes only
              // a literal shift in the Column API)
              pow(lit(2.0d), b.cast("double")).cast("long"))
              .otherwise(lit(0L))))))
  }

  /** Binary-quantized retrieval with exact re-rank — [[knnQuantizedRerank]]
    * one compression tier down: rank the whole corpus per query by
    * Hamming distance between sign codes (popcount over xor'd longs —
    * the cheapest possible scan: ~d/8 bytes per row, pure integer ops),
    * keep the `rerank`·k closest, re-score only those with exact double
    * cosine. Ties break (hamming ASC, id ASC), pinned for the oracle.
    * Output carries the shortlist's `hamming` next to `cosine_sim`, so
    * the approximate stage is itself oracle-visible, not just its
    * survivors. Scale shape: the crossed stage carries only (id, bcode);
    * both k-selections ride the bounded-heap TopKPerGroup operator; full
    * vectors enter through one candidate-sized join. */
  def knnBinaryRerank(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, rerank: Int = 4): DataFrame = {
    require(rerank >= 1, "rerank factor must be >= 1")
    val codes = quantizeBinary(df, vecCol).select(col(idCol), col("bcode"))
    val qcodes = quantizeBinary(queries, "qvec")
      .select(col(qidCol), col("bcode").as("__qbc"))
    val approx = codes.crossJoin(broadcast(qcodes))
      .withColumn("hamming",
        aggregate(zip_with(col("bcode"), col("__qbc"),
            (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (acc, v) => acc + v))
      .select(col(qidCol), col(idCol), col("hamming"))
    val nQ = queries.count() // one cheap job on the SMALL query frame
    val cand = selectTopK(approx, qidCol,
      Seq(("hamming", true), (idCol, true)), k * rerank, nQ)
    val exact = cand
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col("qvec"))), Seq(qidCol))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("hamming"), col("cosine_sim"))
    selectTopK(exact, qidCol, Seq(("cosine_sim", false), (idCol, true)),
      k, nQ)
  }

  /** Per-query k-selection shared by the batch searchers: heap operator
    * when the batch is small (group cardinality == |queries|, counted on
    * the SMALL query frame — never an estimate pass over the huge scored
    * frame), spillable window formulation for unbounded batches. The
    * count is one cheap job; callers' scored plans reference the same
    * frame, so the count does not recompute the search itself. */
  private[ops] def topKPerQuery(scored: DataFrame, qidCol: String,
      idCol: String, k: Int, queries: DataFrame): DataFrame =
    selectTopK(scored, qidCol, Seq(("cosine_sim", false), (idCol, true)),
      k, queries.count())

  /** The heap-vs-window selection branch behind [[topKPerQuery]], for
    * callers that order by other columns or already hold the query
    * count. */
  private[ops] def selectTopK(scored: DataFrame, qidCol: String,
      order: Seq[(String, Boolean)], k: Int, nQueries: Long): DataFrame =
    if (nQueries <= graft.plans.TopK.defaultMaxGroups)
      graft.plans.TopK.perGroup(scored, Seq(qidCol), order, k,
        maxGroups = Long.MaxValue)
    else graft.plans.TopK.windowPerGroup(scored, Seq(qidCol), order, k)

  /** Deterministic random-projection dimensionality reduction
    * (Johnson–Lindenstrauss with a ±1 Achlioptas matrix): out_j =
    * sum_i(v_i · R_ij) / sqrt(outDim), R_ij = ±1 by the parity of the
    * first hex digit of md5("rp_<i>_<j>") — md5 (not a JVM RNG) so an
    * external system or the DuckDB oracle regenerates the EXACT matrix
    * from the formula alone. The projection halves-or-more the bytes a
    * downstream ANN/LSH stage shuffles and scans; pair it with
    * [[graft.ops.Dedup.cosinePairsLsh]] or [[lshKnnBatch]] over the
    * `projected` column.
    *
    * Scale shape: the matrix is (inDim × outDim) driver doubles — model
    * state, like [[graft.ops.IVF.Model]] — burned into one map-only
    * expression of literal-array dots: no join, no shuffle, no per-row
    * hashing (the md5 calls happen ONCE at plan build). Values rounded
    * 6dp for cross-engine float determinism. */
  def projectRandom(df: DataFrame, vecCol: String, inDim: Int,
      outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"rp_${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
    }
    val scale = math.sqrt(outDim.toDouble)
    val v = transform(col(vecCol), x => x.cast("double"))
    val outs = (0 until outDim).map { j =>
      round(dot(v, array((0 until inDim).map(i => lit(sign(i, j))): _*))
        / scale, 6)
    }
    df.withColumn("projected", array(outs: _*))
  }

  /** Sign-random-projection signature: bit j = sign of <v, plane_j> where
    * plane components are hash-derived +-1. Native expression
    * ([[graft.functions.SrpSignature]]) — one primitive loop per row; the
    * built-in composition needed planes x dim interpreted lambda calls. */
  def srpSignature(vec: Column, planes: Int): Column =
    graft.functions.SrpFunctions.srp_signature(vec, planes)

  /** LSH-bucketed ANN: restrict scoring to vectors sharing the query's
    * `planes`-bit SRP bucket, then exact cosine re-rank. with `multiProbe`
    * the query additionally searches every bucket one hyperplane-flip away
    * (multi-probe LSH, hamming radius 1): near-neighbors that landed just
    * across one hyperplane are recovered at the cost of a (planes+1)x
    * larger candidate set — the standard recall/latency dial. The probe
    * set explodes on the (broadcast) query side, so the corpus still
    * equi-joins on its single bucket id. */
  def lshKnn(df: DataFrame, queryVec: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = df.withColumn("bucket", srpSignature(col(vecCol), planes))
    val flips: Seq[Long] = 0L +: (0 until planes).map(b => 1L << b)
    val probeBuckets: Column => Column = qb =>
      if (!multiProbe) array(qb)
      else array_distinct(array(flips.map(f => qb.bitwiseXOR(lit(f))): _*))
    val q = queryVec
      .withColumn("qbucket", srpSignature(col("qvec"), planes))
      .withColumn("bucket", explode(probeBuckets(col("qbucket"))))
      .drop("qbucket")
    bucketed.join(broadcast(q), Seq("bucket"))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .select(col(idCol), col("cosine_sim"))
      .limit(k)
  }

  /** Batched LSH ANN: a query FRAME (qidCol, qvec) joins the SRP-bucketed
    * corpus on the bucket id — the multi-probe set explodes on the query
    * side only, so the corpus still equi-joins on its single bucket (and
    * only same-bucket candidates are ever scored, unlike the exact batch
    * path's full cross product). k-selection per query id runs on the
    * bounded-heap [[graft.plans.TopK]] operator. Equals N [[lshKnn]] calls
    * (pinned by spec). */
  def lshKnnBatch(df: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, planes: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = df.withColumn("bucket", srpSignature(col(vecCol), planes))
    val flips: Seq[Long] = 0L +: (0 until planes).map(b => 1L << b)
    val probeBuckets: Column => Column = qb =>
      if (!multiProbe) array(qb)
      else array_distinct(array(flips.map(f => qb.bitwiseXOR(lit(f))): _*))
    val q = queries
      .withColumn("qbucket", srpSignature(col("qvec"), planes))
      .withColumn("bucket", explode(probeBuckets(col("qbucket"))))
      .select(col(qidCol), col("qvec"), col("bucket"))
    val scored = bucketed.join(q, Seq("bucket"))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    topKPerQuery(scored, qidCol, idCol, k, queries)
  }

  /** The SCALE path [[hardNegatives]]' scaladoc promises: LSH-bucketed
    * candidate generation ([[lshKnnBatch]]'s bucket-join shape — the
    * corpus never cross-joins the queries) with the positive-exclusion
    * anti-join applied to the FULL same-bucket candidate set BEFORE the
    * k-selection, so a high-ranking positive can never consume a top
    * slot or under-fill k (no pre-truncation exists for it to survive).
    * Same recall dial as [[lshKnnBatch]] (planes/multiProbe); judge a
    * configuration with [[recallAtK]] against the exact
    * [[hardNegatives]] before committing it. */
  def hardNegativesApprox(df: DataFrame, queries: DataFrame,
      positives: DataFrame, idCol: String, vecCol: String, qidCol: String,
      k: Int, planes: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = df.withColumn("bucket", srpSignature(col(vecCol), planes))
    val flips: Seq[Long] = 0L +: (0 until planes).map(b => 1L << b)
    val probeBuckets: Column => Column = qb =>
      if (!multiProbe) array(qb)
      else array_distinct(array(flips.map(f => qb.bitwiseXOR(lit(f))): _*))
    val q = queries
      .withColumn("qbucket", srpSignature(col("qvec"), planes))
      .withColumn("bucket", explode(probeBuckets(col("qbucket"))))
      .select(col(qidCol), col("qvec"), col("bucket"))
    val scored = bucketed.join(q, Seq("bucket"))
      .withColumn("cosine_sim", round(cosine(col(vecCol), col("qvec")), 6))
      .select(col(qidCol), col(idCol), col("cosine_sim"))
    val pruned = scored.join(
      broadcast(positives.select(col(qidCol), col(idCol))),
      Seq(qidCol, idCol), "left_anti")
    topKPerQuery(pruned, qidCol, idCol, k, queries)
  }

  /** Recall@k — the retrieval-quality yardstick every approximate path
    * here ([[lshKnn]], [[projectRandom]]-space search, the IVF probes,
    * int8 rerank) is ultimately judged by: per query, the fraction of
    * the EXACT top-k a candidate retrieval recovered. This is the QA
    * op a pipeline runs before committing an ANN configuration —
    * sweep nprobe / planes / projection dims, read the recall curve,
    * pick the knee.
    *
    * Both inputs are top-k retrieval outputs, so every frame is
    * (queries × k)-bounded — the semi-join + two tiny aggregates never
    * touch corpus-sized data. Queries present in `exact` always emit
    * (n_hit = 0 when the candidate missed entirely); extra rows in
    * `approx` beyond the exact set only ever lower nothing — recall is
    * measured against `exact`. Output: qidCol, n_exact, n_hit, recall
    * (6dp). */
  def recallAtK(approx: DataFrame, exact: DataFrame, qidCol: String,
      idCol: String): DataFrame = {
    val ex = exact.select(col(qidCol), col(idCol))
    val ap = approx.select(col(qidCol), col(idCol))
    val exCnt = ex.groupBy(col(qidCol)).agg(count(lit(1)).as("n_exact"))
    val hitCnt = ex.join(ap, Seq(qidCol, idCol), "left_semi")
      .groupBy(col(qidCol)).agg(count(lit(1)).as("n_hit"))
    exCnt.join(hitCnt, Seq(qidCol), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") /
        col("n_exact").cast("double"), 6))
  }

  /** Graded NDCG@k + MRR of an approximate retrieval against an exact
    * ranking — the rank-QUALITY readout [[recallAtK]] can't give:
    * recall counts set overlap, NDCG weighs WHERE the good results
    * landed (a hit at rank 1 vs rank 10 is the difference users and
    * re-rankers feel). `rel` is the judged pool — the exact top-k with
    * a graded relevance column (cosine here); approx results outside it
    * gain 0 (the standard truncated-graded convention: only judged
    * documents carry gain). Gains map relevance from [−1, 1] to [0, 1]
    * via (r+1)/2; DCG = Σ gain/log2(rank+1) over the approx ranking,
    * IDCG over the ideal (relevance-sorted) one, MRR = 1/first judged
    * hit's rank.
    *
    * Determinism contract: per-rank terms round 6dp (discount literals
    * are JVM doubles burned into BOTH plans — the oracle embeds the
    * identical shortest-repr literals), per-query sums ride
    * DECIMAL(38,18) (the [[embeddingMoments]] convention), ranks break
    * ties on the id. Scale shape: both inputs are top-k-per-query
    * frames (queries × k rows — tiny by construction, the [[recallAtK]]
    * altitude); the ranking windows partition on the query id over
    * k-bounded groups. */
  def ndcgAtK(approx: DataFrame, rel: DataFrame, qidCol: String,
      idCol: String, scoreCol: String, relCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val dArr = array(ndcgDiscounts(k).map(lit): _*)
    val wA = Window.partitionBy(col(qidCol))
      .orderBy(col("__s").desc, col(idCol))
    val apRanked = approx
      .select(col(qidCol), col(idCol), col(scoreCol).as("__s"))
      .withColumn("__rn", row_number().over(wA))
      .filter(col("__rn") <= k)
    val gains = apRanked
      .join(rel.select(col(qidCol), col(idCol), col(relCol).as("__r")),
        Seq(qidCol, idCol), "left")
      .withColumn("__g",
        when(col("__r").isNotNull, (col("__r") + 1.0) / 2.0)
          .otherwise(lit(0.0)))
      .withColumn("__t",
        round(col("__g") / element_at(dArr, col("__rn")), 6))
    val dcgF = gains.groupBy(col(qidCol))
      .agg(round(sum(col("__t").cast(dec)).cast("double"), 6).as("dcg"),
        min(when(col("__r").isNotNull, col("__rn"))).as("__hit"))
    val wI = Window.partitionBy(col(qidCol))
      .orderBy(col("__r").desc, col(idCol))
    val idcgF = rel
      .select(col(qidCol), col(idCol), col(relCol).as("__r"))
      .withColumn("__rn", row_number().over(wI))
      .filter(col("__rn") <= k)
      .withColumn("__t",
        round(((col("__r") + 1.0) / 2.0) / element_at(dArr, col("__rn")), 6))
      .groupBy(col(qidCol))
      .agg(round(sum(col("__t").cast(dec)).cast("double"), 6).as("idcg"))
    dcgF.join(idcgF, Seq(qidCol))
      .select(col(qidCol), col("dcg"), col("idcg"),
        round(when(col("idcg") === 0.0, 0.0)
          .otherwise(col("dcg") / col("idcg")), 6).as("ndcg"),
        round(when(col("__hit").isNull, 0.0)
          .otherwise(lit(1.0) / col("__hit")), 6).as("mrr"))
  }

  /** log2(rank+1) discount ladder — exposed so oracle SQL can embed the
    * IDENTICAL shortest-repr double literals the plan uses. */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(i => math.log(i + 1.0) / math.log(2.0))

  /** Reciprocal Rank Fusion — the standard hybrid-retrieval combiner
    * (Cormack et al., SIGIR'09; what "hybrid search" ships as): given
    * several per-query rankings of the same document space (BM25,
    * embedding kNN, recency, ...), fuse them by
    * rrf(q,d) = Σ_lists 1/(c + rank_list(q,d)), with a document absent
    * from a list contributing nothing. Rank-based (not score-based) on
    * purpose: the input scores live on incomparable scales, ranks
    * don't — no per-list normalization step to tune.
    *
    * Scale shape: the inputs are already top-k-per-query retrieval
    * outputs, so every frame is (queries × k)-bounded — tiny relative
    * to any corpus; the union + one (query, doc) aggregate is the
    * whole plan, and the final rank's window partitions are bounded by
    * lists × k rows per query. Ties fuse deterministically: the score
    * is rounded to 6dp and ranked with the doc id as tie-break (the
    * [[graft.ops.TextAnalysis.bm25TopK]] convention), so the fused
    * ordering replays on any engine. Output: qidCol, idCol,
    * fused_rank (≤ k), rrf_score, n_lists (how many inputs ranked the
    * doc). */
  def rrfFuse(lists: Seq[DataFrame], qidCol: String, idCol: String,
      rankCol: String, c: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(c >= 0 && k >= 1, "need c >= 0 and k >= 1")
    val tagged = lists
      .map(_.select(col(qidCol), col(idCol), col(rankCol)))
      .reduce(_ unionByName _)
    val fused = tagged
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(lit(1.0) / (lit(c) + col(rankCol))), 6)
        .as("rrf_score"),
        count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
      .select(col(qidCol), col(idCol), col("fused_rank"),
        col("rrf_score"), col("n_lists"))
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) —
    * the diversity rerank between retrieval and a context window / few-shot
    * set: greedily pick k candidates maximizing
    * lambda * rel(d) - (1 - lambda) * max_{s in S} sim(d, s), so near-
    * duplicate hits don't crowd out coverage.
    *
    * Scale shape: MMR is inherently sequential (each pick changes the
    * next objective) and runs AFTER a top-N retrieval, so `candidates`
    * is a BOUNDED frame (a [[bruteForceKnnBatch]]/[[IVF.searchBatch]]
    * output joined back to its vectors) — the greedy loop runs on the
    * collected candidate set, driver-bounded model state like the IVF
    * centroids; `maxCandidates` fail-fasts if a caller points it at a
    * corpus. The distributed work is the retrieval that FEEDS it.
    *
    * Determinism contract (engine-replayable): relevance and pairwise
    * similarities round to 6dp BEFORE the greedy math, the objective is
    * the literal `lambda*rel - (1-lambda)*maxSim` over those rounded
    * inputs, ties break to the lowest id, scores round 6dp on output.
    * With lambda = 0.5 (the default) the arithmetic is exact in binary,
    * so a DuckDB unrolled-CTE replay matches bit-for-bit.
    *
    * Output: (idCol, mmr_rank 1..k, mmr_score) in selection order. */
  def mmrSelect(candidates: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambda: Double = 0.5,
      maxCandidates: Int = 10000): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(lambda >= 0 && lambda <= 1, "lambda in [0,1]")
    val spark = candidates.sparkSession
    val rows = candidates
      .select(col(idCol).cast("long"), round(col(relCol), 6),
        transform(col(vecCol), x => x.cast("double")))
      .limit(maxCandidates + 1).collect()
    require(rows.length <= maxCandidates,
      s"mmrSelect got > $maxCandidates candidates — it reranks a bounded " +
        "top-N retrieval, not a corpus; raise maxCandidates only with a bound in hand")
    val ids = rows.map(_.getLong(0))
    val rel = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Double](2).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom > 0) dot / denom else 0.0
    }
    val n = rows.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    val picked = new Array[Boolean](n)
    val maxSim = Array.fill(n)(0.0)
    var rank = 1
    while (rank <= math.min(k, n)) {
      var best = -1; var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val ms = if (rank == 1) 0.0 else maxSim(i)
          val score = lambda * rel(i) - (1 - lambda) * ms
          if (best < 0 || score > bestScore ||
            (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true
      selected += ((ids(best), rank, TextAnalysis.round6(bestScore)))
      var j = 0
      while (j < n) {
        if (!picked(j)) {
          val s = TextAnalysis.round6(cos(vecs(j), vecs(best)))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      rank += 1
    }
    import spark.implicits._
    selected.toSeq.toDF(idCol, "mmr_rank", "mmr_score")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * CCMatrix/LASER parallel-corpus recipe): given source-side and
    * target-side sentence embeddings, score candidate pairs by the RATIO
    * margin `cos(x,y) / ((favg(x) + bavg(y)) / 2)` — cosine normalized by
    * the mean cosine of each side's own k nearest neighbors — and keep
    * the pairs that are each other's best match by that margin. The
    * normalization is what makes mined bitext usable: it cancels
    * hubness (sentences that are near EVERYTHING score high raw cosine
    * against everything; dividing by their neighborhood density demotes
    * them), which raw-cosine thresholding cannot do.
    *
    * Algorithm (per the paper's `ratio` scoring + `max` retrieval):
    *  1. candidates = forward top-k (per source, by cosine) UNION
    *     backward top-k (per target) — margins are computed over this
    *     bounded candidate set, never all pairs;
    *  2. favg/bavg = per-id mean cosine of its OWN top-k
    *     ([[TextAnalysis.mean6Exact]] — means of 6dp cosines over small
    *     k land on round-boundary halves constantly, so the mean is
    *     rounded half-up in integer micro-unit space, never via
    *     round-on-double);
    *  3. margin as above (round6; candidates where favg+bavg <= 0 are
    *     dropped — a degenerate neighborhood has no meaningful ratio);
    *  4. best match per source and per target by (margin desc, id asc);
    *     a pair survives only if it wins BOTH directions (mutual best),
    *     then `minMargin` thresholds the survivors.
    *
    * Scale shape: the exact baseline scores `src x broadcast(tgt)` — one
    * broadcast nested loop, no corpus shuffle (the [[bruteForceKnnBatch]]
    * cost model; when both sides stop fitting that product, swap stage 1
    * for [[lshKnnBatch]] / [[IVF.searchBatch]] candidates — every later
    * stage already operates on bounded top-k frames, so the swap is
    * local). Both top-k selections ride [[graft.plans.TopK]] (bounded
    * heap behind ONE hash exchange each — on src_id forward, tgt_id
    * backward; the per-id means reuse the already-selected k-row
    * frames). The margin joins are 8-byte-id equi-joins of
    * O(k·(|S|+|T|))-row frames against side-sized avg frames — AQE picks
    * broadcast vs shuffle by actual size; nothing here is ever
    * |S|x|T|-sized past stage 1. The candidate frame is persisted for
    * its two consumers (session-lifetime, the repo persist convention).
    *
    * Determinism contract: cosine round6 BEFORE selection; top-k ties
    * break by partner id asc; means via [[TextAnalysis.mean6Exact]];
    * margin = IEEE division of round6 inputs, round6'd —
    * bit-replayable in SQL.
    *
    * Input frames carry (idCol, vecCol). Output: (src_id, tgt_id,
    * cosine_sim, margin) for mutual best pairs with margin >= minMargin. */
  def bitextMarginMine(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, "need k >= 1")
    val s = src.select(col(idCol).as("src_id"), col(vecCol).as("__sv"))
    val t = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("__tv"))
    val scored = s.crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        round(cosine(col("__sv"), col("__tv")), 6).as("cosine_sim"))
    // side cardinalities are KNOWN-small relative to the cross-score, so
    // route the k-selection explicitly (two side-sized counts) instead of
    // letting perGroup's cardinality guard re-execute the |S|x|T| scoring
    // plan per selection
    val nS = s.count(); val nT = t.count()
    val fwd = selectTopK(scored, "src_id",
      Seq(("cosine_sim", false), ("tgt_id", true)), k, nS)
    val bwd = selectTopK(scored, "tgt_id",
      Seq(("cosine_sim", false), ("src_id", true)), k, nT)
    marginMutual(fwd, bwd, minMargin, nS, nT)
  }

  /** [[bitextMarginMine]]'s SCALE path: same margin scoring and mutual
    * best-match, but the forward/backward top-k neighborhoods come from
    * [[lshKnnBatch]]'s SRP bucket joins instead of the exact |S|×|T|
    * cross-score — each side hash-partitions on its bucket signature and
    * only same-bucket (±1-bit multi-probe) pairs are ever scored, so
    * both sides can be corpus-sized. The margin normalization then uses
    * the mean of the LSH top-k as the neighborhood density estimate —
    * the standard mined-bitext approximation (CCMatrix runs FAISS
    * candidates, not exact kNN, for exactly this reason). Identical
    * vectors share their SRP signature by construction, so exact
    * duplicates/translation-copies are ALWAYS candidates regardless of
    * planes; near-pairs obey the SRP collision curve — tune `planes` /
    * `multiProbe` against [[bitextMarginMine]] on a sample with
    * [[recallAtK]] before committing a configuration. Downstream of the
    * candidate stage the plan is byte-for-byte [[bitextMarginMine]]'s
    * (shared [[marginMutual]]). */
  def bitextMarginMineApprox(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, planes: Int = 8, minMargin: Double = 1.0,
      multiProbe: Boolean = true): DataFrame = {
    require(k >= 1, "need k >= 1")
    val fwd = lshKnnBatch(
      tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("__v")),
      src.select(col(idCol).as("src_id"), col(vecCol).as("qvec")),
      "tgt_id", "__v", "src_id", k, planes, multiProbe)
    val bwd = lshKnnBatch(
      src.select(col(idCol).as("src_id"), col(vecCol).as("__v")),
      tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("qvec")),
      "src_id", "__v", "tgt_id", k, planes, multiProbe)
      .select(col("src_id"), col("tgt_id"), col("cosine_sim"))
    marginMutual(fwd, bwd, minMargin, src.count(), tgt.count())
  }

  /** Shared margin + mutual-best stage behind both bitext miners: `fwd`
    * = top-k per src_id, `bwd` = top-k per tgt_id, both as (src_id,
    * tgt_id, cosine_sim). Persisted for their two consumers each (the
    * per-id mean and the candidate union) under the [[graft.ops.Caching]]
    * contract; every frame past here is O(k·(|S|+|T|)) rows
    * on 8-byte-id equi-joins. */
  private def marginMutual(fwdIn: DataFrame, bwdIn: DataFrame,
      minMargin: Double, nSrc: Long, nTgt: Long): DataFrame = {
    val fwd = Caching.scoped(fwdIn)
    val bwd = Caching.scoped(bwdIn)
    val favg = fwd.groupBy(col("src_id"))
      .agg(TextAnalysis.mean6Exact(col("cosine_sim")).as("__favg"))
    val bavg = bwd.groupBy(col("tgt_id"))
      .agg(TextAnalysis.mean6Exact(col("cosine_sim")).as("__bavg"))
    val cand = fwd.select(col("src_id"), col("tgt_id"), col("cosine_sim"))
      .union(bwd.select(col("src_id"), col("tgt_id"), col("cosine_sim")))
      .distinct()
    val margins = cand
      .join(favg, Seq("src_id")).join(bavg, Seq("tgt_id"))
      .filter(col("__favg") + col("__bavg") > 0)
      .select(col("src_id"), col("tgt_id"), col("cosine_sim"),
        round(col("cosine_sim") / ((col("__favg") + col("__bavg")) / 2), 6)
          .as("margin"))
    val bestPerSrc = selectTopK(margins, "src_id",
      Seq(("margin", false), ("tgt_id", true)), 1, nSrc)
    val bestPerTgt = selectTopK(margins, "tgt_id",
      Seq(("margin", false), ("src_id", true)), 1, nTgt)
    bestPerSrc.join(bestPerTgt.select(col("src_id"), col("tgt_id")),
        Seq("src_id", "tgt_id"))
      .filter(col("margin") >= minMargin)
      .select(col("src_id"), col("tgt_id"), col("cosine_sim"), col("margin"))
  }
}
