package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KllQuantile

/** Percentile profiles from the mergeable quantile sketch
  * ([[graft.functions.KllQuantile]]) — the scale path for per-group
  * distribution readouts (length/quality percentiles per source, the
  * pre-tokenization length audit) where an exact percentile would sort
  * each group: the sketch aggregate carries O(k log(n/k)) buffers per
  * partition through ONE exchange, and the quantile walk itself runs on
  * the finished ≤groups-row frame (driver-altitude by design, the MMR
  * convention — the corpus never sees it).
  *
  * Exactness: groups with n <= k never compact, so their quantiles are
  * exact lower-quantiles (smallest value with cumulative weight >=
  * ceil(p*n)) — the regime the x138 oracle replays value-for-value;
  * larger groups degrade gracefully inside the documented rank
  * envelope. [[Sampling.perSourcePercentile]] stays the exact
  * formulation this op is pinned against in the spec. */
object Kll {

  /** Per-group quantiles of `valueCol` at each probability in `probs`.
    * Emits one row per (group, prob): groupCols..., p, q, n_exact. */
  def quantiles(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      k: Int = 256): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    probs.foreach(p => require(p >= 0.0 && p <= 1.0, s"prob out of range: $p"))
    val sk = udaf(new KllQuantile(k), Encoders.scalaDouble)
    // a null is not a measurement — without the filter it would reach the
    // typed aggregator as 0.0 and silently drag every low quantile down
    val clean = df.filter(col(valueCol).isNotNull)
    val grouped =
      if (groupCols.isEmpty) clean.groupBy()
      else clean.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(sk(col(valueCol).cast("double")).as("__sk"))
    val qUdf = udf((vals: Seq[Double], ws: Seq[Long], n: Long, p: Double) =>
      KllQuantile.quantile(vals.toArray, ws.toArray, n, p))
    agg.select(groupCols.map(col) :+ col("__sk") :+
        explode(typedlit(probs.sorted)).as("p"): _*)
      .withColumn("q", qUdf(col("__sk._1"), col("__sk._2"),
        col("__sk._3"), col("p")))
      .withColumn("n_exact", col("__sk._3"))
      .drop("__sk")
  }
}
