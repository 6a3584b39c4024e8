package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: reproducible
  * row selection with per-stratum rates (dataset mixture weighting,
  * decontamination holdouts, eval splits). No `rand()` anywhere — sampling
  * decisions are pure functions of row identity, so they are stable across
  * retries, partitions, engines, and re-runs (a non-negotiable for
  * training-data lineage).
  */
object Sampling {

  /** Production path: keep a row iff xxhash64(salt, id) lands under the
    * stratum's rate scaled into the full 64-bit space. Hash-based, so
    * correlated/sequential ids can't bias the sample. */
  def stratifiedSampleByHash(df: DataFrame, idCol: String,
      rateFor: Column, salt: Long = 42L): DataFrame = {
    // map hash to [0,1): shift into non-negative 63-bit range first
    val u = shiftrightunsigned(xxhash64(lit(salt), col(idCol)), 11)
      .cast("double") / lit((1L << 53).toDouble)
    df.filter(u < rateFor)
  }

  /** Oracle-friendly path: keep a row iff id % `den` < rate * den. Exact
    * same arithmetic is expressible in any SQL engine; sampling is exact
    * for ids that cycle through residues. */
  def stratifiedSampleByMod(df: DataFrame, idCol: String,
      rateFor: Column, den: Int = 100): DataFrame =
    df.filter(pmod(col(idCol), lit(den)) < rateFor * den)
}
