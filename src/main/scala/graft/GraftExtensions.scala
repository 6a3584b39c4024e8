package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CharEntropy, CosineSimilarity, DotProduct,
  MinHashSigs, MinMaxXor, ShingleHashes, SimHash64, SrpSignature}

/** Session-extensions entry point: registers graft's native expressions as
  * SQL functions at session build time, so a deployment can enable them
  * cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Library users on the Column API can ignore this and use
  * [[graft.functions.VectorFunctions]] / [[graft.functions.ShingleFunctions]]
  * directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      exprs => ShingleHashes(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("srp_signature"),
      new ExpressionInfo(classOf[SrpSignature].getName, "srp_signature"),
      exprs => SrpSignature(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      exprs => MinHashSigs(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("min_max_xor"),
      new ExpressionInfo(classOf[MinMaxXor].getName, "min_max_xor"),
      exprs => MinMaxXor(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      exprs => CharEntropy(exprs.head)))
    // TokenProfile is deliberately NOT SQL-registered: its stopword-list
    // parameter is builder-side configuration (Seq[Seq[String]]), not a
    // SQL literal — Column-API users get it via TokenProfileFunctions.
    // Same call for the r10 expressions: NearestCentroidId/-Ids carry a
    // centroid MATRIX, BloomAnyContainLong a built BloomFilter, and the
    // PqEncode/PqLut/PqAdcDist family a codebook matrix — model state
    // that has no SQL-literal spelling. Column-API users get them via
    // VectorFunctions.nearest_centroid_id(s) / BloomFunctions /
    // PqFunctions.
  }
}
