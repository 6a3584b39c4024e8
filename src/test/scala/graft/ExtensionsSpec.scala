package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the native expressions as SQL functions at
  * session build time (`spark.sql.extensions=graft.GraftExtensions`). The
  * spec builds a second SparkSession over the shared SparkContext with the
  * extensions installed (clearing the active/default session so the builder
  * actually constructs one) and drives every registered function from pure
  * SQL, then restores the shared session for the other suites. */
class ExtensionsSpec extends SparkSpec {

  test("all native functions are callable from pure SQL via extensions") {
    val base = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = ext.sql(
        """SELECT
          |  cosine_sim(array(1.0D, 0.0D), array(2.0D, 0.0D)) AS cos,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  size(shingle_hashes(array('a', 'b', 'c'), 2)) AS n_shingles,
          |  srp_signature(array(1.0D, -1.0D, 0.5D), 8) AS sig
          |""".stripMargin).head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) == 11.0)
      assert(row.getInt(2) == 2)
      // signature is hash-derived but deterministic: same input -> same long
      val again = ext.sql(
        "SELECT srp_signature(array(1.0D, -1.0D, 0.5D), 8)").head().getLong(0)
      assert(row.getLong(3) == again)
      // round-4 per-row fold expressions, from pure SQL, each pinned to its
      // Column-API value on the same input
      val sqlRow = ext.sql(
        """SELECT
          |  minhash_sigs(shingle_hashes(array('a', 'b', 'c'), 2), 4) AS mh,
          |  simhash64(array('a', 'b', 'c')) AS sh,
          |  min_max_xor(shingle_hashes(array('a', 'b', 'c'), 2)) AS mmx
          |""".stripMargin).head()
      import org.apache.spark.sql.functions.{array, lit}
      val apiRow = ext.range(1).select(
        graft.functions.MinHashFunctions.minhash_sigs(
          graft.functions.ShingleFunctions.shingle_hashes(
            array(lit("a"), lit("b"), lit("c")), 2), 4).as("mh"),
        graft.functions.SimHashFunctions.simhash64(
          array(lit("a"), lit("b"), lit("c"))).as("sh"),
        graft.functions.MinMaxXorFunctions.min_max_xor(
          graft.functions.ShingleFunctions.shingle_hashes(
            array(lit("a"), lit("b"), lit("c")), 2)).as("mmx")).head()
      assert(sqlRow.getSeq[Long](0) == apiRow.getSeq[Long](0))
      assert(sqlRow.getLong(1) == apiRow.getLong(1))
      assert(sqlRow.get(2) == apiRow.get(2))
      // r10: char_entropy from pure SQL ('ab' = 1 bit)
      assert(ext.sql("SELECT char_entropy('ab')").head().getDouble(0) == 1.0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
