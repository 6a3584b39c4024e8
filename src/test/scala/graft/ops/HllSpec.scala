package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Hll]] — portable HyperLogLog registers, estimator accuracy, the
  * max-merge algebra the persisted store relies on, and the plan shape
  * (one exchange for the register aggregate; partial aggregation bounds
  * what it carries). */
class HllSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def tokFrame(n: Int, tag: String = "t"): DataFrame =
    spark.range(n.toLong).select(concat(lit(s"${tag}_"), col("id"))
      .as("tok"))

  test("Md5HllRegister: native (bucket, rho) equals the column spelling bit-for-bit") {
    // r16 rewrite pin: registers() now computes both coordinates from
    // one native digest; bucketExpr/rhoExpr stay as the oracle/spec
    // reference. Pinned across precisions on unicode/empty/dense
    // tokens (dense enough that some suffixes start with 1-bits at
    // several depths).
    import org.apache.spark.sql.functions._
    val toks = (Seq("", "中文", "🙂x") ++ (1 to 500).map(i => s"tok$i"))
      .toDF("t")
    for (p <- Seq(7, 12, 16)) {
      val native = toks.select($"t", graft.functions.Md5ShingleFunctions
        .md5_hll_register($"t", p).as("r"))
        .select($"t", $"r.bucket".as("b"), $"r.rho".as("rho"))
      val old = toks.select($"t", graft.ops.Hll.bucketExpr($"t", p).as("b"),
        graft.ops.Hll.rhoExpr($"t", p).as("rho"))
      assert(native.exceptAll(old).count() === 0L)
      assert(old.exceptAll(native).count() === 0L)
    }
  }

  test("registers are partition-invariant and <= m rows") {
    val df = tokFrame(5000)
    val a = Hll.registers(df, "tok").orderBy("bucket").collect().toSeq
    val b = Hll.registers(df.repartition(7), "tok")
      .orderBy("bucket").collect().toSeq
    assert(a == b)
    assert(a.size <= 1024)
    // duplicate occurrences do not move any register (max is idempotent)
    val c = Hll.registers(df.union(df), "tok").orderBy("bucket")
      .collect().toSeq
    assert(a == c)
  }

  test("estimate within the HLL error envelope at several scales") {
    // stderr ~= 1.04/sqrt(1024) ~= 3.3%; 4 sigma with margin. md5 is
    // fixed, so these are deterministic once green.
    for (n <- Seq(100, 1000, 20000)) {
      val est = Hll.build(tokFrame(n), "tok").estimate
      assert(math.abs(est - n) <= math.max(0.15 * n, 4.0),
        s"n=$n est=$est")
    }
  }

  test("distributed estimate() equals the driver sketch estimate") {
    val df = tokFrame(3000)
    val viaDf = Hll.estimate(Hll.registers(df, "tok"))
      .select(col("est")).collect()(0).getDouble(0)
    assert(viaDf == Hll.build(df, "tok").estimate)
  }

  test("merge algebra: build(A++B) == build(A) merge build(B); idempotent") {
    val a = tokFrame(800, "a")
    val b = tokFrame(1200, "b")
    val whole = Hll.build(a.union(b), "tok")
    val merged = Hll.build(a, "tok").merge(Hll.build(b, "tok"))
    assert(whole.regs.sameElements(merged.regs))
    assert(merged.merge(Hll.build(b, "tok")).regs.sameElements(merged.regs))
  }

  test("store round-trips, ingests incrementally, survives an empty shard") {
    val root = Files.createTempDirectory("hll_store").toString
    val empty = Hll.Sketch(10, new Array[Int](1024))
    Hll.write(spark, empty, s"$root/s")
    assert(Hll.read(spark, s"$root/s").regs.forall(_ == 0))
    // first real shard merges into the all-zero store
    val a = Hll.build(tokFrame(500, "a"), "tok")
    assert(Hll.ingest(spark, s"$root/s", a).regs.sameElements(a.regs))
    // second shard: store == whole-corpus sketch; re-ingest is a no-op
    val b = Hll.build(tokFrame(700, "b"), "tok")
    val whole = Hll.build(tokFrame(500, "a").union(tokFrame(700, "b")), "tok")
    assert(Hll.ingest(spark, s"$root/s", b).regs.sameElements(whole.regs))
    assert(Hll.ingest(spark, s"$root/s", b).regs.sameElements(whole.regs))
    assert(Hll.read(spark, s"$root/s").regs.sameElements(whole.regs))
  }

  test("precision/dimension guards") {
    intercept[IllegalArgumentException](Hll.alpha(5))
    intercept[IllegalArgumentException](Hll.Sketch(10, new Array[Int](10)))
    val s1 = Hll.Sketch(10, new Array[Int](1024))
    val s2 = Hll.Sketch(11, new Array[Int](2048))
    intercept[IllegalArgumentException](s1.merge(s2))
  }

  test("register plan: exactly one exchange, grouped path included") {
    val df = tokFrame(2000).withColumn("src",
      (expr("xxhash64(tok)") % 3).cast("int"))
    for (grouped <- Seq(Nil, Seq("src"))) {
      val regs = Hll.registers(df, "tok", grouped)
      regs.collect()
      val plan = regs.queryExecution.executedPlan
      val exchanges = collect(plan) { case e: ShuffleExchangeLike => e }
      assert(exchanges.size == 1, regs.queryExecution.executedPlan.toString)
    }
  }
}
