package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KllQuantile

/** [[Kll]] / [[graft.functions.KllQuantile]] — exact-regime equality
  * with a full sort, partition invariance, over-capacity rank envelope,
  * merge algebra, and the single-exchange plan shape. */
class KllSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  // deterministic value stream: md5-scrambled but reproducible
  private def vals(n: Int, groups: Int = 1): DataFrame =
    spark.range(n.toLong).select(
      (col("id") % groups).cast("int").as("g"),
      conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
        .cast("double").as("v"))

  test("exact regime: sketch quantiles equal the sorted-group truth") {
    val df = vals(600, groups = 4) // 150 per group < k
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val got = Kll.quantiles(df, "v", Seq("g"), probs, k = 256)
      .orderBy("g", "p").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val truth = df.collect().map(r => (r.getInt(0), r.getDouble(1)))
      .groupBy(_._1).flatMap { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        probs.map { p =>
          val tgt = math.max(1L, math.ceil(p * sorted.length).toLong).toInt
          (g, p, sorted(tgt - 1), sorted.length.toLong)
        }
      }.toSeq.sorted
    assert(got.toSeq.sorted == truth)
    // partition-invariant in the exact regime
    val re = Kll.quantiles(df.repartition(7), "v", Seq("g"), probs, k = 256)
      .orderBy("g", "p").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(re.toSeq.sorted == truth)
  }

  test("exact regime boundary: a group of EXACTLY n == k values stays exact") {
    // r11 advice: reduce() compacted at length == k, so the exactly-full
    // group silently lost exactness one row early. The trigger is now
    // strictly-greater: n == k must equal the full-sort truth.
    val k = 64
    val df = vals(k)
    val sorted = df.select("v").as[Double].collect().sorted
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Kll.quantiles(df, "v", Nil, probs, k = k)
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    probs.sorted.zip(got).foreach { case (p, (gp, q)) =>
      val tgt = math.max(1L, math.ceil(p * k).toLong).toInt
      assert(gp === p && q === sorted(tgt - 1), s"p=$p")
    }
    // and partition invariance still holds right at the boundary
    val re = Kll.quantiles(df.repartition(5), "v", Nil, probs, k = k)
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(re.toSeq === got.toSeq)
  }

  test("over-capacity: true rank of each estimate within the envelope") {
    val n = 40000
    val df = vals(n)
    val sorted = df.select("v").as[Double].collect().sorted
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val q = Kll.quantiles(df, "v", Nil, Seq(p), k = 64)
        .select("q").as[Double].collect()(0)
      // true rank of the returned value vs target rank, as a fraction
      val rank = sorted.count(_ <= q)
      val err = math.abs(rank - p * n) / n
      assert(err <= 0.05, s"p=$p err=$err (rank=$rank)")
    }
  }

  test("merge algebra: reduce-then-merge across splits tracks the truth") {
    // same data through different partitionings must stay inside the
    // envelope (bit-equality is NOT promised over capacity; the bound is)
    val n = 20000
    val df = vals(n)
    val sorted = df.select("v").as[Double].collect().sorted
    for (parts <- Seq(2, 13)) {
      val q = Kll.quantiles(df.repartition(parts), "v", Nil, Seq(0.5), k = 64)
        .select("q").as[Double].collect()(0)
      val rank = sorted.count(_ <= q)
      assert(math.abs(rank - 0.5 * n) / n <= 0.05, s"parts=$parts rank=$rank")
    }
  }

  test("nulls are dropped, not counted as zeros") {
    val df = Seq[(Integer, java.lang.Double)]((1, 5.0), (1, null),
      (1, 7.0), (1, 9.0)).toDF("g", "v")
    val got = Kll.quantiles(df, "v", Seq("g"), Seq(0.5), k = 64)
      .select("q", "n_exact").collect()(0)
    assert(got.getDouble(0) == 7.0 && got.getLong(1) == 3L)
  }

  test("guards: bad probs, tiny k, empty sketch") {
    intercept[IllegalArgumentException](
      Kll.quantiles(vals(10), "v", Nil, Seq(1.5)))
    intercept[IllegalArgumentException](new KllQuantile(4))
    intercept[IllegalArgumentException](
      KllQuantile.quantile(Array.empty, Array.empty, 0L, 0.5))
  }

  test("plan: one exchange for the sketch aggregate") {
    val q = Kll.quantiles(vals(5000, groups = 3), "v", Seq("g"), Seq(0.5),
      k = 64)
    q.collect()
    val exchanges = collect(q.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }
    assert(exchanges.size == 1, q.queryExecution.executedPlan.toString)
  }
}
