package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0, 2.0, 3.0)),
    (1L, Seq(-1.0f, 0.5f, 2.5f), Seq(4.0, -2.0, 0.1)),
    (2L, Seq(0.0f, 0.0f, 0.0f), Seq(0.0, 0.0, 0.0)))
    .toDF("id", "f", "d")

  test("native cosine_sim matches the built-ins fold bit-for-bit (float and double)") {
    val rows = vecs.crossJoin(vecs.select($"f".as("f2"), $"d".as("d2")))
      .select(
        VectorFunctions.cosine_sim($"f", $"f2").as("native_ff"),
        Similarity.cosineBuiltins($"f", $"f2").as("fold_ff"),
        VectorFunctions.cosine_sim($"d", $"d2").as("native_dd"),
        Similarity.cosineBuiltins($"d", $"d2").as("fold_dd"),
        VectorFunctions.cosine_sim($"f", $"d2").as("native_fd"),
        Similarity.cosineBuiltins($"f", $"d2").as("fold_fd"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "float/float")
      assert(r.getDouble(2) == r.getDouble(3), "double/double")
      assert(r.getDouble(4) == r.getDouble(5), "float/double mixed")
    }
  }

  test("zero vectors yield 0.0, not NaN; nulls propagate") {
    val out = vecs.filter($"id" === 2)
      .select(VectorFunctions.cosine_sim($"f", $"f")).as[Double].head()
    assert(out == 0.0)
    val withNull = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VectorFunctions.cosine_sim($"a", $"b")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("dot_product computes exact dot; SQL registration exposes both functions") {
    val d = vecs.filter($"id" === 0)
      .select(VectorFunctions.dot_product($"f", $"d")).as[Double].head()
    assert(d == 14.0) // 1+4+9
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_tmp")
    val viaSql = spark.sql(
      "SELECT cosine_sim(f, f) c, dot_product(d, d) p FROM vecs_tmp WHERE id = 0")
      .as[(Double, Double)].head()
    assert(math.abs(viaSql._1 - 1.0) < 1e-12 && viaSql._2 == 14.0)
  }

  test("type check rejects non-array inputs with a clear error") {
    val e = intercept[Exception] {
      vecs.select(VectorFunctions.cosine_sim($"id", $"f")).collect()
    }
    assert(e.getMessage.contains("array") || e.getMessage.contains("DATATYPE"))
  }
}
