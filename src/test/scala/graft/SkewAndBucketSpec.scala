package graft

import org.apache.spark.sql.execution.exchange.Exchange

import graft.ops.Skew
import graft.sinks.Sinks

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed fact: 900 rows on key "hot", a few elsewhere
  private lazy val fact = (Seq.fill(900)("hot") ++ Seq("a", "b", "c"))
    .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "v")
  private lazy val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("z", "Z"))
    .toDF("key", "label")

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = fact.join(dim, Seq("key")).select("key", "v", "label")
      .as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 4)
      .select("key", "v", "label").as[(String, Int, String)].collect().toSet
    assert(salted == plain && plain.size == 902)
  }

  test("saltedJoin spreads the hot key across salt sub-keys") {
    val salts = fact.withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.struct($"key", $"v")),
          org.apache.spark.sql.functions.lit(4)))
      .filter($"key" === "hot").select("__salt").distinct().count()
    assert(salts > 1) // hot rows no longer land on a single reducer key
  }

  test("saltedJoin rejects right/full outer, accepts semi/anti aliases") {
    // right/full outer would emit one unmatched dim copy PER SALT
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "key", joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "key", joinType = "right")
    }
    // Spark treats bare "semi"/"anti" as left_semi/left_anti -- so do we
    assert(Skew.saltedJoin(fact, dim, "key", joinType = "semi").count() == 902)
    assert(Skew.saltedJoin(fact, dim, "key", joinType = "anti").count() == 1)
  }

  test("skewedCountDistinct matches plain countDistinct") {
    val df = (Seq.fill(500)(("hot", "x")) ++
      Seq(("hot", "y"), ("hot", "z"), ("cold", "x"))).toDF("key", "v")
    val plain = df.groupBy("key")
      .agg(org.apache.spark.sql.functions.countDistinct("v").as("d"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.skewedCountDistinct(df, "key", "v", salts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == plain && plain("hot") == 3L)
  }
}

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges (pay the shuffle at write time)") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    Sinks.writeBucketed(left, "graft_bkt_left", Seq("id"), 4)
    Sinks.writeBucketed(right, "graft_bkt_right", Seq("id"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), Seq("id"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty, "bucketed join must not re-shuffle")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
