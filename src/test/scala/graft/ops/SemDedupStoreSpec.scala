package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SemDedupStore]] — shard-incremental SemDeDup: union equivalence with
  * the batch operator, cross-shard retraction, idempotent re-ingest, and
  * the giant-cluster guard. */
class SemDedupStoreSpec extends SparkSpec {

  import spark.implicits._

  // two well-separated direction clusters plus exact-ish near-dups:
  // ids 1..4 around (1,0), ids 11..12 around (0,1)
  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "v")

  private val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    .toDF("cid", "cv")

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"semstore_$tag").toString + "/store"

  private def state(root: String) =
    SemDedupStore.currentState(spark, root)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getBoolean(4)))

  test("incremental state equals batch semanticDedup over the union") {
    val root = freshRoot("eq")
    val s1 = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.02)),
      (11L, Seq(0.0, 1.0)))
    val s2 = vecs((3L, Seq(1.0, 0.01)), (12L, Seq(0.02, 1.0)))
    SemDedupStore.buildStore(s1, "vec_id", "v", cents, "cid", "cv",
      0.95, root, "s1")
    SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "s2")
    val batch = Dedup.semanticDedup(s1.unionByName(s2), "vec_id", "v",
        cents, "cid", "cv", 0.95)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getBoolean(4)))
    assert(state(root).toSeq === batch.toSeq)
  }

  test("a cross-shard pair retracts a previously kept vector") {
    val root = freshRoot("retract")
    // shard 1: one vector very close to centroid 0 — kept after build
    val s1 = vecs((1L, Seq(1.0, 0.001)))
    SemDedupStore.buildStore(s1, "vec_id", "v", cents, "cid", "cv",
      0.95, root, "s1")
    assert(state(root).toSeq === Seq((1L, 0L, false, true)))
    // shard 2: a near-dup FARTHER from the centroid — the keep-the-
    // outlier rule keeps the newcomer and retracts the s1 vector
    val s2 = vecs((2L, Seq(1.0, 0.2)))
    SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "s2")
    val got = state(root).toSeq
    assert(got === Seq((1L, 0L, true, false), (2L, 0L, true, true)),
      got.toString)
  }

  test("re-ingesting the same shard id is idempotent (crash-retry contract)") {
    val root = freshRoot("idem")
    val s1 = vecs((1L, Seq(1.0, 0.0)), (11L, Seq(0.0, 1.0)))
    val s2 = vecs((2L, Seq(1.0, 0.01)))
    SemDedupStore.buildStore(s1, "vec_id", "v", cents, "cid", "cv",
      0.95, root, "s1")
    SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "s2")
    val once = state(root).toSeq
    // retry the same shard (as after a crash): same state, no dup rows
    SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "s2")
    assert(state(root).toSeq === once)
  }

  test("maxClusterSize refuses a giant touched cluster, naming the mitigation") {
    val root = freshRoot("guard")
    val s1 = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.01)))
    SemDedupStore.buildStore(s1, "vec_id", "v", cents, "cid", "cv",
      0.95, root, "s1")
    val s2 = vecs((3L, Seq(1.0, 0.02)), (4L, Seq(1.0, 0.03)))
    val e = intercept[IllegalArgumentException] {
      SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "s2",
        maxClusterSize = 3L)
    }
    assert(e.getMessage.contains("re-train with more centroids"), e.getMessage)
    // the refused ingest wrote nothing: state is still shard-1 only
    assert(state(root).map(_._1).toSeq === Seq(1L, 2L))
  }

  test("cold start: empty build, then shard ingests equal the batch answer") {
    // the r12 streamed-ingest failure mode: an empty build leaves
    // assign/ as an EMPTY DIR; the next ingest's prior read must not
    // resolve it with an empty partition schema (persist + the same
    // ingest's write then recaches a file index whose new files carry
    // a partition column the reader didn't plan for — the
    // ParquetFileFormat partitionValues assert)
    val root = freshRoot("cold")
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "v")
    SemDedupStore.buildStore(empty, "vec_id", "v", cents, "cid", "cv",
      0.95, root, "s0")
    assert(state(root).isEmpty)
    val s1 = vecs((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.02)))
    val s2 = vecs((3L, Seq(1.0, 0.01)), (11L, Seq(0.0, 1.0)))
    SemDedupStore.addShard(spark, root, s1, "vec_id", "v", "b0")
    SemDedupStore.addShard(spark, root, s2, "vec_id", "v", "b1")
    val batch = Dedup.semanticDedup(s1.unionByName(s2), "vec_id", "v",
        cents, "cid", "cv", 0.95)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getBoolean(4)))
    assert(state(root).toSeq === batch.toSeq)
  }

  test("threshold round-trips through meta; mismatched centroids stay frozen") {
    val root = freshRoot("meta")
    val s1 = vecs((1L, Seq(1.0, 0.0)))
    SemDedupStore.buildStore(s1, "vec_id", "v", cents, "cid", "cv",
      0.9, root, "s1")
    assert(SemDedupStore.readMeta(spark, root) === 0.9)
  }
}
