package graft

import org.apache.spark.sql.functions._

import graft.functions.{Similarity, VectorIndex}
import graft.pipeline.AtomicTable

/** The persisted-index lifecycle invariants VectorIndex promises
  * (VERDICT r10 item 5 — the q101 incremental discipline for ANN). */
class VectorIndexSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf)

  test("addShard freezes the codebook: version identical before and after") {
    val dir = java.nio.file.Files.createTempDirectory("vi_frozen_").toString
    VectorIndex.build(vecs.filter(col("vec_id") % 3 =!= 0), dir)
    val v0 = VectorIndex.codebookVersion(spark, dir)
    assert(v0.nonEmpty, "build must commit a codebook version")
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    assert(VectorIndex.codebookVersion(spark, dir) === v0,
      "shard arrival must not retrain/rewrite the codebook artifact")
  }

  test("incremental assign ≡ full assign against the same frozen codebook") {
    val dir = java.nio.file.Files.createTempDirectory("vi_incr_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    val shard = vecs.filter(col("vec_id") % 3 === 0)
    VectorIndex.build(base, dir)
    VectorIndex.addShard(shard, dir)
    val incremental = VectorIndex.assigned(spark, dir)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Similarity.ivfAssign(vecs, VectorIndex.codebook(spark, dir))
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental === full)
  }

  test("probe(index after addShard) ≡ probe(full recompute) — same neighbors, same cosines") {
    val dir = java.nio.file.Files.createTempDirectory("vi_probe_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    val shard = vecs.filter(col("vec_id") % 3 === 0)
    VectorIndex.build(base, dir)
    VectorIndex.addShard(shard, dir)
    val queries = vecs.filter(col("vec_id") < 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = key(VectorIndex.topK(spark, dir, queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id", "cos_sim"))
    val cents = VectorIndex.codebook(spark, dir)
    val viaFull = key(Similarity.ivfTopK(Similarity.ivfAssign(vecs, cents), cents,
        queries, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id", "cos_sim"))
    assert(viaIndex === viaFull)
  }

  test("re-embedded vectors UPDATE on shard arrival (upsert, not append)") {
    val dir = java.nio.file.Files.createTempDirectory("vi_upsert_").toString
    VectorIndex.build(vecs, dir)
    val n0 = VectorIndex.assigned(spark, dir).count()
    // re-deliver an existing id with a different embedding: the index
    // must keep ONE row per vec_id, re-assigned under the new vector
    val reembedded = vecs.filter(col("vec_id") === 7)
      .withColumn("embedding", reverse(col("embedding")))
    VectorIndex.addShard(reembedded, dir)
    val after = VectorIndex.assigned(spark, dir)
    assert(after.count() === n0, "upsert must replace, not duplicate")
    val expected = Similarity
      .ivfAssign(reembedded, VectorIndex.codebook(spark, dir))
      .select("centroid_id").head().getLong(0)
    assert(after.filter(col("vec_id") === 7).select("centroid_id")
      .head().getLong(0) === expected)
  }

  test("shard arrivals commit as AtomicTable versions (snapshot isolation for probes)") {
    val dir = java.nio.file.Files.createTempDirectory("vi_versions_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    VectorIndex.build(base, dir)
    val preShard = AtomicTable.versions(spark, s"$dir/assigned")
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    val postShard = AtomicTable.versions(spark, s"$dir/assigned")
    assert(postShard.size === preShard.size + 1,
      "each shard arrival is one committed version")
    // the pre-shard snapshot is still readable (concurrent probes hold it)
    val baseCount = base.count()
    assert(AtomicTable.readVersion(spark, s"$dir/assigned", preShard.last)
      .count() === baseCount)
  }

  test("trained-Lloyd production path: build + addShard + probe runs end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("vi_trained_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    VectorIndex.build(base, dir, trained = true)
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    assert(VectorIndex.assigned(spark, dir).count() === vecs.count())
    val out = VectorIndex.topK(spark, dir, vecs.filter(col("vec_id") < 2),
      k = 5, nprobe = 4)
    assert(out.count() > 0)
  }
}
