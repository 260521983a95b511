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

  test("streaming vector gate: indexed dup quarantined, within-batch min kept, replay idempotent, stream index effective") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vi_gate_").toString
    val (si, cd, dd) = (s"$root/stream", s"$root/clean", s"$root/dup")
    VectorIndex.build(vecs, s"$root/index")
    // fixture vectors are 64-dim floats; craft arrivals against them
    val dim = 64
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.01f)
    val copyOf5 = vecs.filter(col("vec_id") === 5).head().getSeq[Float](1).toArray
    val batch1 = Seq(
      (1000L, copyOf5),     // near-dup of an INDEXED vector -> quarantine
      (1001L, oneHot(0)),   // fresh -> clean
      (1002L, oneHot(1)),   // within-batch identical pair:
      (1003L, oneHot(1)))   //   min id 1002 kept, 1003 quarantined
      .toDF("vec_id", "embedding")
    graft.streaming.Events.vectorDedupGateBatch(s"$root/index", si, cd, dd,
      threshold = 0.95)(batch1, 0L)
    def ids(dir: String) = spark.read.parquet(dir).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids(dd) === Set(1000L, 1003L))
    assert(ids(cd) === Set(1001L, 1002L))
    assert(ids(si) === Set(1001L, 1002L), "only clean assignments enter the stream index")
    // replay the same batch id: stream index partition overwritten, not duplicated
    graft.streaming.Events.vectorDedupGateBatch(s"$root/index", si, cd, dd,
      threshold = 0.95)(batch1, 0L)
    assert(spark.read.parquet(si).count() === 2)
    // batch 2: near-dup of a BATCH-1 clean vector -> the stream index catches it
    val batch2 = Seq((2000L, oneHot(1))).toDF("vec_id", "embedding")
    graft.streaming.Events.vectorDedupGateBatch(s"$root/index", si, cd, dd,
      threshold = 0.95)(batch2, 1L)
    assert(ids(dd).contains(2000L), "stream-index accumulation must gate later batches")
  }

  test("PQ tier: addShardPq freezes the books; shard-encode ≡ full re-encode") {
    val dir = java.nio.file.Files.createTempDirectory("vi_pq_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    val shard = vecs.filter(col("vec_id") % 3 === 0)
    VectorIndex.build(base, dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    val b0 = VectorIndex.pqBooksVersion(spark, dir)
    assert(b0.nonEmpty, "buildPq must commit a books version")
    VectorIndex.addShard(shard, dir)
    VectorIndex.addShardPq(shard, dir, m = 4, dim = 64)
    assert(VectorIndex.pqBooksVersion(spark, dir) === b0,
      "shard arrival must never retrain/rewrite the sub-codebooks")
    // incremental codes ≡ one full encode of everything against the
    // same frozen codebook+books (per-row argmin over fixed books —
    // the invariant that makes the incremental path safe)
    def codeMap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "block", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val incremental = codeMap(VectorIndex.pqCodes(spark, dir))
    // full re-encode: residuals of EVERY vector against the frozen
    // codebook, encoded against the frozen books in one pass
    val cents = VectorIndex.codebook(spark, dir)
    val res = Similarity.ivfAssign(vecs, cents)
      .join(broadcast(cents), Seq("centroid_id"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("c_emb"), (x, y) => x - y).as("embedding"))
    val full = codeMap(
      Similarity.pqAssign(res, VectorIndex.pqBooks(spark, dir), m = 4, dim = 64)
        .select(col("vec_id"), col("block"), col("code")))
    assert(incremental === full)
    assert(incremental.size === vecs.count() * 4, "m code rows per vector")
  }

  test("PQ tier: re-embedded vector's codes REPLACE on arrival (all m rows)") {
    val dir = java.nio.file.Files.createTempDirectory("vi_pq_upsert_").toString
    VectorIndex.build(vecs, dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    val n0 = VectorIndex.pqCodes(spark, dir).count()
    val reembedded = vecs.filter(col("vec_id") === 7)
      .withColumn("embedding", reverse(col("embedding")))
    VectorIndex.addShard(reembedded, dir)
    VectorIndex.addShardPq(reembedded, dir, m = 4, dim = 64)
    val after = VectorIndex.pqCodes(spark, dir)
    assert(after.count() === n0, "delete-then-insert by vec_id, not append")
    assert(after.filter(col("vec_id") === 7).count() === 4,
      "exactly m code rows for the re-embedded id")
  }

  test("PQ serve-from-artifact ≡ recompute with the same committed artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("vi_pq_serve_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    VectorIndex.build(base, dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    VectorIndex.addShardPq(vecs.filter(col("vec_id") % 3 === 0), dir,
      m = 4, dim = 64)
    val queries = vecs.filter(col("vec_id") < 3)
    val served = VectorIndex.pqTopKFromIndex(spark, dir, queries,
        k = 5, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served.nonEmpty)
    assert(served.forall { case (q, n, d2) => n != q && d2 >= 0.0 },
      "self excluded; ADC sums are sums of squared distances")
    // every served neighbor must live in a cell the query probed — the
    // serve path may only touch the committed inverted lists it ranked
    val cellOf = VectorIndex.pqCodes(spark, dir)
      .select("vec_id", "centroid_id").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = VectorIndex.codebook(spark, dir)
    val probed = graft.operators.Relational.topNPerGroup(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            Similarity.norm(col("embedding")).as("q_norm"))
          .crossJoin(broadcast(cents.withColumn("c_norm", Similarity.norm(col("c_emb")))))
          .select(col("query_id"), col("centroid_id"),
            (Similarity.dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
              .as("c_sim")),
        4, Seq(col("query_id")), col("c_sim"), col("centroid_id"))
      .select("query_id", "centroid_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(served.forall { case (q, n, _) => probed(q).contains(cellOf(n)) },
      "served neighbors must come from the query's probed cells")
    // and serving is deterministic over the committed snapshot
    val again = VectorIndex.pqTopKFromIndex(spark, dir, queries,
        k = 5, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served === again)
  }

  test("refine: exact cosines, candidates from the ADC shortlist, recall ≥ unrefined") {
    val dir = java.nio.file.Files.createTempDirectory("vi_refine_").toString
    val base = vecs.filter(col("vec_id") % 3 =!= 0)
    VectorIndex.build(base, dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    VectorIndex.addShardPq(vecs.filter(col("vec_id") % 3 === 0), dir, m = 4, dim = 64)
    val queries = vecs.filter(col("vec_id") < 4)
    val refined = VectorIndex.pqTopKRefined(spark, dir, queries, vecs,
        k = 5, rerank = 20, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // refine scores are the EXACT cosines — bit-equal to brute force on the pair
    val brute = Similarity.bruteForceTopK(vecs, queries, vecs.count().toInt)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    refined.foreach { case (q, n, c) =>
      assert(c === brute((q, n)), s"refined cosine for ($q,$n) must be exact") }
    // shortlist containment: every refined neighbor survives the deeper ADC cut
    val adcDeep = VectorIndex.pqTopKFromIndex(spark, dir, queries,
        k = 20, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    refined.foreach { case (q, n, _) => assert(adcDeep.contains((q, n))) }
    // refine can only help: recall@5 vs exact ≥ the unrefined ADC ranking's
    val exact5 = brute.keys.groupBy(_._1).view
      .mapValues(ks => ks.toSeq.sortBy(k => (-brute(k), k._2)).take(5).map(_._2).toSet).toMap
    val unref5 = VectorIndex.pqTopKFromIndex(spark, dir, queries,
        k = 5, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref5 = refined.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(m: Map[Long, Set[Long]]) =
      m.map { case (q, ns) => ns.count(exact5(q)) }.sum.toDouble / (exact5.size * 5)
    assert(recall(ref5) >= recall(unref5),
      s"refined recall ${recall(ref5)} < unrefined ${recall(unref5)}")
  }

  test("forget: raw-embedding rows and PQ codes leave; params frozen; centroid corner refuses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vi_forget_").toString
    VectorIndex.build(vecs.filter(col("vec_id") % 3 =!= 0), dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    VectorIndex.addShard(vecs.filter(col("vec_id") % 3 === 0), dir)
    VectorIndex.addShardPq(vecs.filter(col("vec_id") % 3 === 0), dir, m = 4, dim = 64)
    val cbv = VectorIndex.codebookVersion(spark, dir)
    val bkv = VectorIndex.pqBooksVersion(spark, dir)
    val centroidIds = VectorIndex.codebook(spark, dir)
      .select("centroid_id").collect().map(_.getLong(0)).toSet
    val goners = vecs.select("vec_id").collect().map(_.getLong(0))
      .filterNot(centroidIds).take(5).toSeq
    val before = VectorIndex.assigned(spark, dir).count()
    VectorIndex.forget(spark, goners.toDF("vec_id"), dir)
    val after = VectorIndex.assigned(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(goners.forall(!after(_)) && after.size === (before - goners.size).toInt)
    val codeIds = VectorIndex.pqCodes(spark, dir)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(goners.forall(!codeIds(_)))
    // trained parameters stay frozen (no retrain, no rewrite)
    assert(VectorIndex.codebookVersion(spark, dir) === cbv)
    assert(VectorIndex.pqBooksVersion(spark, dir) === bkv)
    // id-sample centroid corner: refuse rather than silently retain
    intercept[IllegalArgumentException] {
      VectorIndex.forget(spark, Seq(centroidIds.min).toDF("vec_id"), dir)
    }
    // idempotent: forgetting again (or an absent id) is a clean no-op
    VectorIndex.forget(spark, (goners :+ -999L).toDF("vec_id"), dir)
    assert(VectorIndex.assigned(spark, dir).count() === after.size.toLong)
  }

  test("streaming vector maintenance: both tiers per batch; replay idempotent; params frozen") {
    val dir = java.nio.file.Files.createTempDirectory("vi_stream_pq_").toString
    VectorIndex.build(vecs.filter(col("vec_id") % 3 === 1), dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    val cbv = VectorIndex.codebookVersion(spark, dir)
    val bkv = VectorIndex.pqBooksVersion(spark, dir)
    val b0 = vecs.filter(col("vec_id") % 3 === 2)
    val b1 = vecs.filter(col("vec_id") % 3 === 0)
    graft.streaming.Events.vectorIndexMaintainBatch(dir, m = 4, dim = 64)(b0, 0L)
    graft.streaming.Events.vectorIndexMaintainBatch(dir, m = 4, dim = 64)(b1, 1L)
    def codeMap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "block", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val streamed = codeMap(VectorIndex.pqCodes(spark, dir))
    assert(streamed.size === vecs.count() * 4, "m code rows per vector, all arrived")
    assert(VectorIndex.assigned(spark, dir).count() === vecs.count())
    // checkpoint-recovery replay of batch 1: delete-then-insert by
    // vec_id makes it a no-op on the final state
    graft.streaming.Events.vectorIndexMaintainBatch(dir, m = 4, dim = 64)(b1, 1L)
    assert(codeMap(VectorIndex.pqCodes(spark, dir)) === streamed)
    assert(VectorIndex.assigned(spark, dir).count() === vecs.count())
    // nothing retrained on any arrival
    assert(VectorIndex.codebookVersion(spark, dir) === cbv)
    assert(VectorIndex.pqBooksVersion(spark, dir) === bkv)
  }

  test("forgetAndRebuild: the refused centroid request is honored by retraining every tier") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vi_rebuild_").toString
    VectorIndex.build(vecs, dir)
    VectorIndex.buildPq(spark, dir, m = 4, c = 16, dim = 64)
    val cbv = VectorIndex.codebookVersion(spark, dir)
    val victim = VectorIndex.codebook(spark, dir)
      .select("centroid_id").collect().map(_.getLong(0)).min
    intercept[IllegalArgumentException] {
      VectorIndex.forget(spark, Seq(victim).toDF("vec_id"), dir)
    }
    VectorIndex.forgetAndRebuild(spark, Seq(victim).toDF("vec_id"), dir,
      pq = Some((4, 16, 64)))
    // the id is in NO post-rebuild artifact
    assert(VectorIndex.assigned(spark, dir)
      .filter(col("vec_id") === victim).isEmpty)
    assert(VectorIndex.pqCodes(spark, dir)
      .filter(col("vec_id") === victim).isEmpty)
    assert(VectorIndex.codebook(spark, dir)
      .filter(col("centroid_id") === victim).isEmpty)
    // params were RETRAINED (new versions), and the survivor count holds
    assert(VectorIndex.codebookVersion(spark, dir) !== cbv)
    assert(VectorIndex.assigned(spark, dir).count() === vecs.count() - 1)
    // and the rebuilt artifact still serves
    assert(VectorIndex.topK(spark, dir, vecs.filter(col("vec_id") < 2),
      k = 5, nprobe = 4).count() > 0)
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
