package graft

import org.apache.spark.sql.functions._
import graft.functions.{Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k: k rows per query, ranks contiguous, self excluded") {
    val vecs = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 3), 5).cache()
    assert(out.count() === 15)
    assert(out.filter(col("neighbor_id") === col("query_id")).isEmpty)
    val perQ = out.groupBy("query_id").agg(max("rank").as("m"), count(lit(1)).as("n"))
    assert(perQ.filter(col("m") =!= 5 || col("n") =!= 5).isEmpty)
    // ranks ordered by cosine desc within each query
    val rows = out.orderBy("query_id", "rank")
      .select("query_id", "cos_sim").collect().grouped(5)
    rows.foreach { g =>
      val sims = g.map(_.getDouble(1))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("IVF recall@10 vs brute force ≥ 0.4 with 4/16 probes") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.centroids(vecs, 16)
    val approx = Similarity.ivfTopK(Similarity.ivfAssign(vecs, cents), cents, queries, 10, 4)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("k-means refinement: recall@10 ≥ id-sample centroids' recall") {
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val approx = Similarity.ivfTopK(Similarity.ivfAssign(vecs, cents), cents, queries, 10, 4)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val base = recall(Similarity.centroids(vecs, 16))
    val trained = recall(Similarity.kmeansCentroids(vecs, 16, iters = 2, dim = 64))
    info(f"recall id-sample=$base%.2f kmeans=$trained%.2f")
    assert(trained >= base - 0.1, s"kmeans recall $trained much worse than $base")
    assert(trained >= 0.4)
  }

  test("trained √n codebook: c=⌈√n⌉ centroids, recall@10 ≥ 0.4 at c/4 probes") {
    val vecs = Tables.embeddings(spark, sf)
    val n = vecs.count()
    val c = Similarity.codebookSize(n)
    val cents = Similarity.trainedCodebook(vecs, n)
    assert(cents.count() === c)
    val queries = vecs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(Similarity.ivfAssign(vecs, cents), cents, queries,
      10, math.max(2, c / 4))
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"n=$n c=$c recall=$recall%.2f")
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("media featurize: deterministic stub decode, byte_len = utf8 length") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    val out = Multimodal.featurize(media).cache()
    assert(out.count() === 500)
    val r = out.filter(col("doc_id") === 0).head()
    val again = Multimodal.featurize(media).filter(col("doc_id") === 0).head()
    assert(r === again) // decode is pure
    assert(out.filter(col("width") < 1 || col("width") > 640).isEmpty)
    assert(out.filter(col("height") < 1 || col("height") > 480).isEmpty)
  }

  test("resize stub: deterministic payload of the target size, metadata updated") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf)).limit(10)
    val a = Multimodal.resizeStub(media, 64, 48).cache()
    assert(a.count() === 10)
    val r = a.filter(col("doc_id") === 0).head()
    assert(r.getAs[String]("media_type") === "image/fake;64x48")
    assert(r.getAs[Array[Byte]]("payload").length === 64 * 48)
    val again = Multimodal.resizeStub(media, 64, 48).filter(col("doc_id") === 0).head()
    assert(r.getAs[Array[Byte]]("payload").toSeq === again.getAs[Array[Byte]]("payload").toSeq)
  }

  test("frame sampling yields stride-spaced offsets") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf)).limit(5)
    val frames = Multimodal.frameSample(media, stride = 16)
    import spark.implicits._
    val bad = frames.filter(col("byte_offset") =!= col("frame_idx") * 16)
    assert(bad.isEmpty && frames.count() >= 5)
  }
}
