package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Dedup, Similarity, Text}
import graft.operators.Relational
import graft.pipeline.Medallion

/** Degenerate-input behavior: empty tables, single rows, empty text,
  * all-null keys. Operators must return empty/identity results, never
  * throw — at 100 TB a daily increment or a pruned partition IS
  * frequently empty. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup family on an empty corpus: empty, not crashed") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").isEmpty)
    val sigs = Dedup.minhashSignatures(emptyDocs, "doc_id", "text", 1, 8)
    assert(sigs.isEmpty)
    assert(Dedup.minhashCandidates(sigs, "doc_id", 8, 4, 0.0).isEmpty)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 3, 0.0).isEmpty)
  }

  test("shingles on docs shorter than n: no grams, never ANSI-throws") {
    // unguarded, sequence(0, size-n) descends for short docs and the
    // out-of-bounds element_at raises under Spark 4 ANSI mode
    val df = Seq((1L, "one"), (2L, "one two"), (3L, "one two three"),
      (4L, ""), (5L, "a b c d")).toDF("doc_id", "text")
    val grams = Dedup.shingles(df, "doc_id", "text", 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grams.get(1L).isEmpty && grams.get(2L).isEmpty && grams.get(4L).isEmpty)
    assert(grams(3L) === 1 && grams(5L) === 2)
    // and the whole minhash/jaccard chain stays alive on a short-doc corpus
    assert(Dedup.minhashSignatures(df, "doc_id", "text", 3, 8).count() === 2)
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0).count() === 0)
  }

  test("md5 hash family: h60 range and minhash hex-vs-long agreement") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta")).toDF("doc_id", "text")
    val h = df.select(graft.functions.Hashes.h60(col("text")).as("h")).collect().map(_.getLong(0))
    assert(h.forall(v => v >= 0 && v < (1L << 60)))
    // hex15 lexicographic min == h60 numeric min over the same grams
    val sigHex = Dedup.minhashSignatures(df, "doc_id", "text", 1, 4, Dedup.Md5SeededHash)
    val sigNum = Dedup.minhashSignatures(df, "doc_id", "text", 1, 4,
      (i, g) => graft.functions.Hashes.h60(concat(lit(s"$i|"), g)))
    val hex = sigHex.orderBy("doc_id").collect().map(r => (1 to 4).map(r.getString))
    val num = sigNum.orderBy("doc_id").collect().map(r => (1 to 4).map(r.getLong))
    assert(hex.map(_.map(java.lang.Long.parseLong(_, 16))) === num)
  }

  test("text functions on empty/whitespace text") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Text.tokenCount(col("text")).as("n"),
      Dedup.simhash(col("text")).as("sh"),
      Text.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    // split(trim("")) yields [""] -> one (empty) token; stable, no throw
    assert(out(1L)._1 === 1 && out(2L)._1 === 1 && out(3L)._1 === 1)
    // empty-ish docs still produce deterministic hashes
    assert(out(1L) === out(2L))
  }

  test("similarity on a single vector: no self-match, empty top-k") {
    val one = Seq((0L, Array(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(one, one, 5).isEmpty)
    val cents = Similarity.centroids(one, 4) // fewer vectors than centroids
    assert(cents.count() === 1)
    assert(Similarity.ivfTopK(Similarity.ivfAssign(one, cents), cents, one, 5, 2).isEmpty)
  }

  test("relational ops with empty or all-null-key sides") {
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val some = Seq((1L, "a")).toDF("k", "v")
    assert(Relational.factJoin(some, empty.withColumnRenamed("v", "w"), "k").isEmpty)
    assert(Relational.semiJoin(some, empty, "k").isEmpty)
    assert(Relational.dimEnrich(some, empty.withColumnRenamed("v", "w"), "k").count() === 1)
    assert(Relational.latestPerKey(empty, "k", col("v")).isEmpty)
    val nulls = Seq((Option.empty[java.lang.Long], "x")).toDF("k", "v")
    // null keys never equi-join
    assert(Relational.factJoin(nulls, some.withColumnRenamed("v", "w"), "k").isEmpty)
  }

  test("watermark probe on empty table -> full-load branch") {
    val empty = Seq.empty[(java.sql.Timestamp, Long)].toDF("t", "id")
    assert(Medallion.highWatermark(empty, "t").isEmpty)
    val src = Seq((java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1L)).toDF("t", "id")
    assert(Medallion.incrementalSlice(src, "t", None).count() === 1)
  }

  test("rerank with all-empty inputs") {
    assert(graft.streaming.Events.rerank(Nil, Nil, Nil) === Nil)
  }

  test("winnowing on empty/short text and empty corpus: fingerprints, never ANSI-throws") {
    assert(Dedup.winnowingFingerprints(emptyDocs, "doc_id", "text").isEmpty)
    // shorter than k: one fingerprint (the whole-text hash); empty text hashes too
    val fps = Dedup.winnowingFingerprints(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0))
    assert(fps.sorted.toSeq === Seq(1L, 2L))
    assert(Dedup.duplicateSpanPairs(emptyDocs, "doc_id", "text").isEmpty)
  }

  test("zorder: bit-boundary inputs stay positive; bits out of range rejected") {
    import graft.functions.ZOrder
    val r = Seq((((1L << 31) - 1), ((1L << 31) - 1))).toDF("a", "b")
      .select(ZOrder.zOrder2(col("a"), col("b"), 31).as("z")).collect().head.getLong(0)
    assert(r === (1L << 62) - 1 && r > 0)
    // values above 2^bits alias onto the grid instead of corrupting sign
    val aliased = Seq((1L << 40, 0L)).toDF("a", "b")
      .select(ZOrder.zOrder2(col("a"), col("b"), 10).as("z")).collect().head.getLong(0)
    assert(aliased === 0L)
    intercept[IllegalArgumentException] { ZOrder.zOrder2(col("a"), col("b"), 32) }
    intercept[IllegalArgumentException] { ZOrder.zOrder2(col("a"), col("b"), 0) }
  }

  test("zorderN: bit-exact interleave, zOrder2 compatibility, injective on the grid, bounds rejected") {
    import graft.functions.ZOrder
    val abc = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (3L, 5L, 6L)).toDF("a", "b", "c")
    // column j's bit i lands at position 3i+j: unit vectors map to 1,2,4
    val z3 = abc.select(ZOrder.zOrderN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z3.take(5) === Seq(0L, 1L, 2L, 4L, 7L))
    // (3,5,6) = a:011 b:101 c:110 → bit-plane interleave, hand-computed
    assert(z3(5) === ((1L << 0) | (1L << 3) | (1L << 1) | (1L << 7) | (1L << 5) | (1L << 8)))
    // n=2 reproduces zOrder2 exactly (shared bit layout)
    val pairs = Seq((7L, 11L), (1023L, 0L), (512L, 513L)).toDF("a", "b")
    val viaN = pairs.select(ZOrder.zOrderN(Seq(col("a"), col("b")), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val via2 = pairs.select(ZOrder.zOrder2(col("a"), col("b"), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaN === via2)
    // injective over a full small grid: 8^3 distinct keys from 8^3 points
    val grid = spark.range(512).select(
      (col("id") % 8).as("a"), (expr("id div 8") % 8).as("b"), expr("id div 64").as("c"))
    assert(grid.select(ZOrder.zOrderN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .distinct().count() === 512)
    intercept[IllegalArgumentException] { ZOrder.zOrderN(Seq(col("a")), 3) }
    intercept[IllegalArgumentException] { ZOrder.zOrderN(Seq(col("a"), col("b"), col("c")), 22) }
    intercept[IllegalArgumentException] { ZOrder.zOrderNSql(Seq("a", "b", "c", "d"), 16) }
  }

  test("profile on empty and all-null-column tables") {
    import graft.pipeline.Profile
    val empty = Profile.profile(emptyDocs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(empty === Map("doc_id" -> ((0L, 0L, 0L)), "text" -> ((0L, 0L, 0L))))
    val nulls = Profile.profile(
      Seq((1L, Option.empty[java.lang.Double]), (2L, Option.empty[java.lang.Double]))
        .toDF("id", "v")).collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.isNullAt(4))).toMap
    // all-null numeric column: 2 nulls, 0 distinct, null min
    assert(nulls("v") === ((2L, 0L, true)))
    assert(nulls("id") === ((0L, 2L, false)))
  }

  test("quality gate with zero rules: everything valid, empty quarantine") {
    import graft.pipeline.Quality
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val (valid, quarantine) = Quality.split(df, Nil)
    assert(valid.count() === 1 && quarantine.isEmpty)
  }

  test("PCA on empty / single-vector inputs: loud failure vs degenerate-but-valid model") {
    import graft.functions.Pca
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Pca.fit(empty, "embedding", 4, 2) }
    intercept[IllegalArgumentException] {
      Pca.fit(Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding"),
        "embedding", 4, 5) // k > dim
    }
    // a single vector has zero covariance: eigenvalues all ~0, projection ~0
    val one = Seq((1L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val m = Pca.fit(one, "embedding", 4, 2)
    assert(m.count === 1L && m.eigenvalues.forall(math.abs(_) < 1e-12))
    val proj = Pca.project(one, m).head().getSeq[Double](1)
    assert(proj.forall(math.abs(_) < 1e-9))
  }

  test("bloom pre-join with an empty build side: empty result, no crash") {
    val items = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val noOrders = Tables.orders(spark, sf)
      .filter(col("o_orderkey") < 0).select("o_orderkey")
    assert(Relational.bloomPreJoin(items, "l_orderkey", noOrders, "o_orderkey", 10L).isEmpty)
  }

  test("frame signatures / video near-dup on empty and sub-stride media: empty, not null") {
    import graft.functions.Multimodal
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.frameSignatures(empty, 16).isEmpty)
    assert(Multimodal.videoNearDupPairs(Multimodal.frameSignatures(empty, 16)).isEmpty)
    assert(Multimodal.alignedMatchPairs(Multimodal.frameSignatures(empty, 16)).isEmpty)
    val short = Seq((1L, "tiny")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    assert(Multimodal.frameSignatures(short, 16).isEmpty)
  }

  test("suffix dedup on empty / all-NULL corpora: empty, not crashed") {
    import graft.functions.SuffixDedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixDedup.duplicateWindows(empty, "doc_id", "text", 4).isEmpty)
    assert(SuffixDedup.duplicateSpans(empty, "doc_id", "text", 4).isEmpty)
    assert(SuffixDedup.cutExactDuplicateSpans(empty, "doc_id", "text", 4).isEmpty)
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(SuffixDedup.duplicateWindows(nulls, "doc_id", "text", 4).isEmpty)
    assert(SuffixDedup.cutExactDuplicateSpans(nulls, "doc_id", "text", 4).isEmpty)
    // win = 1: single-token windows, pure exact-dedup of tokens
    val one = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(SuffixDedup.duplicateWindows(one, "doc_id", "text", 1).count() === 2)
  }

  test("vector index on an empty base: builds, shard assign still works") {
    import graft.functions.VectorIndex
    val vecs = Tables.embeddings(spark, sf)
    val none = vecs.limit(0)
    val dir = java.nio.file.Files.createTempDirectory("vi_empty_").toString
    VectorIndex.build(none, dir) // empty codebook is the correct algebra
    assert(VectorIndex.assigned(spark, dir).isEmpty)
    // a shard arriving against an empty codebook assigns to nothing
    VectorIndex.addShard(vecs.limit(3), dir)
    assert(VectorIndex.assigned(spark, dir).isEmpty)
  }

  test("rrf fusion with empty rank lists: empty result, not a crash") {
    import graft.functions.Retrieval
    val empty = Seq.empty[(Long, Int)].toDF("doc_id", "rank")
    assert(Retrieval.rrfFuse(Seq(empty, empty), "doc_id", "rank").isEmpty)
    // one empty + one real: the real list passes through as single-system
    val real = Seq((5L, 1)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(real, empty), "doc_id", "rank").collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L && out.head.getLong(2) === 61L)
  }

  test("drift monitor with a single snapshot: never flags (no comparison basis)") {
    val oneSide = Seq(("g", "x", true), ("g", "y", true)).toDF("grp", "lang", "in_a")
    val out = graft.operators.Anomaly
      .proportionDriftFlags(oneSide, "grp", "lang", col("in_a")).collect()
    assert(out.forall(!_.getBoolean(6)), "n_b = 0 makes both sides 0 — no drift evidence")
  }

  test("mutual top-1 with an empty side: empty, not crashed") {
    import graft.functions.Similarity
    val vecs = Tables.embeddings(spark, sf)
    val cents = Similarity.centroids(vecs, 4)
    assert(Similarity.mutualTopOne(vecs.limit(0), vecs.limit(5), cents).isEmpty)
  }

  test("quantile trim on empty / single-value groups: empty stays empty, degenerate band keeps all") {
    import graft.operators.Quantiles
    val empty = emptyDocs.select(col("doc_id"), lit("g").as("g"), col("doc_id").as("v"))
      .limit(0)
    assert(Quantiles.groupThresholds(empty, "g", "v", 1, 20, 19, 20).isEmpty)
    assert(Quantiles.trimToRange(empty, "g", "v", 1, 20, 19, 20).isEmpty)
    val one = Seq(("g", 7L, 1L)).toDF("g", "v", "doc_id")
    val th = Quantiles.groupThresholds(one, "g", "v", 1, 20, 19, 20).head()
    assert(th.getAs[Long]("lo") == 7L && th.getAs[Long]("hi") == 7L)
    assert(Quantiles.trimToRange(one, "g", "v", 1, 20, 19, 20).count() == 1)
  }

  test("funnel on an empty event set: one zero row per stage, not a crash") {
    import graft.operators.Funnel
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "ord", "t")
    val out = Funnel.stageCounts(empty, Seq("k"), "ord", "t",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("unigram on an empty corpus: empty vocab trains, scoring fails loudly") {
    import graft.functions.Unigram
    assert(Unigram.trainVocab(emptyDocs, "doc_id", "text").isEmpty)
    val ex = intercept[IllegalArgumentException] {
      Unigram.segmentScores(emptyDocs, "doc_id", "text", Map.empty)
    }
    assert(ex.getMessage.contains("empty vocab"))
  }

  test("hashed classifier on empty/whitespace text: defined, bounded") {
    import graft.functions.Text
    val out = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
      .select(Text.hashedLinearScore(col("text")).as("s"))
      .collect().map(_.getLong(0))
    assert(out.forall(s => math.abs(s) <= 500), "split('') is one empty token")
  }
}
