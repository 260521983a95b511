package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Multimodal, Similarity}

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

  test("PQ: m codes per vector from the block codebooks; encode is deterministic") {
    val vecs = Tables.embeddings(spark, sf)
    val books = Similarity.pqCodebooks(vecs, m = 4, c = 16, dim = 64)
    assert(books.count() === 64) // m·c sub-centroids
    assert(books.select(size(col("sc_emb"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(16)) // dim/m floats each
    val codes = Similarity.pqAssign(vecs, books, m = 4, dim = 64)
    assert(codes.count() === vecs.count() * 4)
    // codebook ids are the 16 smallest vec_ids (0..15 on this fixture)
    assert(codes.filter(col("code") < 0 || col("code") > 15).isEmpty)
    val run1 = codes.orderBy("vec_id", "block").collect().map(_.toSeq)
    val run2 = Similarity.pqAssign(vecs, books, m = 4, dim = 64)
      .orderBy("vec_id", "block").collect().map(_.toSeq)
    assert(run1.sameElements(run2))
    // a codebook vector reconstructs itself: distance 0 ⇒ its own code
    val self = codes.filter(col("vec_id") < 16)
    assert(self.filter(col("code") =!= col("vec_id")).isEmpty,
      "a sampled centroid must encode to itself in every block")
  }

  test("PQ ADC top-10 recall vs the exact L2 scan") {
    import graft.operators.Relational
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") < 5)
    val v = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val exact = Relational.topNPerGroup(
        v.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            Similarity.l2sq(col("qe"), col("ve")).as("d2")),
        10, Seq(col("query_id")), -col("d2"), col("neighbor_id"))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val books = Similarity.pqCodebooks(vecs, m = 4, c = 16, dim = 64)
    val codes = Similarity.pqAssign(vecs, books, m = 4, dim = 64)
    val approx = Similarity.pqTopK(codes, books, queries, k = 10, m = 4, dim = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"PQ ADC recall@10 = $recall%.2f (m=4, c=16)")
    // 4×16 codes on a 64-dim grid is a coarse quantizer; the floor
    // documents "meaningfully better than chance (10/499 ≈ 0.02)", the
    // exact pass is oracled (q99)
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("IVF-PQ (residual-encoded) top-10 recall vs the exact L2 scan") {
    import graft.operators.Relational
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") < 5)
    val v = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val exact = Relational.topNPerGroup(
        v.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            Similarity.l2sq(col("qe"), col("ve")).as("d2")),
        10, Seq(col("query_id")), -col("d2"), col("neighbor_id"))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = vecs.count()
    val cents = Similarity.sharedCodebook(vecs, n, tag = sf)
    val nprobe = math.max(2, Similarity.codebookSize(n) / 4)
    val approx = Similarity.ivfPqTopK(vecs, cents, queries, k = 10,
      nprobe = nprobe, m = 32, c = 64, dim = 64, iters = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"IVF-PQ recall@10 = $recall%.2f (nprobe=$nprobe, m=32, c=64, iters=2)")
    // This corpus sits in the distance-concentration regime (the
    // 10th→11th neighbor gap is ~1e-3 of the distance scale), so
    // recall tracks quantization error almost linearly: m=32 blocks ×
    // c=64 Lloyd-refined RESIDUAL sub-codebooks push mean qerr ~10×
    // below the m=8 form and land ≥ 0.7 under the SAME nprobe cell
    // restriction (whose own exact-scoring ceiling is ~0.88 here).
    // The flat-PQ m=4/c=16 baseline pin stays at 0.2.
    assert(recall >= 0.7, s"recall=$recall")
    // the probed-cell invariant, checked for real: every neighbor's
    // assigned cell must be among its query's nprobe nearest cells
    // (by the same squared-L2 metric assignment, probe and ADC share —
    // the metric-alignment contract of ivfPqTopK)
    val cellOf = Similarity.l2Assign(vecs, cents)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centRows = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(x: Array[Double], y: Array[Double]): Double =
      x.indices.iterator.map(i => (x(i) - y(i)) * (x(i) - y(i))).sum
    val qEmb = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val probed = qEmb.map { case (qid, e) =>
      qid -> centRows.toSeq.map { case (cid, ce) => (l2(e, ce), cid) }
        .sortBy { case (s, cid) => (s, cid) }.take(nprobe).map(_._2).toSet
    }
    for ((qid, nid) <- approx)
      assert(probed(qid).contains(cellOf(nid)),
        s"neighbor $nid of query $qid sits in unprobed cell ${cellOf(nid)}")
  }

  test("persisted IVF-PQ serving: refined recall climbs with nprobe, floor holds (the AnnRecall knob)") {
    import graft.functions.VectorIndex
    // the q161 serving tier (ADC shortlist + exact re-rank — the
    // production shape) on the deterministic spec corpus: frozen
    // artifacts built once, probed at the two ends of the AnnRecall
    // nprobe grid. Pins (SCALING.md §ann-recall's spec hook): REFINED
    // recall at full probe dominates single-probe — exact re-rank
    // kills the ADC impostors that make the UNREFINED curve
    // non-monotone at coarse m (measured: m=4 unrefined recall can
    // DROP as nprobe grows, because every extra cell adds
    // approximately-scored candidates that displace true neighbors;
    // the refined path only ever gains from wider cell coverage, up
    // to the rerank-pool bound).
    val vecs = Tables.embeddings(spark, sf)
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = graft.pipeline.TempDirs.scoped("graft_annrecall_spec_")
    VectorIndex.build(vecs, dir, trained = true)
    VectorIndex.buildPq(spark, dir, m = 4, c = 64, dim = 64,
      trained = true, iters = 2)
    def recallAt(nprobe: Int): Double = {
      val approx = VectorIndex.pqTopKRefined(spark, dir, queries, vecs,
        k = 10, rerank = 30, nprobe = nprobe, m = 4, dim = 64)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val cells = Similarity.codebookSize(vecs.count())
    val r1 = recallAt(1)
    val rAll = recallAt(cells)
    info(f"refined serving recall@10: nprobe=1 -> $r1%.2f, nprobe=$cells -> $rAll%.2f")
    assert(rAll >= r1, s"full-probe refined recall $rAll below single-probe $r1")
    assert(r1 >= 0.05, s"single-probe refined recall $r1 (floor 0.05)")
    assert(rAll >= 0.4, s"full-probe refined recall $rAll (floor 0.4)")
  }

  test("trained PQ codebooks: L2 Lloyd never increases quantization error; recall holds") {
    import graft.operators.Relational
    val vecs = Tables.embeddings(spark, sf)
    // k-means objective: total min squared distance to the codebook.
    // One Lloyd iteration (assign, then L2 mean) is monotone
    // non-increasing on the training set — a guarantee, not a hope.
    def qErr(books: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqAssign(vecs, books, m = 4, dim = 64)
        .withColumnRenamed("code", "code_id")
        .join(books, Seq("block", "code_id"))
        .join(vecs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(sum(Similarity.l2sq(
          slice(col("embedding"), col("block") * 16 + 1, lit(16)), col("sc_emb"))).as("e"))
        .head().getDouble(0)
    val sampled = Similarity.pqCodebooks(vecs, m = 4, c = 16, dim = 64)
    val trained = Similarity.pqCodebooksTrained(vecs, m = 4, c = 16, dim = 64, iters = 2)
    val (es, et) = (qErr(sampled), qErr(trained))
    info(f"PQ quantization error: sampled=$es%.1f trained=$et%.1f")
    assert(et <= es * (1 + 1e-9), s"Lloyd increased the objective: $es -> $et")
    // recall with the trained books stays in the sampled books' class
    val queries = vecs.filter(col("vec_id") < 5)
    val v = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("ve"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val exact = Relational.topNPerGroup(
        v.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            Similarity.l2sq(col("qe"), col("ve")).as("d2")),
        10, Seq(col("query_id")), -col("d2"), col("neighbor_id"))
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(books: org.apache.spark.sql.DataFrame): Double = {
      val approx = Similarity.pqTopK(Similarity.pqAssign(vecs, books, m = 4, dim = 64),
          books, queries, k = 10, m = 4, dim = 64)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val (rs, rt) = (recall(sampled), recall(trained))
    info(f"PQ ADC recall@10: sampled=$rs%.2f trained=$rt%.2f")
    assert(rt >= rs - 0.1, s"trained recall $rt much worse than sampled $rs")
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

  /** Driver-side replay of [[Multimodal.perceptualHash]]'s dHash: same
    * LCG grid from the decoder checksum, same gradient-sign bits. */
  private def refPhash(payload: Array[Byte], decoder: Multimodal.Decoder): Long = {
    val (_, _, chk) = decoder.decode(payload)
    val px = new Array[Int](72)
    var st = chk
    for (i <- 0 until 72) {
      st = st * 6364136223846793005L + 1442695040888963407L
      px(i) = ((st >>> 56) & 0xff).toInt
    }
    (0 until 64).foldLeft(0L) { (ph, b) =>
      if (px((b >> 3) * 9 + (b & 7)) < px((b >> 3) * 9 + (b & 7) + 1)) ph | (1L << b) else ph
    }
  }

  test("perceptual hash: deterministic, bit-equal to the driver-side dHash reference, both decoders") {
    val docs = Tables.documents(spark, sf).limit(20).cache()
    for (dec <- Seq(Multimodal.StubDecoder, Multimodal.Md5Decoder)) {
      val got = Multimodal.perceptualHash(Multimodal.mediaTable(docs), dec)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> refPhash(r.getString(1).getBytes("UTF-8"), dec)).toMap
      assert(got === want, s"decoder $dec")
    }
  }

  test("banded Hamming pairs: exact recall at h<=3 with 4 bands, h=4 excluded (pigeonhole edge)") {
    import spark.implicits._
    // constructed hashes: base + deterministic 1/2/3-bit flips across
    // every band alignment, plus one 4-bit flip that must NOT pair with
    // the base (all four bands touched) — recall at <=3 is exact, so
    // every qualifying pair must appear with its true distance
    val base = 0x0123456789abcdefL
    val rnd = new scala.util.Random(7)
    val variants = (1 to 3).flatMap { h =>
      (0 until 8).map { i =>
        val bits = rnd.shuffle((0 until 64).toList).take(h)
        (100L * h + i, bits.foldLeft(base)((x, b) => x ^ (1L << b)), h)
      }
    }
    val far = (900L, base ^ 1L ^ (1L << 17) ^ (1L << 33) ^ (1L << 49), 4)
    val df = ((0L, base, 0) +: variants :+ far)
      .map { case (id, h, _) => (id, h) }.toDF("doc_id", "phash")
    val pairs = Dedup.bandedHammingPairs(df, "doc_id", "phash", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    variants.foreach { case (id, _, h) =>
      assert(pairs.get((0L, id)).contains(h), s"pair (0,$id) at hamming $h missing")
    }
    assert(!pairs.contains((0L, 900L)), "4-bit flip with all bands touched must not pair")
  }

  test("perceptual near-dup e2e: byte-identical payloads collide at hamming 0; NULL text drops at the media boundary") {
    import spark.implicits._
    val docs = Seq(
      (1L, Option("same bytes same image"), "en", "t"),
      (2L, Option("same bytes same image"), "en", "t"), // exact payload dup of 1
      (3L, Option("different bytes entirely"), "en", "t"),
      (4L, Option.empty[String], "en", "t")) // no payload -> not a media row
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // the boundary filter is what keeps every mapPartitions decoder
    // NPE-free under a corpus regeneration that introduces NULL texts
    assert(Multimodal.mediaTable(docs).count() === 3)
    assert(Multimodal.featurize(Multimodal.mediaTable(docs)).count() === 3)
    val pairs = Dedup.bandedHammingPairs(
      Multimodal.perceptualHash(Multimodal.mediaTable(docs)),
      "doc_id", "phash", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated payload must not near-collide (hash-chaotic stub)")
  }

  private def mediaOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
  }

  test("frame signatures: floor(len/stride) frames per doc, partial tails and short docs drop") {
    // frames are 4-char windows here; doc 2 is 1 char short of frame 3
    val media = mediaOf(Seq((1L, "aaaabbbbcccc"), (2L, "aaaabbbbccc"), (3L, "abc")))
    val f = Multimodal.frameSignatures(media, stride = 4).cache()
    val perDoc = f.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc === Map(1L -> 3L, 2L -> 2L)) // doc 3 (< stride) vanishes
    // identical windows hash identically across docs; frame_idx is positional
    val h = f.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(h((1L, 0)) === h((2L, 0)) && h((1L, 1)) === h((2L, 1)))
    assert(h((1L, 0)) !== h((1L, 1)))
  }

  test("video near-dup pairs: >= minShared distinct frames, hot frames df-capped") {
    val X = "xxxxxxxxxxxxxxxx"; val Y = "yyyyyyyyyyyyyyyy"
    val Z = "zzzzzzzzzzzzzzzz"; val W = "wwwwwwwwwwwwwwww"
    val media = mediaOf(Seq(
      (1L, X + Y + Z), (2L, X + Y + W),        // share 2 frames -> pair
      (3L, X + "0123456789abcdef"),            // shares only X with 1/2 -> no pair
      (10L, Z + Z + Z), (11L, Z)))             // Z repeated within doc counts ONCE
    val pairs = Multimodal.videoNearDupPairs(
      Multimodal.frameSignatures(media, stride = 16), minShared = 2, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map((1L, 2L) -> 2L)) // 10/11 share only Z (distinct), 3 shares only X
    // hot-frame cap: X appears in 3 docs; maxDf=2 removes it, killing the pair
    val capped = Multimodal.videoNearDupPairs(
      Multimodal.frameSignatures(media, stride = 16), minShared = 1, maxDf = 2)
    assert(!capped.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && {
      // with X df-capped out, (1,2) may still share Y (df=2) — shared count must drop to 1
      r.getLong(2) > 1L
    }))
  }

  test("aligned match: a shifted copy votes onto one offset; scattered overlap is rejected") {
    val P = "pppppppppppppppp"; val Q = "qqqqqqqqqqqqqqqq"
    val R = "rrrrrrrrrrrrrrrr"; val S = "ssssssssssssssss"
    val T = "tttttttttttttttt"; val U = "uuuuuuuuuuuuuuuu"
    val media = mediaOf(Seq(
      (1L, P + Q + R + S),      // frames P,Q,R,S at 0..3
      (2L, Q + R + S + T),      // the same clip shifted: Q,R,S at 0..2 -> all vote shift=+1
      (3L, S + U + U + P)))     // shares S and P with doc 1 at INCONSISTENT offsets
    val out = Multimodal.alignedMatchPairs(
      Multimodal.frameSignatures(media, stride = 16), minVotes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // (1,2): Q/R/S match at shifts 1-0, 2-1, 3-2 — three votes on +1
    assert(out((1L, 2L)) === (1L, 3L))
    // (1,3): S matches at 3-0=+3, P at 0-3=-3 — max one vote per shift, below minVotes
    assert(!out.contains((1L, 3L)))
  }

  test("video near-dup: md5 gate path ≡ xxhash production path on the fixture corpus") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    def pairSet(hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Multimodal.videoNearDupPairs(Multimodal.frameSignatures(media, 16, hashFn))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairSet(graft.functions.Hashes.h60) === pairSet(xxhash64(_)))
  }

  test("mutual top-1: single-cell codebook reproduces the exact global mutual-NN set") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
    val a = vecs.filter(col("label") % 2 === 0)
    val b = vecs.filter(col("label") % 2 === 1)
    // one centroid -> every vector shares the cell -> bucketing is a no-op
    val oneCell = vecs.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val got = graft.functions.Similarity.mutualTopOne(a, b, oneCell)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver-side exact reference: full cross argmax both ways
    def emb(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val (ea, eb) = (emb(a.select("vec_id", "embedding")), emb(b.select("vec_id", "embedding")))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    def best(from: Map[Long, Array[Float]], to: Map[Long, Array[Float]]): Map[Long, Long] =
      from.map { case (i, v) =>
        i -> to.toSeq.map { case (j, w) => (j, cos(v, w)) }
          .maxBy { case (j, c) => (c, -j) }._1
      }
    val (bA, bB) = (best(ea, eb), best(eb, ea))
    val expected = bA.collect { case (i, j) if bB(j) == i => (i, j) }.toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("mutual top-1: bucketed recall vs exact >= 0.5 on the fixture; pairs are mutual within cells") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
    val a = vecs.filter(col("label") % 2 === 0)
    val b = vecs.filter(col("label") % 2 === 1)
    val cents = graft.functions.Similarity.centroids(vecs,
      graft.functions.Similarity.codebookSize(vecs.count()))
    val bucketed = graft.functions.Similarity.mutualTopOne(a, b, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneCell = vecs.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val exact = graft.functions.Similarity.mutualTopOne(a, b, oneCell)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0.4 is the house IVF floor (cf. the recall@10 pins above); this
    // fixture is 50 vectors over ~8 cells — the harshest regime
    val recall = (bucketed intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, f"bucketed mutual-NN recall $recall%.2f vs exact")
  }

  test("k-means|| init: structure invariants + beats first-k-by-id on total potential") {
    import org.apache.spark.sql.DataFrame
    val vecs = Tables.embeddings(spark, sf)
    val out = graft.functions.Similarity
      .kmeansParallelInit(vecs, rounds = 3, l = 8, k = 16, salt = "kmpp")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))
    // structure: unique candidates, seed = min id at round 0, ranks 1..|C|,
    // selected ⇔ rank ≤ 16, weights cover the corpus exactly once
    assert(out.map(_._1).distinct.length === out.length)
    val minId = vecs.agg(min(col("vec_id"))).head.getLong(0)
    assert(out.filter(_._2 == 0).map(_._1).toSeq === Seq(minId))
    assert(out.map(_._4).sorted.toSeq === (1 to out.length))
    assert(out.forall(t => t._5 == (t._4 <= 16)))
    assert(out.map(_._3).sum === vecs.count())
    // determinism: a second run is identical (hash coin, no RNG)
    val again = graft.functions.Similarity
      .kmeansParallelInit(vecs, rounds = 3, l = 8, k = 16, salt = "kmpp")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))
    assert(out.toSet === again.toSet)
    // quality (the paper's point): total potential Σ min d² under the
    // selected 16 must beat the naive first-16-by-id seeding
    def potential(centIds: Set[Long]): Double = {
      val cents = vecs.filter(col("vec_id").isInCollection(centIds))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      vecs.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          graft.functions.Similarity.l2sq(col("embedding"), col("c_emb")).as("dd"))
        .groupBy("vec_id").agg(min(col("dd")).as("d2"))
        .agg(sum(col("d2"))).head.getDouble(0)
    }
    val selected = out.filter(_._5).map(_._1).toSet
    val naive = vecs.orderBy(col("vec_id")).limit(16)
      .collect().map(_.getLong(0)).toSet
    val (pSel, pNaive) = (potential(selected), potential(naive))
    assert(pSel < pNaive,
      f"k-means|| potential $pSel%.1f should beat first-k $pNaive%.1f")

    // the production recluster: deterministic, covers the corpus, and the
    // Lloyd-trained centers also beat the naive seeding on total potential
    val vecsN = vecs.count()
    val census = graft.functions.Similarity
      .kmeansParallelCentroids(vecs, rounds = 3, l = 8, k = 16, salt = "kmpp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(census.map(_._2).sum === vecsN)
    assert(census.length <= 16 && census.map(_._1).forall(i => i >= 0 && i < 16))
    val census2 = graft.functions.Similarity
      .kmeansParallelCentroids(vecs, rounds = 3, l = 8, k = 16, salt = "kmpp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(census.toSet === census2.toSet)
  }

  test("hard negatives: the skipped zone is exactly the per-anchor top-2 by cosine") {
    val vecs = Tables.embeddings(spark, sf)
    val cents = graft.functions.Similarity.centroids(vecs,
      graft.functions.Similarity.codebookSize(vecs.count()))
    val negs = graft.functions.Similarity.hardNegatives(vecs, cents, skip = 2, take = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(negs.nonEmpty && negs.forall(t => t._4 >= 1 && t._4 <= 3))
    assert(negs.forall(t => t._1 != t._2), "no self-negatives")
    // full band = top-5 (skip=0); the emitted band must be exactly ranks 3..5 of it
    val full = graft.functions.Similarity.hardNegatives(vecs, cents, skip = 0, take = 5)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), r.getLong(1))).toMap
    negs.foreach { case (a, n, _, nr) =>
      assert(full((a, nr + 2)) === n, s"anchor $a band slot $nr") }
  }
}
