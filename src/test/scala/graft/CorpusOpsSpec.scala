package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, LanguageModel, Retrieval, Similarity, Text}

/** Round-8 corpus operators: maximal duplicate spans, inverted index,
  * chunking, char-trigram LM, and the join-based batch ANN scorer. */
class CorpusOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------------------------------------------- maximalDuplicateSpans

  test("max dup spans: one shared run merges to one maximal span with exact bounds") {
    // docs share tokens s1..s10 (10 tokens) at positions 6..15 in A and
    // 3..12 in B; all other tokens are unique → one island on one diagonal
    val a = (1 to 5).map(i => s"ua$i") ++ (1 to 10).map(i => s"s$i") ++ (1 to 5).map(i => s"va$i")
    val b = (1 to 2).map(i => s"ub$i") ++ (1 to 10).map(i => s"s$i") ++ (1 to 6).map(i => s"vb$i")
    val out = Dedup.maximalDuplicateSpans(
      docs(1L -> a.mkString(" "), 2L -> b.mkString(" ")),
      "doc_id", "text", n = 5, maxDf = 100L, minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 6L, 3L, 10L)))
  }

  test("max dup spans: disjoint shared runs stay separate; short spans filtered") {
    // two shared runs: 8 tokens (kept) and 7 tokens (< minSpan, dropped)
    val r1 = (1 to 8).map(i => s"x$i"); val r2 = (1 to 7).map(i => s"y$i")
    val a = r1 ++ (1 to 6).map(i => s"fa$i") ++ r2
    val b = (1 to 3).map(i => s"fb$i") ++ r1 ++ (1 to 4).map(i => s"gb$i") ++ r2
    val out = Dedup.maximalDuplicateSpans(
      docs(1L -> a.mkString(" "), 2L -> b.mkString(" ")),
      "doc_id", "text", n = 5, maxDf = 100L, minSpanTokens = 8)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 4L, 8L)))
  }

  test("max dup spans: docs shorter than the gram width emit nothing") {
    val out = Dedup.maximalDuplicateSpans(
      docs(1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", n = 5)
    assert(out.isEmpty)
  }

  // --------------------------------------------------------- chunking

  test("chunking: boundary lengths produce the exact chunk count and full coverage") {
    // n -> expected chunks for C=64, S=48: ceil(max(n-64,0)/48)+1
    val cases = Seq(1 -> 1, 47 -> 1, 48 -> 1, 64 -> 1, 65 -> 2, 112 -> 2, 113 -> 3, 160 -> 3)
    val rows = cases.zipWithIndex.map { case ((n, _), i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }
    val out = Text.chunkWindows(docs(rows: _*), "doc_id", "text",
      chunkTokens = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    cases.zipWithIndex.foreach { case ((n, expChunks), i) =>
      val mine = out.filter(_._1 == i.toLong).sortBy(_._2)
      assert(mine.length === expChunks, s"n=$n")
      // starts advance by the stride; every token is covered; the
      // chunks reassemble (with the overlap stripped) to the original
      mine.zipWithIndex.foreach { case ((_, cid, start, _, _), j) =>
        assert(cid === j.toLong && start === 1L + j * 48L)
      }
      assert(mine.map(c => c._3 + c._4 - 1).max === n.toLong, s"n=$n tail covered")
      val reassembled = mine.flatMap { case (_, cid, _, _, txt) =>
        val toks = txt.split(" ")
        if (cid == 0L) toks else toks.drop(64 - 48)
      }
      assert(reassembled.toSeq === (1 to n).map(t => s"t$t"), s"n=$n reassembly")
    }
  }

  // --------------------------------------------------- inverted index

  test("inverted index: df over all postings, impact-ordered truncated cell") {
    val d = docs(
      1L -> "w w w q",
      2L -> "w w q q",
      3L -> "w q q q",
      4L -> "only here")
    val out = Retrieval.invertedIndex(d, "doc_id", "text", topK = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // w: tfs 3,2,1 → df 3, top-2 postings "1:3,2:2"
    assert(out("w") === (3L, "1:3,2:2"))
    // q: tfs 1,2,3 → df 3, top-2 "3:3,2:2"
    assert(out("q") === (3L, "3:3,2:2"))
    assert(out("only") === (1L, "4:1"))
    // tf tie → doc_id ascending breaks it
    val tie = Retrieval.invertedIndex(docs(7L -> "z", 5L -> "z", 6L -> "z"),
      "doc_id", "text", topK = 2)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(tie("z") === "5:1,6:1")
  }

  // ------------------------------------------------- char-trigram LM

  /** Driver-side reference model over a collected corpus. */
  private def refModel(texts: Seq[(Long, String)]): (Map[String, Long], Map[String, Long], Long) = {
    val occ = texts.flatMap { case (_, t) =>
      val s = t.trim
      (0 to s.length - 3).map(i => s.substring(i, i + 3))
    }
    val c3 = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = occ.map(_.substring(0, 2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    (c3, c2, c3.size.toLong)
  }

  test("char LM: fixed-point scores match a driver-computed reference exactly") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val (c3, c2, v) = refModel(texts)
    val expected = texts.map { case (id, t) =>
      val s = t.trim
      val ps = (0 to s.length - 3).map { i =>
        val g3 = s.substring(i, i + 3)
        (1000000L * (c3(g3) + 1)) / (c2(g3.substring(0, 2)) + v)
      }
      id -> (if (ps.isEmpty) (0L, None) else (ps.size.toLong, Some(ps.sum / ps.size)))
    }.toMap
    val got = LanguageModel.fixedPointScores(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("char LM: bits-per-char matches the driver reference within 1e-9") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val (c3, c2, v) = refModel(texts)
    val expected = texts.map { case (id, t) =>
      val s = t.trim
      val bits = (0 to s.length - 3).map { i =>
        val g3 = s.substring(i, i + 3)
        -math.log((c3(g3) + 1.0) / (c2(g3.substring(0, 2)) + v)) / math.log(2.0)
      }
      id -> (if (bits.isEmpty) None else Some(bits.sum / bits.size))
    }.toMap
    val got = LanguageModel.bitsPerChar(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, b) =>
      (b, expected(id)) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"doc $id: $x vs $y")
        case (x, y) => assert(x === y, s"doc $id")
      }
    }
    // sanity: damaged text (rare trigrams) scores more bits than modal text
    val scores = got.collect { case (id, Some(x)) => id -> x }
    assert(scores.nonEmpty)
  }

  test("curation signals: each reason fires on the right doc; keeper of a dup pair is still dup-heavy") {
    import spark.implicits._
    val twenty = (1 to 20).map(i => s"w$i").mkString(" ")
    val unique = (1 to 20).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, twenty),   // exact-dup KEEPER: not a loser, but dup_heavy (novelty 0)
      (2L, twenty),   // exact-dup loser
      (3L, "a b"),    // too short (and too short to have 8-grams at all)
      (4L, unique))   // kept
      .toDF("doc_id", "text")
    val got = graft.functions.Text
      .curationSignals(docs, "doc_id", "text", minTokens = 20, n = 8, noveltyFloor = 0.2)
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(got(1L) === ((false, false, true, false)), "keeper: dup_heavy only")
    assert(got(2L) === ((true, false, true, false)), "loser: dup_loser AND dup_heavy")
    assert(got(3L) === ((false, true, false, false)), "short doc: too_short only")
    assert(got(4L) === ((false, false, false, true)), "unique 20-token doc is kept")
  }

  test("stupid backoff: seen/backoff/OOV tiers cost exactly as specified") {
    import spark.implicits._
    // train: "a b" ×2, "b c a b" — N=6, c(a)=2? no: tokens a,b,b,c,a,b → c(a)=2 c(b)=3 c(c)=1
    // bigrams: (a,b)×2 from doc1+doc3-tail, (b,c), (c,a) — ctx(a)=2, ctx(b)=1, ctx(c)=1
    val train = Seq((1L, "a b"), (2L, "b c a b")).toDF("doc_id", "text")
    // score: doc 10 all seen; doc 11 backs off on (b,a) [both words seen,
    // bigram unseen]; doc 12 is OOV on (a,z) and single-token doc 13 drops
    val score = Seq((10L, "a b c a b"), (11L, "b a"), (12L, "a z"), (13L, "a"))
      .toDF("doc_id", "text")
    val got = LanguageModel.stupidBackoffScores(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def bl(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    // doc 10: (a,b) seen: bl(ctx a=2)-bl(c_bi=2)=0; (b,c): bl(1)-bl(1)=0;
    // (c,a): bl(1)-bl(1)=0 — 4 pairs, cost 0+0+0+0
    assert(got(10L) === ((4L, 0L, 0L, 0L)))
    // doc 11: (b,a) unseen, a seen: bl(N=6)-bl(c_uni(a)=2)+2 = 3-2+2 = 3
    assert(got(11L) === ((1L, 1L, 0L, 3L)))
    // doc 12: (a,z), z OOV: bl(6)+2 = 5
    assert(got(12L) === ((1L, 1L, 1L, 5L)))
    assert(!got.contains(13L), "single-token doc has no bigram")
    assert(bl(6) === 3) // self-check of the reference bitlength
  }

  test("frozen-LM streaming gate: in-distribution passes, OOV garbage and unassessable quarantine") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lmgate").toString
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    LanguageModel.modelTable(corpus, "doc_id", "text").write.parquet(s"$dir/model")
    // the modal doc scores EXACTLY its self-trained bits (same model);
    // threshold = that + 1, and the all-OOV doc must land above it
    val modal = corpus.orderBy("doc_id").first()
    val modalBits = LanguageModel.bitsPerChar(corpus, "doc_id", "text")
      .filter(col("doc_id") === modal.getLong(0)).first().getDouble(2)
    val maxBits = modalBits + 1.0
    assert(maxBits < 20.0, s"fixture modal doc unexpectedly improbable: $modalBits")
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, modal.getString(1)), (2L, "éèç" * 40), (3L, "ab"))
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(graft.streaming.Events.lmQualityGateBatch(
        s"$dir/model", s"$dir/pass", s"$dir/fail", maxBits = maxBits) _)
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val pass = spark.read.parquet(s"$dir/pass")
    assert(pass.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(math.abs(pass.first().getAs[Double]("bits_per_char") - modalBits) < 1e-9,
      "frozen-model score must equal the self-trained score for training text")
    val fail = spark.read.parquet(s"$dir/fail").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("bits_per_char"))).toMap
    assert(fail.keySet === Set(2L, 3L))
    assert(fail(2L).exists(_ > maxBits), "all-OOV text must exceed the ceiling")
    assert(fail(3L).isEmpty, "unassessable (< 3 chars) doc carries a null score")
  }

  // ---------------------------------------------------- batch ANN join

  test("batch ANN ≡ small-query ivfTopK on the shared codebook; recall floor holds") {
    val vecs = Tables.embeddings(spark, sf)
    val c = Similarity.codebookSize(vecs.count())
    val cents = Similarity.centroids(vecs, c)
    val batch = Similarity.ivfBatchTopK(vecs, cents, k = 10, nprobe = 4)
      .filter(col("query_id") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val small = Similarity.ivfTopK(Similarity.ivfAssign(vecs, cents), cents,
      vecs.filter(col("vec_id") < 5), k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(batch === small,
      "join-based batch scorer must agree exactly with the broadcast probe form")
    // recall floor vs brute force for the same 5 queries
    val exact = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 5), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = batch.map(t => (t._1, t._2)).count(exact.contains)
    assert(hits >= (exact.size * 0.4).toInt, s"recall ${hits.toDouble / exact.size}")
  }
}
