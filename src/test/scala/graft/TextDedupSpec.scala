package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Text}

/** Semantics of the text-analysis and dedup operators that have no SQL
  * oracle (hash-based ones) plus invariants of the oracled ones. */
class TextDedupSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("boilerplate removal: identity at maxDf=∞; hot segments cut; reassembly order-exact") {
    import org.apache.spark.sql.functions._
    // identity: with no segment hot, every doc reassembles to its
    // trimmed text — pins the split/reassemble round-trip exactly
    val corpus = Tables.documents(spark, sf)
    val idCheck = Dedup.removeBoilerplate(corpus, "doc_id", "text", 3, Long.MaxValue)
      .join(corpus.select(col("doc_id"), trim(col("text")).as("expect")), Seq("doc_id"))
      .filter(col("clean_text") =!= col("expect"))
    assert(idCheck.isEmpty, "maxDf=∞ must be the identity on trimmed text")
    // a segment shared by 3 docs is cut at maxDf=2; unique tails survive
    val d3 = docs(
      (1L, "the same boiler plate here one"),
      (2L, "the same boiler plate here two"),
      (3L, "the same boiler plate here three"))
    val cleaned = Dedup.removeBoilerplate(d3, "doc_id", "text", 3, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned === Map(1L -> "plate here one", 2L -> "plate here two",
      3L -> "plate here three"))
  }

  test("intra-doc dedup: first occurrence wins, order preserved, zero shuffles") {
    val corpus = docs(
      1L -> "a b c d a b e f",   // segs(2): "a b","c d","a b","e f" -> repeat collapses
      2L -> "x y x y x y",       // pure stutter -> one segment survives
      3L -> "p q r s")           // no repeats -> identity
    val out = Dedup.dedupWithinDoc(corpus, "doc_id", "text", segLen = 2)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "a b c d e f")
    assert(m(2L) == "x y")
    assert(m(3L) == "p q r s")
    // the scale claim is structural: a map-only projection, no exchange
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, "intra-doc dedup must stay shuffle-free")
  }

  test("intra-doc dedup: NULL text drops the doc (oracle parity, not an empty string)") {
    // DuckDB's unnest over a NULL token range emits zero rows, so the
    // q116 oracle drops NULL-text docs entirely; the Spark side must
    // not resurrect them as (doc_id, "") via concat_ws's null-eating
    import spark.implicits._
    val corpus = Seq((1L, Option("a b a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val m = Dedup.dedupWithinDoc(corpus, "doc_id", "text", segLen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "a b"))
  }

  test("span-dedup apply: cut from the higher id, overlaps merged, untouched docs intact") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")   // 10-token shared span
    val corpus = docs(
      1L -> s"$shared a1 a2 a3",         // canonical copy, kept whole
      2L -> s"$shared b1 b2 b3 b4 b5",   // later doc: span cut, tail survives
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8")   // no duplication, identity
    val out = Dedup.cutDuplicateSpans(corpus, "doc_id", "text",
      n = 5, maxDf = 100L, minSpanTokens = 8)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == s"$shared a1 a2 a3")
    assert(m(2L) == "b1 b2 b3 b4 b5")
    assert(m(3L) == "c1 c2 c3 c4 c5 c6 c7 c8")
  }

  test("span-dedup apply: fully-covered doc disappears") {
    val span = (1 to 12).map(i => s"t$i").mkString(" ")
    val corpus = docs(1L -> s"$span x y z", 2L -> span) // doc2 IS the span
    val out = Dedup.cutDuplicateSpans(corpus, "doc_id", "text",
      n = 5, maxDf = 100L, minSpanTokens = 8)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == s"$span x y z")
    assert(!m.contains(2L), "a doc whose every token is covered must drop")
  }

  test("hashed-gram edges == string-gram edges on randomized corpora") {
    // rareGramEdges carries xxhash64 gram hashes through its shuffles;
    // absent 64-bit collisions (certain at this scale) the edge set must
    // be IDENTICAL to the definitional string-gram formulation. Random
    // corpora with forced sharing: token soup from a small vocabulary.
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def text(): String = Seq.fill(6 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    for (trial <- 1 to 3) {
      val corpus = docs((0L until 30L).map(i => i -> text()): _*)
      val hashed = Dedup.rareGramEdges(corpus, "doc_id", "text", n = 3,
        maxDf = 10L, minShared = 2L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // definitional form: string grams, same df window and shared floor
      val g = corpus.select(col("doc_id"),
        explode(array_distinct(Text.ngrams(col("text"), 3))).as("gram"))
      val rare = g.join(
        g.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df").between(2, 10))
          .select("gram"), Seq("gram"), "left_semi")
      val want = rare.select(col("doc_id").as("a"), col("gram"))
        .join(rare.select(col("doc_id").as("b"), col("gram")), Seq("gram"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hashed == want, s"trial $trial: hashed-gram edges diverge from string-gram edges")
    }
  }

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y"), "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash: identical docs have identical signatures; disjoint docs differ") {
    val sigs = Dedup.minhashSignatures(
      docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "p q r s t"),
      "doc_id", "text", shingleN = 1, k = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("minhash LSH finds the duplicate pair with est_jaccard 1.0") {
    val sigs = Dedup.minhashSignatures(
      docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "p q r s t"),
      "doc_id", "text", shingleN = 1, k = 8)
    val pairs = Dedup.minhashCandidates(sigs, "doc_id", k = 8, bands = 4, estThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("simhash: equal for equal docs, close for near docs, far for disjoint") {
    val out = docs(
      1L -> "a b c d e f g h", 2L -> "a b c d e f g h",
      3L -> "a b c d e f g x", 4L -> "p q r s t u v w")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(2L))
    assert(java.lang.Long.bitCount(out(1L) ^ out(3L)) < java.lang.Long.bitCount(out(1L) ^ out(4L)))
  }

  test("ngram jaccard: identical=1, overlapping in (0,1), disjoint absent") {
    val out = Dedup.ngramJaccardPairs(
      docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "a b c x y", 4L -> "p q r s t"),
      "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) > 0.0 && out((1L, 3L)) < 1.0)
    assert(!out.contains((1L, 4L)) && !out.contains((3L, 4L)))
  }

  test("LSH recall vs exact pairs on the corpus (same shingle unit)") {
    val exact = queries.ExtensionQueries.q22.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = queries.ExtensionQueries.q20.fn(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands × 2 rows at J≥0.2 collide with p = 1-(1-J^2)^8 ≥ 0.28;
    // on this corpus every exact pair has J≥0.2 and most ≥0.5 → demand
    // substantial (not perfect) recall, and no empty output.
    assert(cand.nonEmpty)
    assert((exact intersect cand).size.toDouble >= 0.5 * exact.size)
  }

  test("incremental LSH ≡ full recompute: corpus pairs ∪ shard-incremental pairs") {
    val docs = Tables.documents(spark, sf)
    val cut = docs.agg((max(col("doc_id")) / 2).cast("long")).head().getLong(0)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSignaturesAffine(df, "doc_id", "text", shingleN = 3, k = 16)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairSet(Dedup.minhashCandidates(sigs(docs), "doc_id",
      k = 16, bands = 8, estThreshold = 0.2))
    val oldOnly = pairSet(Dedup.minhashCandidates(
      sigs(docs.filter(col("doc_id") <= cut)), "doc_id",
      k = 16, bands = 8, estThreshold = 0.2))
    val index = Dedup.bandedIndex(sigs(docs.filter(col("doc_id") <= cut)),
      "doc_id", k = 16, bands = 8)
    val incremental = pairSet(Dedup.minhashCandidatesIncremental(
      sigs(docs.filter(col("doc_id") > cut)), index, "doc_id",
      k = 16, bands = 8, estThreshold = 0.2))
    // signatures are per-doc, so the decomposition is EXACT, not approx:
    // a full recompute over old∪new = the corpus's own pairs + exactly
    // the pairs the incremental probe finds (disjoint sets)
    assert((oldOnly intersect incremental).isEmpty)
    assert(oldOnly.union(incremental) === full)
    assert(incremental.nonEmpty, "fixture must exercise the cross-shard path")
    assert(incremental.exists { case (a, b, _) => a <= cut && b > cut },
      "fixture must contain at least one old-new pair")
  }

  test("simhash banded pairs: recall is EXACT for hamming < bands (pigeonhole), vs brute force") {
    val corpus = Tables.documents(spark, sf)
    val got = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force every pair's Hamming distance (fine at spec scale)
    val sigs = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got === brute, "banded blocking must find EVERY hamming<=3 pair, no more")
    assert(got.nonEmpty, "corpus has exact dups; hamming-0 pairs must exist")
  }

  test("simhash banded pairs: bands must exceed maxHamming and divide 64") {
    val d = docs(1L -> "a b c", 2L -> "a b c")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 2, bands = 3)
    }
  }

  test("langid picks the language whose stopwords dominate") {
    val out = docs(
      1L -> "the cat of the house and the dog",
      2L -> "el perro de la casa y el gato",
      3L -> "zzz yyy xxx")
      .select(col("doc_id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = docs(1L -> "hello world42 x!").select(
      Text.tokenCount(col("text")).as("ws"),
      Text.bpeTokenCount(col("text")).as("bpe")).head()
    assert(r.getInt(0) === 3)
    // hello | world | 42 | x | !
    assert(r.getInt(1) === 5)
  }

  test("winnowing: the w+k-1 guarantee holds at ANY alignment; disjoint docs share nothing") {
    val k = 8; val w = 12
    // a shared span of exactly w+k-1 = 19 chars, embedded at different
    // offsets in otherwise-unrelated texts — the case stride shingling
    // misses and the MOSS theorem guarantees
    val span = "qqwweerrttyyuuiiopp" // 19 chars
    assert(span.length == w + k - 1)
    val a = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" + span + "bbbbbbbbbbbbbbbbbbbbbbbb"
    val b = "cc" + span + "dddddddddddddddddddddddddddddddddddddddddddddddddd"
    val c = "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"
    val fps = Dedup.winnowingFingerprints(docs(1L -> a, 2L -> b, 3L -> c), "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared 19-char span must share a fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
    // density: winnowing keeps far fewer than all grams (expected 2/(w+1))
    assert(byDoc(1L).size < a.length - k + 1)
    // pair generation surfaces exactly the (1,2) pair
    val pairs = Dedup.duplicateSpanPairs(docs(1L -> a, 2L -> b, 3L -> c),
      "doc_id", "text", k, w, maxDf = 50L, minShared = 1L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("winnowing recall is 1.0 on randomized injected spans, under BOTH hash families") {
    val k = 8; val w = 12
    val rnd = new scala.util.Random(42)
    def noise(n: Int): String = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    // 30 unrelated random docs; inject one ≥(w+k-1)-char span into 8
    // known pairs at RANDOM offsets (the alignment-independence claim)
    val base = (1L to 30L).map(i => i -> noise(200 + rnd.nextInt(200)))
    val injected = (0 until 8).map { j =>
      val a = 1L + 2 * j; val b = 2L + 2 * j
      val span = noise(w + k - 1 + rnd.nextInt(20))
      (a, b, span)
    }
    val byId = base.toMap
    val texts = injected.foldLeft(byId) { case (m, (a, b, span)) =>
      def put(id: Long) = {
        val t = m(id); val off = rnd.nextInt(t.length)
        t.take(off) + span + t.drop(off)
      }
      m.updated(a, put(a)).updated(b, put(b))
    }
    val df = docs(texts.toSeq.sortBy(_._1): _*)
    val want = injected.map { case (a, b, _) => (a, b) }.toSet
    for (h <- Seq((c: org.apache.spark.sql.Column) => xxhash64(c),
                  graft.functions.Hashes.h60 _)) {
      val got = Dedup.duplicateSpanPairs(df, "doc_id", "text", k, w,
        maxDf = 1000L, minShared = 1L, gramHash = h)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the MOSS theorem: every injected pair MUST appear (exact recall);
      // random-noise false positives are possible in principle but the
      // 60-bit hash space makes them vanishingly unlikely here
      assert(want.subsetOf(got), s"missing pairs: ${want -- got}")
    }
  }

  test("fingerprint is order-sensitive (unlike set hashing)") {
    val fp = docs(1L -> "a b c", 2L -> "c b a")
      .select(Text.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) !== fp(1))
  }

  test("ngram cosine: identical=1; repetition separates docs Jaccard calls identical; disjoint absent") {
    // docs 1 and 2 have the SAME distinct 3-gram set {a b c, b c a, c a b}
    // but different multiplicities — Jaccard 1.0, cosine < 1.0: the
    // signal ngramCosinePairs exists to add over q22's Jaccard.
    val d = docs(
      1L -> "a b c a b c",
      2L -> "a b c a b c a b c",
      3L -> "a b c a b c",
      4L -> "p q r s t")
    val cos = Dedup.ngramCosinePairs(d, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(cos((1L, 3L)) - 1.0) < 1e-12) // identical docs (sqrt·sqrt ≈ ss)
    assert(cos((1L, 2L)) < 1.0 && cos((1L, 2L)) > 0.9) // same gram set, different counts
    assert(!cos.keySet.exists { case (a, b) => a == 4L || b == 4L }) // no shared gram
    val jac = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((1L, 2L)) === 1.0, "Jaccard must be blind to the repetition cosine sees")
  }

  test("ngram cosine: randomized equivalence with a driver-side count-vector reference") {
    val rnd = new scala.util.Random(20260813L)
    val alpha = Vector("a", "b", "c", "d")
    val texts = (1L to 40L).map(i =>
      i -> Vector.fill(3 + rnd.nextInt(12))(alpha(rnd.nextInt(4))).mkString(" "))
    def gramsOf(t: String): Seq[String] = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }
    val vecs = texts.map { case (id, t) =>
      id -> gramsOf(t).groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }.toMap
    val want = (for {
      (ia, va) <- vecs.toSeq; (ib, vb) <- vecs.toSeq if ia < ib
      dot = va.keysIterator.map(g => va(g) * vb.getOrElse(g, 0L)).sum if dot > 0
    } yield {
      val ss = (v: Map[String, Long]) => v.values.map(x => x * x).sum
      (ia, ib) -> dot.toDouble / (math.sqrt(ss(va).toDouble) * math.sqrt(ss(vb).toDouble))
    }).toMap
    val got = Dedup.ngramCosinePairs(docs(texts: _*), "doc_id", "text",
      n = 3, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet === want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-12, s"pair $k: got ${got(k)}, want $w")
  }

  test("ngram cosine: hot-gram df cap drops hot grams from the dot product but not the norms") {
    // gram "x y z" is in all 3 docs (df 3 > cap 2) → excluded from every
    // dot product; docs 1,2 still share "a b c" so they pair with a
    // cosine strictly below the uncapped value; doc 3 shares ONLY the
    // hot gram and must not pair at all.
    val d = docs(
      1L -> "a b c x y z",
      2L -> "a b c x y z",
      3L -> "q r s x y z")
    val capped = Dedup.ngramCosinePairs(d, "doc_id", "text", n = 3,
      threshold = 0.0, maxGramDf = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet === Set((1L, 2L)))
    val uncapped = Dedup.ngramCosinePairs(d, "doc_id", "text", n = 3,
      threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped((1L, 2L)) < uncapped((1L, 2L)))
  }

  test("cross-corpus decontamination: drops exactly the reference lookalikes, corpus-internal dups survive") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val reference = docs.filter(col("doc_id") % 7 === 0)
    val survivors = Dedup.decontaminateAgainst(corpus, reference, "doc_id", "text",
        bandHash = Dedup.Md5BandHash)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent derivation of the expected drop set: q20's full
    // candidate pairs over ALL docs, restricted to mixed-side pairs
    val sigs = Dedup.minhashSignaturesAffine(docs, "doc_id", "text", 3, 16)
    val allPairs = Dedup.minhashCandidates(sigs, "doc_id", 16, 8, 0.2,
        Dedup.Md5BandHash)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDropped = allPairs.flatMap { case (a, b) =>
      (a % 7, b % 7) match {
        case (0, x) if x != 0 => Some(b)
        case (x, 0) if x != 0 => Some(a)
        case _ => None // same-side pair: not this operator's business
      }
    }.toSet
    assert(expectedDropped.nonEmpty, "fixture must exercise the drop path")
    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === corpusIds -- expectedDropped)
    // a corpus-internal dup pair with NO reference twin must fully survive
    val internalOnly = allPairs.collect {
      case (a, b) if a % 7 != 0 && b % 7 != 0 &&
        !expectedDropped(a) && !expectedDropped(b) => Seq(a, b)
    }.flatten
    assert(internalOnly.forall(survivors), "internal dups are not contamination")
  }

  test("q149 source overlap matrix: unordered cells, counts re-derivable from the raw pairs") {
    val out = graft.queries.ExtensionQueries.q149.fn(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out.nonEmpty, "fixture must produce near-dup pairs")
    assert(out.keys.forall { case (a, b) => a <= b },
      "cells must be normalized least/greatest — one cell per unordered pair")
    // independent derivation: raw q20 pairs joined to sources by hand
    val docs = graft.Tables.documents(spark, sf)
    val srcById = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sigs = Dedup.minhashSignaturesAffine(docs, "doc_id", "text", 3, 16)
    val expected = Dedup.minhashCandidates(sigs, "doc_id", 16, 8, 0.2,
        Dedup.Md5BandHash)
      .collect().map(r => (srcById(r.getLong(0)), srcById(r.getLong(1))))
      .map { case (x, y) => if (x <= y) (x, y) else (y, x) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out == expected)
  }
}
