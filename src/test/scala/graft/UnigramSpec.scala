package graft

import org.apache.spark.sql.functions._
import graft.functions.Unigram

/** Pins for unigram-LM segmentation (q151): DP ≡ brute force, the
  * single-char fallback, and the packed (cost, pieces) tiebreak. */
class UnigramSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Exhaustive best segmentation under `vocab` (packed min). */
  private def brute(w: String, vocab: Map[String, Long]): Long = {
    def go(pos: Int): Long =
      if (pos == w.length) 0L
      else (1 to Unigram.MaxPieceLen)
        .filter(pos + _ <= w.length)
        .flatMap { len =>
          vocab.get(w.substring(pos, pos + len))
            .map(c => c * 4096L + 1L + go(pos + len))
        }
        .minOption.getOrElse(1L << 50)
    go(0)
  }

  test("packedBest equals exhaustive search for every distinct fixture word") {
    val df = docs(1L -> "abc abcd ba cab", 2L -> "abc ba ba z")
    val vocab = Unigram.trainVocab(df, "doc_id", "text")
    val words = Seq("abc", "abcd", "ba", "cab", "z")
    import spark.implicits._
    val got = words.toDF("w")
      .select(col("w"), Unigram.packedBest(col("w"), vocab).as("best"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (w <- words) assert(got(w) == brute(w, vocab), s"DP != brute on '$w'")
  }

  test("single-char fallback keeps every word segmentable") {
    val df = docs(1L -> "xyzzy qq")
    val vocab = Unigram.trainVocab(df, "doc_id", "text")
    assert(Seq("x", "y", "z", "q").forall(vocab.contains))
    val scores = Unigram.segmentScores(df, "doc_id", "text", vocab).head()
    assert(scores.getAs[Long]("n_words") == 2L)
    assert(scores.getAs[Long]("total_cost") < (1L << 40), "no word may be unsegmentable")
  }

  test("packed min prefers cheaper cost, then fewer pieces") {
    // craft a vocab where 'ab' (1 piece, cost 5) beats a+b (2 pieces, cost 5)
    val vocab = Map("a" -> 2L, "b" -> 3L, "ab" -> 5L)
    import spark.implicits._
    val best = Seq("ab").toDF("w")
      .select(Unigram.packedBest(col("w"), vocab)).head().getLong(0)
    assert(best == 5L * 4096L + 1L, "equal cost must resolve to fewer pieces")
  }

  test("scoring an out-of-vocab character yields an Inf-class cost, not an error") {
    val vocab = Unigram.trainVocab(docs(1L -> "aa ab"), "doc_id", "text")
    assert(!vocab.contains("z"))
    import spark.implicits._
    val best = Seq("az").toDF("w")
      .select(Unigram.packedBest(col("w"), vocab)).head().getLong(0)
    assert(best / 4096L >= (1L << 28), "unsegmentable word must carry the OOV signal")
  }

  test("per-doc totals are occurrence-weighted") {
    val df = docs(1L -> "ba ba ba")
    val vocab = Unigram.trainVocab(df, "doc_id", "text")
    val row = Unigram.segmentScores(df, "doc_id", "text", vocab).head()
    val one = brute("ba", vocab)
    assert(row.getAs[Long]("n_words") == 3L)
    assert(row.getAs[Long]("total_cost") == 3L * (one / 4096L))
    assert(row.getAs[Long]("total_pieces") == 3L * (one % 4096L))
  }

  // ----------------------------- hard-EM trainer (q158, r11 item 6)
  // Driver-side reference trainer, the q106 BPE-trainer discipline:
  // enumerate every segmentation, pick the canonical best (min packed,
  // then lexicographically-min REVERSED length sequence — the engine
  // backtrack's smallest-last-piece greedy), count pieces, prune,
  // re-cost, iterate.

  private def costOf(c: Long): Long = // 64 − length(bin(c)); bin(0)="0"
    if (c == 0L) 63L else java.lang.Long.numberOfLeadingZeros(c).toLong

  private def refBestPieces(w: String, vocab: Map[String, Long]): Seq[String] = {
    def go(pos: Int): Seq[(Long, List[Int])] =
      if (pos == w.length) Seq((0L, Nil))
      else (1 to Unigram.MaxPieceLen).filter(pos + _ <= w.length).flatMap { len =>
        vocab.get(w.substring(pos, pos + len)).toSeq.flatMap { c =>
          go(pos + len).map { case (e, ls) => (c * 4096L + 1L + e, len :: ls) }
        }
      }
    val all = go(0)
    assert(all.nonEmpty, s"'$w' must be segmentable under the fixture vocab")
    val minEnc = all.map(_._1).min
    val lens = all.filter(_._1 == minEnc).map(_._2)
      .minBy(_.reverse.mkString) // same piece count at equal enc → positional compare
    lens.foldLeft((0, Vector.empty[String])) { case ((p, acc), l) =>
      (p + l, acc :+ w.substring(p, p + l))
    }._2
  }

  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.split(" ")).filter(w => w.nonEmpty && w.length <= Unigram.MaxWordLen)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refInitVocab(wc: Map[String, Long], topK: Int): Map[String, Long] = {
    val freq = wc.toSeq.flatMap { case (w, n) =>
      for {
        s <- 0 until w.length
        l <- 1 to math.min(Unigram.MaxPieceLen, w.length - s)
      } yield w.substring(s, s + l) -> n
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = freq.toSeq.sortBy { case (p, f) => (-f, p) }.take(topK)
    val singles = freq.filter(_._1.length == 1)
    (top ++ singles).toMap.view.mapValues(costOf).toMap
  }

  private def refEmRound(wc: Map[String, Long], vocab: Map[String, Long],
                         topK: Int): Map[String, Long] = {
    val cnts = wc.toSeq.flatMap { case (w, n) =>
      refBestPieces(w, vocab).map(_ -> n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = cnts.toSeq.sortBy { case (p, c) => (-c, p) }.take(topK)
    val singles = wc.keys.flatMap(_.toSeq).map(ch => ch.toString)
      .toSet.toSeq.map((p: String) => p -> cnts.getOrElse(p, 0L))
    (top ++ singles).toMap.view.mapValues(costOf).toMap
  }

  test("bestPieces returns the canonical optimal path (reference-checked per word)") {
    val df = docs(1L -> "abab abab abba cd abcd dcba", 2L -> "abab cdcd ab cd")
    val vocab = Unigram.trainVocab(df, "doc_id", "text", topK = 8)
    val words = Seq("abab", "abba", "cd", "abcd", "dcba", "cdcd", "ab")
    import spark.implicits._
    val got = words.toDF("w")
      .select(col("w"), Unigram.bestPieces(col("w"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (w <- words)
      assert(got(w) == refBestPieces(w, vocab), s"path mismatch on '$w'")
  }

  test("hard-EM trainer matches the driver-side reference over two rounds (with pruning)") {
    val texts = Seq("abab abab abba cd abcd dcba", "abab cdcd ab cd", "ba ba dab")
    val df = docs(texts.zipWithIndex.map { case (t, i) => (i + 1).toLong -> t }: _*)
    val wc = refWordCounts(texts)
    val topK = 6 // small enough that the prune actually bites
    var ref = refInitVocab(wc, topK)
    assert(Unigram.trainVocabEm(df, "doc_id", "text", rounds = 0, topK = topK) === ref,
      "round 0 must equal the frequency-heuristic init")
    for (r <- 1 to 2) {
      ref = refEmRound(wc, ref, topK)
      assert(Unigram.trainVocabEm(df, "doc_id", "text", rounds = r, topK = topK) === ref,
        s"EM round $r diverged from the reference trainer")
    }
    // and the EM round is not a no-op on this fixture: costs moved
    assert(ref != refInitVocab(wc, topK), "fixture must exercise a real re-estimation")
  }
}
