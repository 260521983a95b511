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
}
