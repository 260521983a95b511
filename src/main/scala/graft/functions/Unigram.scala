package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation — the SentencePiece half of the
  * tokenizer family (BPE trains by greedy pair-merging, q76/q105/q106/
  * q120; the unigram model segments each word into the BEST-scoring
  * piece sequence by Viterbi DP). This implements the INFERENCE side
  * exactly and keeps the trained-score seam explicit:
  *
  *  - **Vocab**: candidate pieces are all substrings of length ≤
  *    `maxPieceLen` weighted by corpus word occurrences; the vocab is
  *    the top-`topK` by (freq DESC, piece ASC) UNION every single-char
  *    piece (so any word is always segmentable — the fallback every
  *    real unigram tokenizer keeps). Piece cost = 64 − bitlength(freq)
  *    — an EXACT integer −⌊log₂ freq⌋ stand-in for the trained
  *    −log P(piece) (`bin()` string length is bit-identical on both
  *    engines; a libm log would be the q41 1-ulp seam). Production
  *    drops EM-trained scores into the same map — the stub-seam rule.
  *  - **Viterbi**: per distinct word, best[i] = min over piece lengths
  *    of best[i−len] + cost(word[i−len..i]), with (total cost, piece
  *    count) packed into ONE int64 as cost·4096+pieces so the min is
  *    lexicographic (cheapest, then fewest pieces) and addition
  *    composes — the q131/q137 integer-packing discipline. The DP is
  *    a single `aggregate` fold over character positions: map-only,
  *    no join inside (the piece costs ride along as a plan literal —
  *    tokenizers ship their vocab to every executor; same bounded
  *    driver-collect class as the PQ codebooks).
  *
  * Scale shape: vocab training is one substring explode (≤ 4 rows per
  * char) folded map-side to piece counts + one TakeOrdered top-K; the
  * DP runs once per DISTINCT word (the distinct-word table is orders
  * smaller than the corpus) and joins back to per-doc occurrences on
  * the same key the distinct shuffled on. Words longer than
  * `maxWordLen` are excluded on both engines (documented cap — the
  * oracle's brute-force enumeration is exponential in word length;
  * the DP itself is linear and the cap is gate-side only in spirit).
  */
object Unigram {

  val MaxPieceLen = 4
  val MaxWordLen = 12
  private val Inf = 1L << 40

  private def wordsOf(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, MaxWordLen))

  /** Train the piece-cost table and collect it (bounded: ≤ topK +
    * alphabet size entries — the codebook-collect class). */
  def trainVocab(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int = 256): Map[String, Long] = {
    val wc = wordsOf(docs, idCol, textCol)
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pieces = wc.select(col("wc"),
        explode(flatten(transform(
          sequence(lit(1), length(col("w"))),
          s => transform(
            sequence(lit(1), least(lit(MaxPieceLen), length(col("w")) - s + 1)),
            l => col("w").substr(s, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = pieces.orderBy(col("freq").desc, col("piece").asc).limit(topK)
    val singles = pieces.filter(length(col("piece")) === 1)
    val vocab = top.unionByName(singles).distinct()
      .select(col("piece"), (lit(64L) - length(bin(col("freq")))).as("cost"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pieces.unpersist()
    vocab
  }

  /** The packed-Viterbi column over word column `w`: cost·4096+pieces
    * of the optimal segmentation under `vocab`.
    *
    * Scoring a corpus OTHER than the training corpus: a word
    * containing a character with no vocab piece cannot be segmented —
    * its packed value accumulates at least one `Inf` term (≥ 2⁴⁰, so
    * cost ≥ 2²⁸ after unpacking, orders beyond any real segmentation).
    * That is the OOV signal, not an error: callers filter or bucket on
    * it the way q115 treats OOV tokens (UnigramSpec pins the
    * behavior). Within one corpus the single-char fallback makes every
    * word finite.
    *
    * Oracle seam (r11 advice): the q151 DuckDB shape DROPS an
    * unsegmentable word entirely — no complete-segmentation row
    * survives its join — while this column Inf-scores it into the
    * per-doc total. In-gate the two agree because scoring corpus =
    * training corpus (every word finite); any CROSS-corpus oracle
    * comparison must filter `cost ≥ 2²⁸` rows on the Spark side first
    * or the totals diverge structurally, not numerically. */
  def packedBest(w: Column, vocab: Map[String, Long]): Column = {
    require(vocab.nonEmpty, "empty vocab")
    val costs = typedLit(vocab)
    aggregate(
      sequence(lit(1), length(w)),
      array(lit(0L)),
      (acc, i) => concat(acc, array(least((1 to MaxPieceLen).map { len =>
        when(i >= len,
          element_at(acc, i - len + 1) +
            coalesce(
              element_at(costs, w.substr(i - len + 1, lit(len))) * 4096L + 1L,
              lit(Inf)))
          .otherwise(lit(Inf))
      }: _*))),
      acc => element_at(acc, length(w) + 1))
  }

  /** Per-document segmentation totals under the unigram model:
    * (idCol, n_words, total_cost, total_pieces) — the
    * tokenizer-accurate token accounting (q115's OOV rate and q126's
    * budget fill consume exactly this number in production). */
  def segmentScores(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Map[String, Long]): DataFrame = {
    val occ = wordsOf(docs, idCol, textCol)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
    val dp = occ.select("w").distinct()
      .withColumn("best", packedBest(col("w"), vocab))
      .select(col("w"), expr("best div 4096").as("w_cost"),
        (col("best") % 4096).as("w_pieces"))
    occ.join(dp, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("w_cost")).as("total_cost"),
        sum(col("n") * col("w_pieces")).as("total_pieces"))
  }
}
