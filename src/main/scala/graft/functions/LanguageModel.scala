package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-trained character n-gram language model scoring — the
  * CCNet-style quality signal: documents whose character statistics are
  * improbable under a model trained on the corpus itself (mojibake,
  * encoding damage, key-mash spam) score poorly and can be bucketed or
  * cut. The reference has no LM; this extends the quality-filter family
  * (q31/q90) with the one signal those rule batteries can't express —
  * likelihood under the corpus distribution.
  *
  * Model: add-one-smoothed trigram conditionals
  * P(c₃ | c₁c₂) = (count₃(c₁c₂c₃) + 1) / (count₂(c₁c₂) + V), where
  * count₂ counts the bigram AS A TRIGRAM PREFIX (so numerators sum to
  * the denominator over the vocabulary, the textbook identity) and V is
  * the distinct-trigram vocabulary size.
  *
  * Two scoring forms:
  *  - [[fixedPointScores]] — ORACLE-EXACT: each occurrence scores the
  *    fixed-point integer (scale·(c₃+1)) div (c₂+V); per-doc sum and
  *    mean stay integers end-to-end, so DuckDB (`//`) reproduces every
  *    value bit-for-bit. No logs: transcendentals differ by 1 ulp
  *    between libm builds (the q41/BM25 rule), and integer mean-of-
  *    probability ranks docs for bucketing just as a mean-log would at
  *    gate tolerances. `scale`=10⁶ keeps (c₃+1)·scale inside Long for
  *    any trigram occurring ≤ ~9.2·10¹² times — a single trigram would
  *    need a ~10 PB monoculture corpus to overflow; raise awareness,
  *    not the scale.
  *  - [[bitsPerChar]] — the PRODUCTION form: mean −log₂P per
  *    occurrence (bits per char, the familiar LM unit). Double log
  *    summation is order-sensitive under a grouped aggregate, so this
  *    form is spec-pinned against a driver-computed reference with an
  *    ε-tolerance instead of hash-oracled.
  *
  * Scale shape: one per-char explode (linear in corpus bytes) folded
  * immediately to (doc, trigram) counts with map-side combine, model
  * counts and V derived from |vocab|-sized tables, then ONE keyed
  * equi-join of per-doc gram counts against the per-trigram score
  * table and one per-doc aggregate. The count tables are NOT
  * broadcast-hinted — a
  * character-trigram vocab is small, but the same code serves token
  * n-grams where it is not (the q75 lesson); AQE broadcasts when the
  * built side is actually small. Docs shorter than 3 chars have no
  * occurrences: n_pos = 0, null score.
  */
object LanguageModel {

  /** (doc_id from `idCol`, g3, g2) — one row per trigram occurrence,
    * with the bigram-prefix context. */
  private def occurrences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = trim(col(textCol))
    // docs shorter than 3 chars are filtered BEFORE the sequence:
    // Spark's sequence(1, 0) counts DOWN ([1, 0]), it is not empty.
    // The trimmed text is lambda-bound once (the gramArray discipline;
    // measured neutral here — codegen already amortizes the trim — but
    // the bound form can't regress if the expression above it grows).
    val g3s = element_at(
      transform(array(text), s =>
        transform(sequence(lit(1), length(s) - 2),
          i => s.substr(i, lit(3)))),
      1)
    df.filter(length(text) >= 3)
      .select(col(idCol), explode(g3s).as("g3"))
      .select(col(idCol), col("g3"), col("g3").substr(1, 2).as("g2"))
  }

  /** The per-trigram model table, built at VOCAB scale: (g3, g2, c3,
    * c2, v). The key cost discipline: occurrences reduce to (doc, g3)
    * counts FIRST (map-side combine collapses repeats before any
    * shuffle), the trigram/prefix counts and V then derive from
    * |vocab|-sized tables, and each scoring join touches |doc×distinct-
    * trigram| rows, never raw positions (a per-occurrence form joins
    * every position TWICE — against c3 and c2 — and shuffles corpus-
    * position rows through both; this regrouping is the difference
    * between shuffling corpus bytes and shuffling the vocab). */
  private def model(occ: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val docG3 = occ.groupBy(col(idCol), col("g3")).agg(count(lit(1)).as("tf"))
    val c3 = docG3.groupBy("g3").agg(sum(col("tf")).as("c3"))
    val c2 = c3.select(col("g3").substr(1, 2).as("g2"), col("c3"))
      .groupBy("g2").agg(sum(col("c3")).as("c2"))
    val v = c3.agg(count(lit(1)).as("v"))
    val byGram = c3.select(col("g3"), col("g3").substr(1, 2).as("g2"), col("c3"))
      .join(c2, Seq("g2"))
      .crossJoin(v)
    (docG3, byGram)
  }

  /** Oracle-exact fixed-point scoring: (doc_id, n_pos, avg_p_fp) where
    * avg_p_fp = (Σ_occ (scale·(c3+1)) div (c2+V)) div n_pos — all
    * integer (tf-weighted per distinct trigram: integer addition is
    * commutative, so the grouped sum equals the per-occurrence sum
    * EXACTLY — this is why the fixed-point form tolerates the
    * vocab-scale regrouping the double form only approximates within
    * ε). Higher = more probable under the corpus model. */
  def fixedPointScores(df: DataFrame, idCol: String, textCol: String,
                       scale: Long = 1000000L): DataFrame = {
    val (docG3, byGram) = model(occurrences(df, idCol, textCol), idCol)
    val perDoc = docG3
      .join(byGram.select(col("g3"),
        expr(s"($scale * (c3 + 1)) div (c2 + v)").as("p_fp")), Seq("g3"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_pos"), sum(col("tf") * col("p_fp")).as("sum_p_fp"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        // null for 0-occurrence docs (sum_p_fp is already null there;
        // the explicit guard keeps the oracle's `//` off a zero divisor)
        when(col("n_pos").isNotNull, expr("sum_p_fp div n_pos")).as("avg_p_fp"))
  }

  /** The FROZEN per-trigram model: (g3, bits) with bits = −log₂P — the
    * artifact an offline training pass persists and an online scorer
    * (streaming gate, new-corpus triage) joins against. |trigram
    * vocab| rows — small enough to broadcast at score time, derived
    * without ever shuffling raw positions twice. */
  def modelTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (_, byGram) = model(occurrences(df, idCol, textCol), idCol)
    byGram.select(col("g3"),
      (lit(0.0) - log2((col("c3") + 1).cast(DoubleType) /
        (col("c2") + col("v")).cast(DoubleType))).as("bits"))
  }

  /** Score documents against a frozen [[modelTable]]: trigrams the
    * model has never seen cost `oovBits` each (an out-of-distribution
    * penalty the self-trained form never needs — new data CAN contain
    * novel trigrams). Docs with no trigram occurrences (< 3 chars)
    * return null bits_per_char: they cannot be assessed, and the
    * caller decides the policy (the streaming gate quarantines them). */
  def scoreAgainst(df: DataFrame, idCol: String, textCol: String,
                   modelTbl: DataFrame, oovBits: Double): DataFrame = {
    val docG3 = occurrences(df, idCol, textCol)
      .groupBy(col(idCol), col("g3")).agg(count(lit(1)).as("tf"))
    val perDoc = docG3
      .join(modelTbl, Seq("g3"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_pos"),
        sum(col("tf").cast(DoubleType) * coalesce(col("bits"), lit(oovBits)))
          .as("sum_bits"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        (col("sum_bits") / col("n_pos")).as("bits_per_char"))
  }

  /** Production scoring: (doc_id, n_pos, bits_per_char) — mean −log₂P
    * over the doc's trigram occurrences, self-trained (score the
    * corpus under its own model, so OOV cannot occur). Spec-pinned,
    * not oracled (see the object note on double summation). */
  def bitsPerChar(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(df, idCol, textCol, modelTable(df, idCol, textCol), oovBits = 0.0)

  // ----------------------------------------------- word-bigram backoff
  // Stupid Backoff (Brants et al. 2007, "Large Language Models in
  // Machine Translation") — the scoring rule DESIGNED for distributed
  // count tables: S(w₂|w₁) = c(w₁w₂)/c(w₁·) if the bigram was seen,
  // else α·c(w₂)/N — no normalization pass over the vocabulary, so the
  // model IS the two count relations and scoring is two equi-joins.
  // The char-trigram model above has no backoff structure; this is the
  // word-level complement with the CCNet train-on-base/score-everything
  // split, where backoff genuinely fires on held-out-only bigrams.

  /** Integer Stupid-Backoff cost per document, EXACT (hash-oracle
    * class): each bigram occurrence costs
    *   seen:          bl(c_ctx(w₁)) − bl(c_bi(w₁w₂))      [≈ −log₂ S]
    *   backoff:       bl(N) − bl(c_uni(w₂)) + 2           [2 ≈ −log₂ α, α=0.4]
    *   OOV w₂:        bl(N) + 2
    * with bl(x) = ⌊log₂ x⌋+1 via `length(bin(x))` (bit-identical on
    * both engines — a libm log would be the q41 1-ulp seam) and
    * c_ctx(w₁) = Σ_w c_bi(w₁w) so seen costs are ≥ 0 by construction.
    * Counts come from `train` ONLY; every doc of `score` is scored
    * (docs with < 2 tokens have no bigram and drop out — the q113
    * n_pos=0 convention, minus the null row).
    *
    * Output: (idCol, n_pairs, n_backoff, n_oov, total_cost) — all
    * integers, summed from per-doc bigram-TYPE counts (map-side
    * combine collapses repeats before the model joins, the [[model]]
    * regrouping discipline: the joins shuffle |doc×distinct-bigram|
    * rows, never raw positions). At 100 TB the count tables stay
    * RELATIONS (KenLM-style shards) — nothing is collected or
    * broadcast-hinted; AQE broadcasts if a side is actually small. */
  def stupidBackoffScores(train: DataFrame, score: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    def pairs(df: DataFrame) = {
      val t = Text.tokens(col(textCol))
      // single-token docs filtered BEFORE the sequence: sequence(1, 0)
      // counts DOWN in Spark (the [[occurrences]] lesson), and the
      // phantom index would hit ANSI element_at out-of-bounds
      df.filter(col(textCol).isNotNull && size(t) >= 2)
        .select(col(idCol),
          explode(element_at(transform(array(t), ts =>
            transform(sequence(lit(1), size(ts) - 1),
              i => struct(element_at(ts, i).as("w1"),
                element_at(ts, i + 1).as("w2")))), 1)).as("p"))
        .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    }
    val bi = pairs(train).groupBy("w1", "w2").agg(count(lit(1)).as("c_bi"))
    val ctx = bi.groupBy("w1").agg(sum(col("c_bi")).as("c_ctx"))
    val uniToks = train.filter(col(textCol).isNotNull)
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
    val uni = uniToks.groupBy("w").agg(count(lit(1)).as("c_uni"))
    val n = uniToks.agg(count(lit(1)).as("n"))
    val bl = (c: Column) => length(bin(c)).cast(LongType)
    val docBi = pairs(score)
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
    val costed = docBi
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c_uni")), Seq("w2"), "left")
      .crossJoin(n)
      .select(col(idCol), col("tf"),
        col("c_bi").isNull.as("backoff"),
        (col("c_bi").isNull && col("c_uni").isNull).as("oov"),
        when(col("c_bi").isNotNull, bl(col("c_ctx")) - bl(col("c_bi")))
          .when(col("c_uni").isNotNull, bl(col("n")) - bl(col("c_uni")) + 2L)
          .otherwise(bl(col("n")) + 2L).as("cost"))
    costed.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_pairs"),
        sum(when(col("backoff"), col("tf")).otherwise(0L)).as("n_backoff"),
        sum(when(col("oov"), col("tf")).otherwise(0L)).as("n_oov"),
        sum(col("tf") * col("cost")).as("total_cost"))
  }
}
