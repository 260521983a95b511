package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis functions for a training-data pipeline, built entirely
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs): language
  * ID (stopword-hit heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and a rolling-hash fingerprint.
  *
  * Everything is a scalar expression over one row — embarrassingly
  * parallel, no shuffle, stays inside WholeStageCodegen. That is the
  * 100 TB design: these run at scan speed.
  */
object Text {

  /** Whitespace tokens of trimmed text (single-space delimited in the
    * corpus; trailing empties avoided by trimming first). */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** POSITIONAL within-`window` token pairs of `text` — (token_i,
    * token_{i+o}) for o ∈ [1, window] — as an array of (a, b) structs.
    * NOT normalized: callers that want unordered pairs must apply
    * least/greatest themselves (q179 and q198 do); a caller that
    * skips that double-counts asymmetric pairs. The GloVe /
    * TextRank co-occurrence stream (q179 counts it corpus-wide; q198
    * runs PageRank over it). MAP-ONLY: the token array binds once via
    * the single-element-transform trick, so the split doesn't rerun
    * per offset, and the ≤ window·|t| pairs emit from one projection —
    * no position self-join. */
  def cooccurrencePairs(text: Column, window: Int = 3): Column = {
    import org.apache.spark.sql.types._
    val emptyPairs = array().cast(ArrayType(StructType(Seq(
      StructField("a", StringType), StructField("b", StringType)))))
    element_at(
      transform(array(tokens(text)), t =>
        concat((1 to window).map(o =>
          when(size(t) > o,
            transform(sequence(lit(1), size(t) - o),
              i => struct(element_at(t, i).as("a"),
                element_at(t, i + o).as("b"))))
            .otherwise(emptyPairs)): _*)),
      1)
  }

  /** BPE-ish sub-tokens: letter runs, digit runs, single other symbols.
    * Mirrors the usual pre-tokenizer split. */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpePattern), lit(0))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Adjacent BPE-token pairs ("a b" strings) per row — the
    * merge-candidate stream of BPE training (q76 counts these
    * corpus-wide; q105 applies the winner). The token array is
    * lambda-bound ONCE: `element_at(raw_regexp_extract, i)` inside the
    * index lambda would re-run the regex per element (measured 9.6 s →
    * 0.4 s at sf0.1 — the Text.ngrams trap). */
  def bpePairs(text: Column): Column = adjacentPairs(bpeTokens(text))

  /** Adjacent pairs of an existing token array (the post-round-1 form
    * of [[bpePairs]], where the corpus is already tokenized). */
  def adjacentPairs(tokArr: Column): Column =
    element_at(
      transform(array(tokArr), b =>
        when(size(b) >= 2,
          transform(sequence(lit(1), size(b) - 1),
            i => concat(element_at(b, i), lit(" "), element_at(b, i + 1))))
          .otherwise(array().cast(ArrayType(StringType)))),
      1)

  /** ONE BPE merge round applied to a token array: greedy LEFTMOST
    * non-overlapping replacement of the adjacent pair (a, b) by the
    * concatenated symbol — exactly the rewrite step between BPE
    * training iterations. Backed by the native codegen'd
    * [[graft.plans.BpeMergeRound]] kernel: one O(L) pass with a single
    * output allocation. The HOF fold twin below is O(L²) element
    * copies per document (each `aggregate` step rebuilds the
    * accumulator array) — invisible on 50-token docs, a real trap on
    * 2k-token production documents; NativeSpec pins the two
    * bit-identical on randomized arrays, nulls included. Per-row,
    * zero shuffle, zero regex — where the SQL oracle needs explode +
    * two windows (gaps-and-islands parity) to express the same
    * greedy scan. */
  def mergePair(tokens: Column, a: String, b: String): Column = {
    // empty pair components are excluded from the contract: with b = ""
    // the fold would chain-merge (a+"" re-matches a) where the one-pass
    // scan would not, and no tokenizer emits empty symbols anyway
    require(a.nonEmpty && b.nonEmpty, "merge pair components must be non-empty")
    graft.plans.NativeExpressions.bpeMerge(tokens, lit(a), lit(b))
  }

  /** The higher-order-function twin of [[mergePair]] — a left fold
    * (`aggregate`): append each token, but when the accumulator's last
    * element is `a` and the current token is `b`, replace that last
    * element with `a+b`. The fold gives leftmost-nonoverlap for free —
    * a freshly merged `a+b` can never re-match `a` within the round
    * (that would need b = "") — including self-pair chains
    * ("t t t" with pair (t,t) → "tt t", not "tt tt").
    * `try_element_at` (not `element_at`) keeps the empty-accumulator
    * probe NULL-safe under ANSI mode. Kept as the parity reference for
    * the native kernel (the q23/q21 discipline). */
  def mergePairHof(tokens: Column, a: String, b: String): Column = {
    require(a.nonEmpty && b.nonEmpty, "merge pair components must be non-empty")
    aggregate(tokens, array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
  }

  /** Distributed BPE TRAINING loop — the full tokenizer-training shape
    * q76 (pair counting) and q105 (merge apply) are single rounds of.
    * Per round: ONE corpus-wide integer aggregate finds the most
    * frequent adjacent pair (ties broken by pair string, so the merge
    * sequence is deterministic), a 1-row collect brings the winner to
    * the driver (the learned artifact IS driver-sized — this is the
    * q101-cut / IVF-codebook precedent), and [[mergePair]] rewrites
    * every document in one codegen'd scan. The tokenized corpus is
    * localCheckpoint'ed per round (prior round's blocks freed — the
    * Components/PageRank treatment), so round k's scan reads round
    * k−1's materialized arrays, never the re-derived lineage.
    *
    * At 100 TB: each round is one explode+groupBy (map-side combined,
    * shuffle bounded by |distinct pairs|) plus one scan-speed rewrite —
    * the same per-round cost structure as a production BPE trainer on
    * a data-parallel corpus; `rounds` is the vocab-growth budget.
    *
    * Returns the merge table (rank, left, right, count-at-merge-time);
    * stops early if the corpus runs out of adjacent pairs.
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
                     rounds: Int): Seq[(Int, String, String, Long)] = {
    require(rounds >= 1, "need at least one round")
    // LAZY checkpoints, one job per round: round k's top-pair collect is
    // the action that materializes round k−1's rewrite, and a round's
    // blocks are dropped only AFTER the collect that consumed them (the
    // Components labelSum discipline — dropping before the dependent
    // materializes would free blocks a truncated lineage can't rebuild)
    var toks = docs.select(bpeTokens(col(textCol)).as("t")).localCheckpoint(false)
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = toks.select(explode(adjacentPairs(col("t"))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (prev != null) { graft.operators.Components.dropCheckpoint(prev); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((r, a, b, top(0).getLong(1)))
        prev = toks
        toks = toks.select(mergePair(col("t"), a, b).as("t")).localCheckpoint(false)
      }
      r += 1
    }
    if (prev != null) graft.operators.Components.dropCheckpoint(prev)
    graft.operators.Components.dropCheckpoint(toks)
    merges.result()
  }

  /** BPE ENCODE — apply a TRAINED merge list (from [[bpeTrainMerges]])
    * to every document, in rank order: tokenize, then rewrite with
    * merge 1, then merge 2, … exactly the inference-time counterpart
    * of the training loop (train emits the ranked pair table; encode
    * replays it), completing the tokenizer family train→encode.
    *
    * Plan shape: a FOLD of the native [[mergePair]] kernel — M nested
    * codegen'd rewrites inside ONE projection, so the whole encode is a
    * single corpus scan (not M passes: the fold composes expressions,
    * not jobs; `.explain` shows one WholeStageCodegen Project). Per-doc
    * cost is O(M·L). That beats a per-doc priority-queue encoder
    * (O(L log L) with heap + linked-list bookkeeping, non-codegen) for
    * the bounded merge budgets a corpus pipeline trains here (M ≲ 10²,
    * the q106 `rounds` knob): the kernels fuse into the scan and touch
    * each token array sequentially. At full-vocabulary scale (M ~ 3·10⁴)
    * the fold's M·L term AND the JVM's 64 KB codegen method limit both
    * give out — that regime wants the heap-based per-doc loop as one
    * native expression taking the merge TABLE as input, a different
    * operator contract (ranked-vocab lookup, not ranked replay), out of
    * scope for the trained-M-rounds path registered here.
    *
    * Returns (idCol, tokens array). Empty merge list = plain
    * tokenization. */
  def encodeBpe(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val encoded = merges.foldLeft(bpeTokens(col(textCol))) {
      case (toks, (a, b)) => mergePair(toks, a, b)
    }
    docs.select(col(idCol), encoded.as("tokens"))
  }

  /** Unicode NFC normalization (native codegen'd expression — see
    * [[graft.plans.NfcNormalize]]): decomposed sequences compose to
    * their canonical form so hash-based dedup/fingerprinting treats
    * "é" and "e+◌́" as the same text. */
  def nfc(text: Column): Column = graft.plans.NativeExpressions.nfc(text)

  /** Unicode text CLEANING — the C4/CCNet ingest-normalization step
    * composed from the engine's pieces: NFC-compose ([[nfc]]), replace
    * C0/DEL control characters (tabs, CRs, stray terminal bytes) with
    * spaces, collapse whitespace runs, trim. Idempotent; pure scalar
    * expression chain, stays inside WholeStageCodegen at scan speed.
    * Every clause has an exact DuckDB twin (nfc_normalize +
    * regexp_replace with the 'g' flag), so the operator sits under the
    * hash gate (q121). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(text), "[\\x00-\\x1f\\x7f]", " "),
      " {2,}", " "))

  /** Characters that are neither lowercase letters nor spaces, as a
    * ratio of total length (punctuation/symbol density). */
  def nonAlphaRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z ]", "")).cast(DoubleType) / length(text)

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast(DoubleType) / tokenCount(text)

  /** Non-distinct word n-grams (ordered, with repeats — unlike
    * `Dedup.shingles`, which set-dedups for Jaccard): the unit of
    * repetition-ratio quality scoring. Short docs yield an empty array,
    * never an ANSI error (same guard as shingles). The token array is
    * lambda-bound once — see Dedup.shingles for the re-evaluation trap. */
  def ngrams(text: Column, n: Int): Column =
    element_at(
      transform(array(tokens(text)), t =>
        when(size(t) >= n,
          transform(sequence(lit(0), size(t) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
          .otherwise(array().cast(ArrayType(StringType)))),
      1)

  /** Distinct-token ratio: 1.0 = no repeated token, → 0 as the doc
    * degenerates into repetition (the cheap Gopher-style signal). */
  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast(DoubleType) /
      tokenCount(text).cast(DoubleType)

  /** Per-language stopword sets for the n-gram-free language-ID
    * heuristic. Real pipelines use char-n-gram models; the heuristic
    * keeps the same plan shape (pure scalar scoring + argmax). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"))

  /** Count of tokens found in `words` — a codegen'd higher-order filter,
    * no explode, no shuffle. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  def stopwordRatio(text: Column, words: Seq[String]): Column =
    stopwordHits(text, words).cast(DoubleType) / tokenCount(text)

  /** Deterministic argmax over the four scores with fixed tiebreak order
    * en > es > de > fr; all-zero ⇒ 'und'. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, Stopwords("en"))
    val es = stopwordHits(text, Stopwords("es"))
    val de = stopwordHits(text, Stopwords("de"))
    val fr = stopwordHits(text, Stopwords("fr"))
    when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Composite quality score in [0,1]: favors texts with reasonable
    * length, low symbol density, and some stopword mass — the usual
    * cheap pre-filter before expensive dedup/classification. Pure
    * double arithmetic on deterministic operands. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / lit(200.0), lit(1.0))
    val symPenalty = lit(1.0) - least(nonAlphaRatio(text) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, Stopwords.values.flatten.toSeq) * 5.0, lit(1.0))
    (lenScore + symPenalty + stopScore) / 3.0
  }

  /** Gopher-style quality-rule battery (Rae et al. 2021 §A1.1, the
    * rule-filter family FineWeb/RefinedWeb refined): each rule is an
    * independent boolean column so a curation run can AUDIT which rule
    * rejected a document, not just that one did — the property a
    * composite score (see [[qualityScore]]) cannot give. All rules are
    * scalar codegen'd expressions: scan speed, zero shuffle, prunable
    * to the text column. Thresholds are the conventional ones adapted
    * to this corpus's single-line lowercase shape. */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val nWords = tokenCount(text)
    Seq(
      "rule_word_count" -> nWords.between(50, 100000),
      "rule_mean_word_len" -> avgTokenLen(text).between(3.0, 10.0),
      "rule_symbol_density" -> (nonAlphaRatio(text) < 0.1),
      "rule_alpha_words" ->
        (size(filter(tokens(text), t => t.rlike("[a-z]"))).cast(DoubleType) /
          nWords >= 0.7),
      "rule_repetition" -> (distinctTokenRatio(text) > 0.3),
      "rule_stopwords" -> (stopwordHits(text, Stopwords("en")) >= 2))
  }

  /** Rolling polynomial fingerprint over whitespace tokens:
    * fp = Σ-fold (acc*31 + tokenHash(token)) mod 2^40. Order-sensitive
    * (a real rolling hash) and computed entirely inside codegen via the
    * `aggregate` higher-order function. The modulus keeps the fold
    * inside long range — Spark 4 runs ANSI mode, where silent wrap-
    * around would instead raise ARITHMETIC_OVERFLOW (acc < 2^40, so
    * acc·31 + a 60-bit hash stays under 2^61). `tokenHash` defaults to
    * crc32 (cheap, production); pass `Hashes.h60` for the
    * oracle-verifiable md5 form. */
  def fingerprint(text: Column,
                  tokenHash: Column => Column = t => crc32(t.cast(BinaryType))): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) + tokenHash(t), lit(1L << 40)))

  /** Sliding-window CHUNKING — the retrieval/context-window prep step:
    * each document becomes ⌈max(n−C,0)/S⌉+1 overlapping chunks of up
    * to `chunkTokens` (C) tokens starting every `stride` (S) tokens,
    * so consecutive chunks share C−S tokens of context and every token
    * is covered (the last chunk truncates at the end of the doc; a doc
    * of ≤ C tokens is exactly one chunk).
    *
    * Pure per-row expression work — one `transform` over an integer
    * `sequence` then one explode, zero shuffle, scan-speed at 100 TB;
    * output size is corpus tokens × C/S. All arithmetic is integer
    * (the chunk count uses `div`), so the oracle reproduces every
    * boundary exactly.
    *
    * Output: (doc_id from `idCol`, chunk_id 0-based, start_tok 1-based,
    * n_tokens, chunk_text). */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    df.select(col(idCol), tokens(col(textCol)).as("t"))
      .withColumn("x", greatest(size(col("t")) - chunkTokens, lit(0)))
      .withColumn("extra", expr(s"(x + ${stride - 1}) div $stride"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0L), col("extra").cast(LongType))).as("chunk_id"))
      .withColumn("c",
        slice(col("t"), (col("chunk_id") * stride + 1).cast(IntegerType),
          lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("start_tok"),
        size(col("c")).cast(LongType).as("n_tokens"),
        concat_ws(" ", col("c")).as("chunk_text"))
  }

  /** HASHED linear-classifier score — the fastText/DSIR quality-filter
    * INFERENCE shape (a trained linear model over hashed bag-of-words
    * features, the filter CCNet/LLaMA-style pipelines run over every
    * crawled doc): score(doc) = Σ_tokens w[h(token)], evaluated as one
    * map-only per-row expression — NO corpus pass, NO shuffle, NO
    * model join; the weight lookup is pure arithmetic on the token
    * hash, so at 100 TB this runs at scan speed alongside the other
    * per-row quality signals (q16/q90).
    *
    * The weight table is the STUB seam (the multimodal-decode rule):
    * production loads trained fastText weights into the same
    * hash-and-lookup plumbing; here `w[h] = h60("w|"‖token) % (2·half+1)
    * − half` — a deterministic signed placeholder both engines can
    * replay bit-for-bit, keeping the REAL part (tokenize → hash →
    * weight-sum → threshold, all int64-exact) under the oracle gate.
    * Repeated tokens contribute once per occurrence (tf weighting),
    * exactly as the linear model dictates. */
  def hashedLinearScore(text: Column, seed: String = "w|",
                        half: Int = 500): Column =
    aggregate(tokens(text),
      lit(0L),
      (acc, t) =>
        acc + (Hashes.h60(concat(lit(seed), t)) % (2 * half + 1) - half))

  /** DuckDB twin of [[hashedLinearScore]] over SQL expression `e`. */
  def hashedLinearScoreSql(e: String, seed: String = "w|",
                           half: Int = 500): String = {
    val w = Hashes.hexToLongSql(Hashes.hex15Sql(s"'$seed' || gt"))
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split(trim($e), ' '),
       |                 gt -> $w % ${2 * half + 1} - $half)),
       |  (ga, gb) -> ga + gb)""".stripMargin
  }

  /** Per-doc n-gram NOVELTY (q172's operator half, reusable by the
    * composed curation pipeline): a position is novel iff its word
    * n-gram appears in NO other document; output (idCol, n_grams,
    * n_novel, novelty) with novelty as ONE IEEE division of the two
    * int64 counts. Docs with fewer than n tokens have no gram and
    * emit no row. Shape: gram explode → per-gram distinct-doc count
    * (two-level, map-side combined) → join back → per-doc aggregate —
    * never doc×doc. */
  /** Composed CURATION signals — the keep/drop table with REASONS that
    * an end-to-end cleaning recipe emits (every doc keeps its row; a
    * dashboard audits WHY things dropped, which a bare filter can't):
    *   - `dup_loser`  — not the min-id member of its exact (md5) cluster
    *     (computed as groupBy+min and a join back, map-side combined —
    *     not a window over the corpus);
    *   - `too_short`  — under `minTokens` tokens;
    *   - `dup_heavy`  — n-gram novelty below `noveltyFloor` (shares
    *     almost all its n-grams with other docs — the near-dup smell
    *     exact hashing misses); docs too short to HAVE grams are
    *     already caught by `too_short`;
    *   - `kept`       — none of the above.
    * Signals are INDEPENDENT by design: an exact-dup cluster's KEEPER
    * is still `dup_heavy` (its content exists elsewhere, novelty ~0),
    * so `kept` retains only content unique to the corpus. A
    * keep-one-canonical recipe wants the q127 cluster policy on the
    * `dup_loser` axis alone — this table gives the audit to choose
    * from; the conjunction is the strictest cut.
    * Each signal is deterministic/integer-derived, so the whole table
    * hash-gates (the novelty double is one IEEE division). */
  def curationSignals(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, minTokens: Int, n: Int,
                      noveltyFloor: Double): org.apache.spark.sql.DataFrame = {
    val dupMin = docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"))
    val nov = ngramNovelty(docs, idCol, textCol, n)
    docs.select(col(idCol), md5(col(textCol)).as("h"),
        tokenCount(col(textCol)).as("nt"))
      .join(dupMin, Seq("h"))
      .join(nov.select(col(idCol), col("novelty")), Seq(idCol), "left")
      .select(col(idCol),
        (col(idCol) =!= col("keep_id")).as("dup_loser"),
        (col("nt") < minTokens).as("too_short"),
        coalesce(col("novelty") < noveltyFloor, lit(false)).as("dup_heavy"))
      .withColumn("kept",
        !(col("dup_loser") || col("too_short") || col("dup_heavy")))
  }

  def ngramNovelty(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 2, "n >= 2")
    val grams = docs
      .select(col(idCol), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("t")) - (n - 1)),
        i => array_join(slice(col("t"), i, lit(n)), " "))).as("gram"))
    val df = grams.groupBy("gram").agg(countDistinct(col(idCol)).as("ddf"))
    grams.join(df, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("ddf") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }
}
