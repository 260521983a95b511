package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Lexical retrieval scoring — the keyword-ranking half of a
  * retrieval/curation pipeline (the embedding half is Similarity).
  * The reference's BI layer ranks products by aggregates
  * (`gold_transfrom.py:64-69`, README.md:60-63 top-20 dashboard); a
  * training-data pipeline ranks *documents* against a query — same
  * agg-then-top-k shape, different scoring function.
  */
object Retrieval {

  /** BM25 per-document scores for a fixed bag of query terms.
    *
    * Oracle-exactness discipline (the q75 rule): ALL aggregation is
    * integer — per-doc term frequencies via conditional sums, doc
    * length, and the corpus stats row (N, total tokens, per-term df) —
    * and the score is ONE fixed-shape per-row double expression over
    * those integers, summed in written term order, so engine and
    * DuckDB oracle agree bit-for-bit. The idf is the rational
    * Robertson form (N − df + ½)/(df + ½) WITHOUT the log: ln goes
    * through libm and differs by 1 ulp between engines (observed —
    * see q41's note), and the log is a per-term monotone reshaping
    * that changes no ordering a spec pins.
    *
    * Scale shape: one token explode → one integer groupBy(doc) with
    * the term tfs folded into the same aggregate (no per-term join,
    * no second pass over tokens); the corpus stats reduce to a single
    * broadcast row. Nothing here is a window — callers wanting top-k
    * should `orderBy(score).limit(k)` (TakeOrdered, no
    * single-partition exchange), as q102 does.
    *
    * Output: (idCol, score) — one row per input document.
    */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct and non-empty")
    val toks = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("token"))
    val perDocAggs = count(lit(1)).as("dl") +:
      terms.map(t => sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    bm25FromPerDoc(
      toks.groupBy(col(idCol)).agg(perDocAggs.head, perDocAggs.tail: _*),
      idCol, terms, k1, b)
  }

  /** [[bm25Scores]] computed FROM a postings table (token, doc_id, tf)
    * instead of raw text — the INDEX-SERVING path: with a committed
    * [[TextIndex]] artifact, a query never re-tokenizes the corpus;
    * per-doc tf and length fold from the (much smaller) postings.
    * Bit-identical to the text path by construction — both routes
    * reduce to the same per-doc integer row before the one shared
    * double expression (the q148 single-pipeline rule, applied to
    * scoring). Production additionally materializes the per-doc `dl`
    * as a derived artifact column at compaction so the serving
    * aggregate touches only the query terms' postings; deriving it
    * here keeps the artifact normalized (one source of truth). */
  def bm25ScoresFromPostings(postings: DataFrame, terms: Seq[String],
                             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct and non-empty")
    val perDocAggs = sum(col("tf")).as("dl") +:
      terms.map(t => sum(when(col("token") === t, col("tf")).otherwise(0L)).as(s"tf_$t"))
    bm25FromPerDoc(
      postings.groupBy(col("doc_id")).agg(perDocAggs.head, perDocAggs.tail: _*),
      "doc_id", terms, k1, b)
  }

  /** QUERY-TABLE-driven BM25 top-k — the production multi-tenant
    * serving shape (r11 verdict item 5): instead of one hardcoded term
    * list compiled into the plan, the query workload arrives as a
    * RELATION `queryTerms(query_id, slot, term)` and every query is
    * answered in ONE pass over the postings artifact. The query table
    * is broadcast (a serving batch is small next to the corpus); the
    * postings join fans each matching posting out to the queries
    * naming its token, one integer slot-pivot aggregate builds the
    * per-(query, doc) tf row, and the SAME fixed-shape double
    * expression as [[bm25Scores]] scores slot 1 + slot 2 + slot 3 in
    * written order — so DuckDB replays every double bit-for-bit (the
    * summed-in-written-term-order discipline generalizes to a fixed
    * SLOT order, which is what makes a data-driven term list
    * hash-oracleable at all).
    *
    * Candidate semantics: a doc scores for a query iff it matches ≥ 1
    * of the query's terms (the postings-driven serving shape — a
    * zero-match doc can never surface from an index); zero-tf slots
    * contribute exactly 0 (the tf factor zeroes the idf), matching
    * the all-docs q102 ranking on every candidate.
    *
    * Contract: every query has exactly `slots` terms in slots
    * 1..`slots`, distinct within the query. Output: (query_id,
    * doc_id, score, rank ≤ k). Scale: corpus stats are one broadcast
    * row; per-slot dfs are one broadcast row per query; the only
    * corpus-sized shuffles are the per-doc length aggregate and the
    * (query, doc) pivot — both keyed, both map-side combined. */
  def bm25QueryTable(postings: DataFrame, queryTerms: DataFrame, slots: Int,
                     k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val perDoc = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_total"))
    val termDf = postings
      .join(broadcast(queryTerms.select(col("term")).distinct()),
        postings("token") === col("term"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .select(col("token").as("term"), col("df"))
    val qt = queryTerms.join(termDf, Seq("term"), "left")
      .select(col("query_id"), col("slot"), col("term"),
        coalesce(col("df"), lit(0L)).as("df"))
    val qdfAggs = (1 to slots).map(i =>
      max(when(col("slot") === i, col("df"))).as(s"df_$i"))
    val qdf = qt.groupBy(col("query_id")).agg(qdfAggs.head, qdfAggs.tail: _*)
    val matched = postings.join(broadcast(qt.select("query_id", "slot", "term")),
        postings("token") === col("term"))
      .select(col("query_id"), col("doc_id"), col("slot"), col("tf"))
    val pivAggs = (1 to slots).map(i =>
      sum(when(col("slot") === i, col("tf")).otherwise(0L)).as(s"tf_$i"))
    val piv = matched.groupBy(col("query_id"), col("doc_id"))
      .agg(pivAggs.head, pivAggs.tail: _*)
    val avgdl = col("t_total").cast(DoubleType) / col("n_docs").cast(DoubleType)
    def slotScore(i: Int): Column = {
      val tf = col(s"tf_$i").cast(DoubleType)
      val dfT = col(s"df_$i").cast(DoubleType)
      val idf = (col("n_docs").cast(DoubleType) - dfT + lit(0.5)) / (dfT + lit(0.5))
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast(DoubleType) / avgdl)))
    }
    val scored = piv
      .join(perDoc, Seq("doc_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (1 to slots).map(slotScore).reduce(_ + _).as("score"))
    graft.operators.Relational.topNPerGroup(scored, k,
        Seq(col("query_id")), col("score"), col("doc_id"))
      .select("query_id", "doc_id", "score", "rank")
  }

  /** The shared BM25 tail: integer per-doc rows → corpus stats → the
    * one fixed-shape double expression (see [[bm25Scores]]'s
    * oracle-exactness note). */
  private def bm25FromPerDoc(perDoc: DataFrame, idCol: String, terms: Seq[String],
                             k1: Double, b: Double): DataFrame = {
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_total")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("t_total").cast(DoubleType) / col("n_docs").cast(DoubleType)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast(DoubleType)
      val dfT = col(s"df_$t").cast(DoubleType)
      val idf = (col("n_docs").cast(DoubleType) - dfT + lit(0.5)) / (dfT + lit(0.5))
      idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast(DoubleType) / avgdl)))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol), terms.map(termScore).reduce(_ + _).as("score"))
  }

  /** IMPACT-ORDERED inverted index: one row per distinct token with its
    * full document frequency and the top-`topK` postings by term
    * frequency — the static-pruning index shape (Anh & Moffat) that
    * keeps every posting row BOUNDED regardless of corpus size, where
    * a full posting list for a stopword would be O(corpus docs) in one
    * cell.
    *
    * Shape: one token explode → integer (token, doc) tf aggregate →
    * per-token row_number window (tf desc, doc_id tiebreak) → one
    * grouped aggregate that counts df over ALL postings while folding
    * only rank ≤ topK into the postings cell (collect_list skips the
    * nulls the `when` leaves for pruned rows). The window partitions
    * by token, so the sort is distributed across the vocabulary; a
    * stopword key is the skew ceiling — its partition is O(its df) —
    * which a production variant caps the same way q54 salts joins:
    * pre-aggregate a per-salt partial top-k, then re-rank the
    * topK·salts survivors (shape documented, not needed at gate
    * scale). Postings serialize as "doc:tf,…" — list-valued cells
    * don't sort/hash portably in the compare harness (the q44 rule).
    *
    * Output: (token, df, postings), postings ordered tf desc then
    * doc_id asc. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 16): DataFrame =
    indexFromPostings(rawPostings(df, idCol, textCol), topK)

  /** Raw positional-free postings: one row per (token, doc) with its
    * term frequency. The ONE tokenize+tf pipeline shared by the
    * one-pass build above and the persisted incremental index
    * ([[TextIndex]]) — the q148 incremental ≡ full gate depends on the
    * two paths staying bit-identical, so there is exactly one copy. */
  def rawPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(Text.tokens(col(textCol))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))

  /** The postings→index tail of [[invertedIndex]], shared with the
    * persisted artifact path ([[TextIndex.indexView]]): input is raw
    * (token, doc_id, tf) rows from ANY source — a fresh text pass or a
    * committed index artifact — output is the same df + top-k cell per
    * token. */
  def indexFromPostings(tf: DataFrame, topK: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(col("tf").desc, col("doc_id").asc)
    tf.withColumn("rn", row_number().over(w))
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") <= topK,
              struct((-col("tf")).as("neg_tf"), col("doc_id").as("doc_id"))))),
            s => concat_ws(":", s.getField("doc_id"), -s.getField("neg_tf"))),
          ",").as("postings"))
  }

  /** Exact PHRASE search via positional postings — the index
    * application q111's impact-ordered postings cannot answer (they
    * drop positions): find every (doc, offset) where `phrase`'s tokens
    * occur CONSECUTIVELY. The first term's postings anchor a candidate
    * start; each later term joins on (doc, start + i) — the classic
    * positional-index intersection, evaluated lazily term by term so
    * the working set shrinks with the rarest-seen prefix.
    *
    * Scale shape: each join side is the postings of ONE token (the
    * `token = w` filter pushes into the postings scan — at 100 TB this
    * is an index lookup, not a corpus scan), and every join is an
    * equi-join on (doc, position). No windows, no explode beyond the
    * one shared positional-postings pass. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame =
    phraseSearchFromPostings(positionalPostings(df, idCol, textCol), idCol, phrase)

  /** Positional postings: one row per token OCCURRENCE (idCol, pos,
    * token), 0-based — the persisted-index twin is the positional tier
    * of [[TextIndex]]; the q153 gate depends on this being the single
    * tokenize+position pipeline (the rawPostings rule). */
  def positionalPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(split(trim(col(textCol)), " ")))
      .select(col(idCol), col("pos"), col("col").as("token"))

  /** QUERY-TABLE-driven phrase search — [[bm25QueryTable]]'s
    * multi-tenant discipline on the positional tier: N phrases (of
    * MIXED lengths) arrive as a broadcast RELATION
    * `phrases(phrase_id, slot, term)` (each phrase's slots contiguous
    * 1..len, 1-based) and are all answered in ONE pass over the
    * positional postings. Each matching posting votes for the start
    * its slot implies (`pos − (slot − 1)`); a (phrase, doc, start)
    * cell collecting one vote per slot is a complete consecutive
    * occurrence — the per-term-join intersection of
    * [[phraseSearchFromPostings]] re-expressed as one
    * map-side-combined integer aggregate, which is the shape that
    * serves a query BATCH without one join chain per phrase. Postings
    * are unique per (doc, pos) and a slot fixes its pos once the start
    * is fixed, so `count(*)` counts DISTINCT matched slots exactly —
    * repeated terms inside one phrase included; completeness is
    * `count == max(slot)`, derived per phrase from the relation
    * itself (no per-call length parameter, so one batch mixes 2-grams
    * with 5-grams). Output: (phrase_id, idCol, start_pos), 0-based
    * starts (the [[positionalPostings]] convention). */
  def phraseQueryTable(toks: DataFrame, idCol: String,
                       phrases: DataFrame): DataFrame = {
    val lens = phrases.groupBy("phrase_id").agg(max("slot").as("__len"))
    toks.join(broadcast(phrases), toks("token") === phrases("term"))
      .select(col("phrase_id"), col(idCol),
        (col("pos") - (col("slot") - 1)).as("start_pos"))
      .filter(col("start_pos") >= 0) // a late slot at an early pos can never complete
      .groupBy(col("phrase_id"), col(idCol), col("start_pos"))
      .agg(count(lit(1)).as("__votes"))
      .join(broadcast(lens), "phrase_id")
      .filter(col("__votes") === col("__len"))
      .select(col("phrase_id"), col(idCol), col("start_pos"))
  }

  /** [[phraseSearch]] evaluated over ANY positional-postings source —
    * a fresh text pass or a committed index artifact. */
  def phraseSearchFromPostings(toks: DataFrame, idCol: String,
                               phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val anchor = toks.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos").as("start_pos"))
    phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (w, i)) =>
      acc.join(
        toks.filter(col("token") === w)
          .select(col(idCol), (col("pos") - i).as("start_pos")),
        Seq(idCol, "start_pos"))
    }
  }

  /** PROXIMITY search over positional postings: docs where `termA` and
    * `termB` co-occur within `maxDist` token positions, with the pair
    * count and the closest distance — the "terms NEAR each other"
    * operator between exact phrase (order + adjacency) and bag-of-words
    * AND (no position constraint at all). Shape: each term's postings
    * are a token-filtered slice of the artifact scan; the pair match
    * is an equi-join on the doc key, so the fan-out is tfA·tfB WITHIN
    * a doc only — bounded by document length, never by corpus size.
    * (A pathological doc repeating both terms thousands of times would
    * skew its one task; the fix at that point is banding pos by
    * ⌊pos/(maxDist+1)⌋ into an equi-join on (doc, band±1) — not needed
    * while positional tf stays document-bounded.) */
  def proximitySearchFromPostings(toks: DataFrame, idCol: String,
                                  termA: String, termB: String,
                                  maxDist: Int): DataFrame = {
    val a = toks.filter(col("token") === termA)
      .select(col(idCol), col("pos").as("pa"))
    val b = toks.filter(col("token") === termB)
      .select(col(idCol), col("pos").as("pb"))
    a.join(b, Seq(idCol))
      .filter(abs(col("pa") - col("pb")) <= maxDist &&
        col("pa") =!= col("pb"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pa") - col("pb"))).as("min_dist"))
  }

  /** BOOLEAN retrieval over (token, doc_id, tf) postings: docs whose
    * token set contains ALL `must` terms and NONE of the `mustNot`
    * terms, scored by the summed tf of the must terms. The classic
    * inverted-index AND/NOT — one token-filtered slice per clause
    * family, one doc-keyed aggregate (count-distinct-token = |must| is
    * the set-containment test), one anti-join for the exclusions.
    * Every step is an equi-join/aggregate on the doc key; the must/
    * mustNot lists are query-sized literals pushed into the postings
    * scan as token IN (...) filters. */
  def booleanSearchFromPostings(postings: DataFrame,
                                must: Seq[String],
                                mustNot: Seq[String]): DataFrame = {
    require(must.nonEmpty, "boolean retrieval needs at least one must term")
    val matched = postings.filter(col("token").isin(must: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("token")).as("__k"),
        sum(col("tf")).as("match_tf"))
      .filter(col("__k") === must.size)
      .select(col("doc_id"), col("match_tf"))
    if (mustNot.isEmpty) matched
    else matched.join(
      postings.filter(col("token").isin(mustNot: _*))
        .select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Reciprocal-Rank Fusion (Cormack et al.) of N rank lists — the
    * operator that joins the lexical (BM25, q102) and dense (ANN, q23)
    * retrieval families into ONE hybrid ranking: score(d) =
    * Σᵢ 1/(k0 + rankᵢ(d)) over the systems that returned d.
    *
    * Oracle-exactness discipline (the q131 rational rule): the sum of
    * reciprocals is kept as ONE exact int64 rational, folded list by
    * list in written order — n/d + 1/(k0+r) = (n·(k0+r) + d, d·(k0+r))
    * — so `rrf_num`/`rrf_den` are bit-exact in any engine; a float
    * Σ 1/(k0+r) would be an order-sensitive double sum. The emitted
    * `rrf_score` is the single division num/den (one correctly-rounded
    * IEEE op — deterministic both engines), and the fused rank orders
    * by that score with an id tiebreak. Denominators stay in int64 for
    * N ≤ 8 lists at k0 + max rank ≤ ~180 ((k0+r)^8 < 2⁶³); the
    * `require` makes the envelope loud.
    *
    * Scale shape: the inputs are top-k lists — each system has already
    * reduced the corpus to ≤ k rows — so the N-way full-outer join and
    * the final rank window run over ≤ N·k rows, never the corpus. The
    * heavy lifting (the BM25 aggregate, the ANN probe) stays in the
    * upstream operators with their own scale contracts.
    *
    * Input: each DataFrame carries (idCol, rankCol) with rank ≥ 1.
    * Output: (idCol, rrf_num, rrf_den, rrf_score, rank). */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              k0: Int = 60): DataFrame = {
    require(lists.nonEmpty && lists.size <= 8,
      s"rrfFuse takes 1..8 rank lists, got ${lists.size} (int64 rational envelope)")
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"__rrf_r$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val (num, den) = lists.indices.foldLeft((lit(0L), lit(1L))) { case ((n, d), i) =>
      val r = col(s"__rrf_r$i")
      val t = lit(k0.toLong) + r
      (when(r.isNull, n).otherwise(n * t + d),
        when(r.isNull, d).otherwise(d * t))
    }
    import org.apache.spark.sql.expressions.Window
    joined
      .select(col(idCol), num.as("rrf_num"), den.as("rrf_den"))
      .withColumn("rrf_score",
        col("rrf_num").cast(DoubleType) / col("rrf_den").cast(DoubleType))
      // the window input is the fused candidate set (≤ N·k rows by
      // construction), so the single-partition sort is bounded — the
      // q102 orderBy-limit lesson does not apply to an already-reduced set
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col(idCol))))
  }
}
