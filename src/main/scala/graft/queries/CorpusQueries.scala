package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Dedup, Hashes, LanguageModel, Multimodal, Pca, Retrieval, Similarity, SuffixDedup, Text, TextIndex}

/** Round-8 corpus-operator batch: maximal duplicate-span extraction,
  * impact-ordered inverted indexing, sliding-window chunking, a
  * corpus-trained character-LM quality signal, and the join-based
  * batch ANN scorer for corpus-sized query sets. Everything exact is
  * oracle-gated; the two double-valued production forms (LM bits, ANN)
  * are spec-pinned.
  */
object CorpusQueries {
  import ExtensionQueries.{dotSql, ivfAssignCteSql}

  /** q110 — MAXIMAL duplicated token spans per doc pair (where q89's
    * winnowing only says "a span exists"): positional 5-gram matches
    * merged along diagonals by gaps-and-islands — see
    * [[graft.functions.Dedup.maximalDuplicateSpans]] for the scale
    * shape (df-capped gram join, pair+diagonal-partitioned window —
    * never O(n²), no global sort). */
  val q110 = Q("q110_max_dup_spans",
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |p AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS pos
      |      FROM toks WHERE len(t) >= 5),
      |pg AS (SELECT doc_id, pos,
      |              t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' ||
      |              t[pos+3] || ' ' || t[pos+4] AS gram
      |       FROM p),
      |keptg AS (SELECT gram FROM pg GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 100),
      |kept AS (SELECT pg.doc_id, pg.pos, pg.gram FROM pg JOIN keptg USING (gram)),
      |m AS (SELECT ka.doc_id AS a, kb.doc_id AS b, ka.pos AS pa, kb.pos AS pb
      |      FROM kept ka JOIN kept kb
      |        ON ka.gram = kb.gram AND ka.doc_id < kb.doc_id),
      |i AS (SELECT a, b, pa, pb, pa - pb AS diag,
      |             pa - row_number() OVER (PARTITION BY a, b, pa - pb
      |                                     ORDER BY pa) AS isl
      |      FROM m)
      |SELECT a, b, MIN(pa) AS start_a, MIN(pb) AS start_b,
      |       COUNT(*) + 4 AS span_tokens
      |FROM i GROUP BY a, b, diag, isl
      |HAVING COUNT(*) + 4 >= 8""".stripMargin) { (s, d) =>
    Dedup.maximalDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
      n = 5, maxDf = 100L, minSpanTokens = 8)
  }

  /** q111 — impact-ordered inverted index: full df per token, top-16
    * postings by tf. Postings serialize as "doc:tf,…" (the q44
    * list-cell rule). See
    * [[graft.functions.Retrieval.invertedIndex]]. */
  val q111 = Q("q111_inverted_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
      |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |r AS (SELECT token, doc_id, tf,
      |             row_number() OVER (PARTITION BY token
      |                                ORDER BY tf DESC, doc_id) AS rn
      |      FROM tf)
      |SELECT token, COUNT(*) AS df,
      |       array_to_string(list(doc_id || ':' || tf ORDER BY tf DESC, doc_id)
      |                         FILTER (WHERE rn <= 16), ',') AS postings
      |FROM r GROUP BY token""".stripMargin) { (s, d) =>
    Retrieval.invertedIndex(Tables.documents(s, d), "doc_id", "text", topK = 16)
  }

  /** q112 — sliding-window chunking (64-token chunks, stride 48):
    * scan-speed per-row expression work, integer boundaries — see
    * [[graft.functions.Text.chunkWindows]]. */
  val q112 = Q("q112_chunk_windows",
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |d AS (SELECT doc_id, t, greatest(len(t) - 64, 0) AS x FROM toks),
      |c AS (SELECT doc_id, t, unnest(range(0, (x + 47) // 48 + 1)) AS chunk_id FROM d)
      |SELECT doc_id, chunk_id,
      |       1 + chunk_id * 48 AS start_tok,
      |       len(t[1 + chunk_id*48 : chunk_id*48 + 64]) AS n_tokens,
      |       array_to_string(t[1 + chunk_id*48 : chunk_id*48 + 64], ' ') AS chunk_text
      |FROM c""".stripMargin) { (s, d) =>
    Text.chunkWindows(Tables.documents(s, d), "doc_id", "text",
      chunkTokens = 64, stride = 48)
  }

  /** q113 — corpus-trained char-trigram LM score, ORACLE-EXACT
    * fixed-point form (add-one smoothing, integer `div` end-to-end) —
    * see [[graft.functions.LanguageModel]] for the no-transcendentals
    * rationale. Higher avg_p_fp = more probable under the corpus
    * model. */
  val q113 = Q("q113_charlm",
    """WITH occ AS (
      |  SELECT doc_id, g3, substr(g3, 1, 2) AS g2 FROM (
      |    SELECT doc_id,
      |           unnest(list_transform(range(1, length(trim(text)) - 1),
      |                                 i -> substr(trim(text), CAST(i AS INT), 3))) AS g3
      |    FROM documents WHERE length(trim(text)) >= 3)),
      |c3 AS (SELECT g3, COUNT(*) AS c3 FROM occ GROUP BY 1),
      |c2 AS (SELECT g2, COUNT(*) AS c2 FROM occ GROUP BY 1),
      |vv AS (SELECT COUNT(DISTINCT g3) AS v FROM occ),
      |sc AS (SELECT occ.doc_id, (1000000 * (c3.c3 + 1)) // (c2.c2 + vv.v) AS p_fp
      |       FROM occ JOIN c3 USING (g3) JOIN c2 USING (g2) CROSS JOIN vv),
      |pd AS (SELECT doc_id, COUNT(*) AS n_pos, SUM(p_fp) AS sum_p_fp FROM sc GROUP BY 1)
      |SELECT d.doc_id, COALESCE(pd.n_pos, 0) AS n_pos,
      |       CAST(CASE WHEN pd.n_pos IS NULL THEN NULL
      |                 ELSE pd.sum_p_fp // pd.n_pos END AS BIGINT) AS avg_p_fp
      |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id""".stripMargin) { (s, d) =>
    LanguageModel.fixedPointScores(Tables.documents(s, d), "doc_id", "text",
      scale = 1000000L)
  }

  /** q113_prod — the production bits-per-char form (mean −log₂P):
    * double log summation is grouped-aggregate order-sensitive, so no
    * hash oracle; CorpusOpsSpec pins it against a driver-computed
    * reference with ε-tolerance, and Bench times THIS form (the
    * oracle twin is skipped by the `_prod` rule). */
  val q113p = Q.noOracle("q113_charlm_prod") { (s, d) =>
    LanguageModel.bitsPerChar(Tables.documents(s, d), "doc_id", "text")
  }

  /** q114 — join-based batch ANN: EVERY vector is a query (all-corpus
    * k-NN), candidates met through a shuffle equi-join on IVF cell —
    * the corpus-sized-query-set operator the q23/q24 broadcast
    * allowlist note names. Deterministic id-sample codebook ⇒ fully
    * oracled (probe set, candidate set, cosines, ranks all reproduce
    * in SQL). See [[graft.functions.Similarity.ivfBatchTopK]]. */
  val q114 = Q("q114_ann_batch_join",
    s"""$ivfAssignCteSql,
       |probes AS (
       |  SELECT vec_id AS query_id, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_sim DESC, centroid_id) AS pr
       |    FROM scored)
       |  WHERE pr <= 4),
       |av AS (
       |  SELECT a.vec_id, a.centroid_id, v.e, sqrt(${dotSql("v.e", "v.e")}) AS nrm
       |  FROM assigned a JOIN v ON v.vec_id = a.vec_id),
       |cand AS (
       |  SELECT p.query_id, av.vec_id AS neighbor_id,
       |         ${dotSql("qv.e", "av.e")} / (qv.nrm * av.nrm) AS cos_sim
       |  FROM probes p
       |  JOIN av ON av.centroid_id = p.centroid_id
       |  JOIN av qv ON qv.vec_id = p.query_id
       |  WHERE av.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM cand) WHERE rank <= 10""".stripMargin) { (s, d) =>
    val vecs = Tables.embeddings(s, d)
    val c = Similarity.codebookSize(vecs.count())
    Similarity.ivfBatchTopK(vecs, Similarity.centroids(vecs, c), k = 10, nprobe = 4)
  }

  /** q115 — vocabulary coverage / OOV rate: per-doc token counts
    * against the top-K corpus vocabulary (the q69 tokenizer-training
    * pass turned into the audit a tokenizer change needs: which docs
    * fall outside the vocab, and by how much). K=20 at gate scale so
    * the fixture's ~31-token vocab actually produces OOV; production
    * K is 10⁵ — same plan. The vocab side is LIMIT-bounded, so its
    * broadcast hint is structurally safe (the PlanAudit classifier
    * proves it); integer counts end-to-end. */
  val q115 = Q("q115_oov_rate",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
      |vocab AS (SELECT token FROM (
      |  SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
      |  ORDER BY n DESC, token LIMIT 20)),
      |j AS (SELECT t.doc_id, v.token AS vt
      |      FROM toks t LEFT JOIN vocab v ON t.token = v.token)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |       CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |FROM j GROUP BY doc_id""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
      .select(col("token"), lit(1L).as("in_v"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** q116 — intra-document segment dedup (first occurrence wins, order
    * preserved): the doc-LOCAL half of the dedup family — q72 cuts
    * segments hot across the corpus, this collapses repeats inside one
    * document (looping templates, scraper stutter). The Spark side is a
    * single map-side `array_distinct` projection — zero shuffles, the
    * one dedup operator that runs at scan speed at 100 TB; the oracle
    * reproduces first-occurrence-in-order via min(pos) + ordered
    * string_agg. segLen=2 so the gate corpus actually exercises
    * in-doc repeats. */
  val q116 = Q("q116_intradoc_dedup",
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |segs0 AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(0, CAST(ceil(len(t) / 2.0) AS BIGINT)),
      |           j -> {'pos': j, 'seg': array_to_string(t[(j*2+1):(j*2+2)], ' ')})) AS u
      |  FROM toks),
      |segs AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM segs0),
      |firsts AS (SELECT doc_id, seg, MIN(pos) AS pos FROM segs GROUP BY 1, 2)
      |SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text
      |FROM firsts GROUP BY doc_id""".stripMargin) { (s, d) =>
    Dedup.dedupWithinDoc(Tables.documents(s, d), "doc_id", "text", segLen = 2)
  }

  /** q117 — span-dedup APPLY (Lee et al. ExactSubstr removal): q110's
    * spans cut from the higher-id doc of each pair, overlapping cuts
    * merged by doc-partitioned gaps-and-islands windows, text rebuilt
    * from surviving tokens. The oracle replays the identical algebra:
    * the q110 span CTE → running-max interval merge → covered-position
    * anti-join → ordered string_agg. Fully-covered docs drop in both
    * engines. See [[graft.functions.Dedup.cutDuplicateSpans]] for the
    * corpus-linear scale shape. */
  val q117 = Q("q117_span_dedup_apply",
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |p AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS pos
      |      FROM toks WHERE len(t) >= 5),
      |pg AS (SELECT doc_id, pos,
      |              t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' ||
      |              t[pos+3] || ' ' || t[pos+4] AS gram
      |       FROM p),
      |keptg AS (SELECT gram FROM pg GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 100),
      |kept AS (SELECT pg.doc_id, pg.pos, pg.gram FROM pg JOIN keptg USING (gram)),
      |m AS (SELECT ka.doc_id AS a, kb.doc_id AS b, ka.pos AS pa, kb.pos AS pb
      |      FROM kept ka JOIN kept kb
      |        ON ka.gram = kb.gram AND ka.doc_id < kb.doc_id),
      |i AS (SELECT a, b, pa, pb, pa - pb AS diag,
      |             pa - row_number() OVER (PARTITION BY a, b, pa - pb
      |                                     ORDER BY pa) AS isl
      |      FROM m),
      |sp AS (SELECT a, b, MIN(pa) AS start_a, MIN(pb) AS start_b,
      |              COUNT(*) + 4 AS span_tokens
      |       FROM i GROUP BY a, b, diag, isl
      |       HAVING COUNT(*) + 4 >= 8),
      |cut AS (SELECT DISTINCT b AS doc_id, start_b AS s,
      |               start_b + span_tokens - 1 AS e FROM sp),
      |m0 AS (SELECT doc_id, s, e,
      |              MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |       FROM cut),
      |m1 AS (SELECT doc_id, s, e,
      |              CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END AS ni
      |       FROM m0),
      |m2 AS (SELECT doc_id, s, e,
      |              SUM(ni) OVER (PARTITION BY doc_id ORDER BY s, e
      |                            ROWS UNBOUNDED PRECEDING) AS isl
      |       FROM m1),
      |mi AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM m2 GROUP BY doc_id, isl),
      |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM mi),
      |tp AS (SELECT doc_id, unnest(t) AS tok,
      |              generate_subscripts(t, 1) AS pos FROM toks),
      |keep AS (SELECT tp.doc_id, tp.pos, tp.tok
      |         FROM tp LEFT JOIN cov
      |           ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
      |         WHERE cov.pos IS NULL)
      |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      |FROM keep GROUP BY doc_id""".stripMargin) { (s, d) =>
    Dedup.cutDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
      n = 5, maxDf = 100L, minSpanTokens = 8)
  }

  /** DuckDB CTE replaying [[Multimodal.perceptualHash]] over the
    * Md5Decoder in closed form: the JVM side iterates the grid LCG
    * (st ← a·st + c mod 2⁶⁴, pixel = top byte) 72 times from the
    * payload's h60 checksum; mod-2⁶⁴ power sums give pixel i directly
    * as (a^(i+1)·chk + c·Σa^j) mod 2⁶⁴ ≫ 56, so the oracle inlines the
    * 72 precomputed (A, C) constant pairs and needs no recursion. All
    * intermediates ride HUGEINT (64×64-bit products are 128-bit; BIGINT
    * would overflow-error), and the final 64-bit sum wraps back to the
    * SIGNED BIGINT the JVM long carries. */
  private val phashCteSql: String = {
    val M = BigInt(1) << 64
    val a = BigInt(6364136223846793005L)
    val c = BigInt(1442695040888963407L)
    val consts = Iterator.iterate((BigInt(1), BigInt(0))) { case (an, cn) =>
      ((an * a) % M, (cn * a + c) % M)
    }.drop(1).take(72).toSeq
    val pairs = consts.map { case (an, cn) => s"[$an::HUGEINT,$cn::HUGEINT]" }
      .mkString("[", ",", "]")
    val h = Hashes.h60Sql("text")
    s"""chk AS (SELECT doc_id, $h AS chk FROM documents
       |        WHERE text IS NOT NULL),
       |px AS (SELECT doc_id, list_transform($pairs,
       |         gp -> CAST(((gp[1] * chk::HUGEINT + gp[2]) % 18446744073709551616::HUGEINT)
       |                    // 72057594037927936 AS BIGINT)) AS px FROM chk),
       |bits AS (SELECT doc_id, list_sum(list_transform(range(0, 64),
       |           gb -> CASE WHEN px[(gb // 8) * 9 + (gb % 8) + 1] <
       |                           px[(gb // 8) * 9 + (gb % 8) + 2]
       |                      THEN CAST(1 AS HUGEINT) << gb ELSE 0::HUGEINT END)) AS s
       |         FROM px),
       |ph AS (SELECT doc_id, CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
       |                                THEN s - 18446744073709551616::HUGEINT
       |                                ELSE s END AS BIGINT) AS phash
       |       FROM bits)""".stripMargin
  }

  /** q118 — perceptual image hash (dHash) over the media table's
    * decoder grid, through the multimodal mapPartitions batch path.
    * Registered with the md5 stub decoder so the DuckDB oracle replays
    * every bit (closed-form LCG, [[phashCteSql]]); the FNV production
    * decoder twin is benched instead (q26/q28 house pattern). */
  val q118 = Q("q118_phash",
    s"WITH $phashCteSql SELECT doc_id, phash FROM ph") { (s, d) =>
    Multimodal.perceptualHash(
      Multimodal.mediaTable(Tables.documents(s, d)), Multimodal.Md5Decoder)
  }

  val q118p = Q.noOracle("q118_phash_prod") { (s, d) =>
    Multimodal.perceptualHash(
      Multimodal.mediaTable(Tables.documents(s, d)), Multimodal.StubDecoder)
  }

  /** q119 — perceptual near-duplicate image pairs: q118's hashes,
    * banded into 4×16-bit blocks and Hamming-gated ≤ 3 (recall exact by
    * pigeonhole — [[Dedup.bandedHammingPairs]], the machinery SimHash
    * q84 uses). The oracle brute-forces all O(n²) pairs — affordable
    * only at gate scale, which is exactly why the registered plan
    * blocks by band instead. On the driver corpus the surviving pairs
    * are the byte-identical payload groups (the stub decoder is
    * hash-chaotic — see [[Multimodal.perceptualHash]]'s honest-limit
    * note; sf0.01 has none, sf0.1 has its exact-dup texts); Hamming
    * 1–3 recall is pinned at the hash level in `MultimodalSpec`. */
  val q119 = Q("q119_phash_neardup",
    s"""WITH $phashCteSql
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |       CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
       |FROM ph x JOIN ph y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.phash, y.phash)) <= 3""".stripMargin) { (s, d) =>
    Dedup.bandedHammingPairs(
      Multimodal.perceptualHash(
        Multimodal.mediaTable(Tables.documents(s, d)), Multimodal.Md5Decoder),
      "doc_id", "phash", maxHamming = 3, bands = 4)
  }

  val q119p = Q.noOracle("q119_phash_neardup_prod") { (s, d) =>
    Dedup.bandedHammingPairs(
      Multimodal.perceptualHash(
        Multimodal.mediaTable(Tables.documents(s, d)), Multimodal.StubDecoder),
      "doc_id", "phash", maxHamming = 3, bands = 4)
  }

  /** q121 — Unicode text cleaning ([[Text.cleanText]]): NFC
    * canonical composition (the native `graft_nfc` expression — Spark
    * has no built-in, and without it hash-based dedup treats decomposed
    * "e+◌́" and precomposed "é" as different documents), control-char
    * scrub, whitespace collapse, trim. The corpus is ASCII-clean, so
    * the query INJECTS a deterministic dirty suffix (tab, combining
    * acute accents, a double space — the q74 synthetic-PII discipline)
    * into every doc before cleaning; both engines inject identically
    * and the oracle runs DuckDB's `nfc_normalize` + 'g'-flag
    * regexp_replace twins. Lengths before/after pin the code-point
    * accounting as well as the bytes. */
  val q121 = Q("q121_text_clean",
    """WITH dirty AS (
      |  SELECT doc_id,
      |         text || chr(9) || 'A' || chr(769) || 'cafe' || chr(769) || '  end' AS d
      |  FROM documents)
      |SELECT doc_id,
      |       trim(regexp_replace(regexp_replace(nfc_normalize(d),
      |              '[\x00-\x1f\x7f]', ' ', 'g'), ' {2,}', ' ', 'g')) AS clean_text,
      |       CAST(length(d) AS BIGINT) AS raw_chars,
      |       CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(d),
      |              '[\x00-\x1f\x7f]', ' ', 'g'), ' {2,}', ' ', 'g'))) AS BIGINT) AS clean_chars
      |FROM dirty""".stripMargin) { (s, d) =>
    // the DECOMPOSED injection (A+U+0301, e+U+0301), matching the
    // oracle's chr(9)/chr(769) suffix byte-for-byte pre-clean
    val dirty = concat(col("text"), lit("\tA\u0301cafe\u0301  end"))
    Tables.documents(s, d).select(
      col("doc_id"),
      Text.cleanText(dirty).as("clean_text"),
      length(dirty).cast("long").as("raw_chars"),
      length(Text.cleanText(dirty)).cast("long").as("clean_chars"))
  }

  /** q122 — distributed PCA, gate half: the exact integer covariance
    * numerator under the ·2¹⁶ floor quantizer ([[Pca.quantizedCovariance]]
    * — see the object doc for why the FLOAT covariance cannot sit under
    * a value-hash gate and the quantized twin can). The registered plan
    * is the production SHAPE — one mapPartitions moment sweep, one
    * bounded partial per partition, no shuffle — while the oracle
    * re-derives every (i ≤ j) numerator from first principles via an
    * n·d explode + self-join (affordable at gate scale only, which is
    * exactly the point: the engine never runs that plan). */
  val q122 = Q("q122_pca_cov",
    """WITH ex AS (
      |  SELECT vec_id, u.i AS i, u.qx AS qx FROM (
      |    SELECT vec_id, unnest(list_transform(range(1, 65),
      |      gi -> {'i': CAST(gi - 1 AS BIGINT),
      |             'qx': CAST(floor(CAST(embedding[gi] AS DOUBLE) * 65536) AS BIGINT)})) AS u
      |    FROM embeddings)),
      |s AS (SELECT i, CAST(SUM(qx) AS BIGINT) AS si FROM ex GROUP BY i),
      |agg AS (SELECT a.i AS i, b.i AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS ssij
      |        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      |        GROUP BY a.i, b.i)
      |SELECT agg.i AS i, agg.j AS j,
      |       (SELECT COUNT(*) FROM embeddings) * agg.ssij - sa.si * sb.si AS cov_num
      |FROM agg JOIN s sa ON sa.i = agg.i JOIN s sb ON sb.i = agg.j""".stripMargin) {
    (s, d) => Pca.quantizedCovariance(Tables.embeddings(s, d), "embedding", 64)
  }

  /** q122p — distributed PCA, production half: double-precision moments
    * (same one-pass partial-aggregate shape), driver-side Jacobi on the
    * 64×64 covariance, and the map-only top-8 projection. Float sums
    * are order-sensitive, so no value oracle by design; PcaSpec pins
    * orthonormality, the eigen-residual ‖Cb−λb‖, descending eigenvalues,
    * trace/variance accounting, projected-component variance ≈ λ, and
    * run-to-run determinism. */
  val q122p = Q.noOracle("q122_pca_project") { (s, d) =>
    val vecs = Tables.embeddings(s, d)
    // posexplode to (vec_id, component_idx, value) scalars: the driver's
    // pandas canonicalizer cannot sort an array<double> column (r10's
    // harness crash), and the math is pinned in PcaSpec either way.
    Pca.project(vecs, Pca.fit(vecs, "embedding", 64, 8))
      .select(col("vec_id"),
        posexplode(col("proj")).as(Seq("component_idx", "value")))
  }

  /** q124 — video near-duplicates by shared keyframe signatures:
    * [[Multimodal.frameSignatures]] (16-char frames of the decoded
    * payload, md5-h60 per frame — every bit oracle-replayable) feeding
    * [[Multimodal.videoNearDupPairs]] (distinct per-doc signatures,
    * frame-df cap ≤ 100, banded equi-join, pairs sharing ≥ 2 frames).
    * The image side (q118/q119) matches WHOLE near-identical stills;
    * this is the clip-level analogue that survives edits keeping most
    * keyframes. The fixture yields real pairs (26 at sf0.01, ~300 at
    * sf0.1 — aligned 16-char windows of repeated word runs), so the
    * gate exercises the pair path, not an empty set. */
  val q124 = Q("q124_video_neardup",
    s"""WITH f AS (
       |  SELECT doc_id, text, unnest(range(0, CAST(length(text) // 16 AS BIGINT))) AS j
       |  FROM documents WHERE text IS NOT NULL),
       |fh AS (SELECT doc_id,
       |              ${Hashes.h60Sql("substr(text, CAST(j * 16 + 1 AS BIGINT), 16)")} AS fhash
       |       FROM f),
       |d AS (SELECT DISTINCT doc_id, fhash FROM fh),
       |keep AS (SELECT fhash FROM d GROUP BY fhash HAVING COUNT(*) BETWEEN 2 AND 100),
       |dk AS (SELECT d.doc_id, d.fhash FROM d JOIN keep USING (fhash))
       |SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_shared
       |FROM dk a JOIN dk b ON a.fhash = b.fhash AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin) { (s, d) =>
    Multimodal.videoNearDupPairs(
      Multimodal.frameSignatures(
        Multimodal.mediaTable(Tables.documents(s, d)), stride = 16))
  }

  /** q124p — the production twin: xxhash64 frame signatures (one codegen
    * op per frame, no md5 hex round-trip — the q20/q22 hashed-gram
    * discipline). Same plan shape; MultimodalSpec pins md5-path ≡
    * xxhash-path pair sets on the fixture. */
  val q124p = Q.noOracle("q124_video_neardup_prod") { (s, d) =>
    Multimodal.videoNearDupPairs(
      Multimodal.frameSignatures(
        Multimodal.mediaTable(Tables.documents(s, d)), stride = 16,
        hashFn = xxhash64(_)))
  }

  /** q128 — CCNet-style per-language LM buckets: every language's docs
    * ranked by the corpus char-LM score (q113's fixed-point integer
    * form — exactly oracle-replayable, unlike the float bits-per-char
    * twin) and cut into head/middle/tail terciles with `ntile(3)` —
    * the Wenzek et al. 2020 quality-stratification step that feeds
    * curriculum and filtering decisions per language rather than
    * globally (a global cut would mark whole low-resource languages
    * "tail"). Docs too short to score (n_pos = 0) drop, as in CCNet.
    * One window per language over already-aggregated per-doc scores —
    * the window input is |docs| rows, not |positions|. Oracle: q113's
    * CTE chain spliced with the same ntile arithmetic. */
  val q128: Q = {
    val closing = """SELECT d.doc_id, COALESCE(pd.n_pos, 0) AS n_pos,
      |       CAST(CASE WHEN pd.n_pos IS NULL THEN NULL
      |                 ELSE pd.sum_p_fp // pd.n_pos END AS BIGINT) AS avg_p_fp
      |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id""".stripMargin
    val base = q113.oracle.get
    require(base.contains(closing), "q113 oracle changed shape under q128")
    val sql = base.replace(closing,
      """lm AS (SELECT doc_id, CAST(sum_p_fp // n_pos AS BIGINT) AS avg_p_fp FROM pd)
        |SELECT l.doc_id, d.lang, l.avg_p_fp,
        |  CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY l.avg_p_fp DESC, l.doc_id)
        |       WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM lm l JOIN documents d ON d.doc_id = l.doc_id""".stripMargin)
      .replace("FROM sc GROUP BY 1)\nlm AS", "FROM sc GROUP BY 1),\nlm AS")
    Q("q128_ccnet_buckets", sql) { (s, d) =>
      val lm = LanguageModel.fixedPointScores(Tables.documents(s, d), "doc_id", "text",
          scale = 1000000L)
        .filter(col("n_pos") > 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("avg_p_fp").desc, col("doc_id"))
      lm.join(Tables.documents(s, d).select("doc_id", "lang"), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("avg_p_fp"),
          ntile(3).over(w).as("nt"))
        .select(col("doc_id"), col("lang"), col("avg_p_fp"),
          when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
            .otherwise("tail").as("bucket"))
    }
  }

  /** q129 — ALIGNED clip matching (the Shazam offset-consistency vote,
    * Wang 2003, over the same frame signatures q124 shares): each
    * matching frame votes for its time shift Δ = frame_a − frame_b and
    * the pair's best-supported alignment wins — true re-use
    * concentrates votes on one Δ, coincidence scatters. Completes the
    * multimodal dedup triad: whole-still (q118/q119), unordered clip
    * overlap (q124), time-ALIGNED overlap (here). All integer
    * arithmetic over md5-h60 frame hashes — every vote
    * oracle-replayable. */
  val q129 = Q("q129_aligned_match",
    s"""WITH f AS (
       |  SELECT doc_id, text, unnest(range(0, CAST(length(text) // 16 AS BIGINT))) AS j
       |  FROM documents WHERE text IS NOT NULL),
       |fh AS (SELECT doc_id, j AS frame_idx,
       |              ${Hashes.h60Sql("substr(text, CAST(j * 16 + 1 AS BIGINT), 16)")} AS fhash
       |       FROM f),
       |dist AS (SELECT DISTINCT doc_id, fhash FROM fh),
       |keep AS (SELECT fhash FROM dist GROUP BY fhash HAVING COUNT(*) BETWEEN 2 AND 100),
       |dk AS (SELECT fh.doc_id, fh.frame_idx, fh.fhash FROM fh JOIN keep USING (fhash)),
       |v AS (SELECT a.doc_id AS a, b.doc_id AS b,
       |             a.frame_idx - b.frame_idx AS shift, COUNT(*) AS votes
       |      FROM dk a JOIN dk b ON a.fhash = b.fhash AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2, 3),
       |r AS (SELECT a, b, shift, votes,
       |             row_number() OVER (PARTITION BY a, b
       |                                ORDER BY votes DESC, shift) AS rn
       |      FROM v)
       |SELECT a, b, CAST(shift AS BIGINT) AS best_shift, votes
       |FROM r WHERE rn = 1 AND votes >= 2""".stripMargin) { (s, d) =>
    Multimodal.alignedMatchPairs(
      Multimodal.frameSignatures(
        Multimodal.mediaTable(Tables.documents(s, d)), stride = 16))
  }

  /** q132 — coarse-to-fine ANN through the PCA model
    * ([[Pca.prefilterTopK]]): shortlist in 24-dim projected space
    * (top-24 components carry ~52 % of this corpus's variance — the
    * synthetic embeddings are deliberately near-isotropic, PCA's WORST
    * case, measured in PcaSpec's knee table), exact 64-dim cosine
    * rerank on the survivors — a third cost/recall point beside IVF
    * (q24) and PQ (q100). Float projections ⇒ no value oracle; recall
    * ≥ 0.9 @ (k=24, shortlist=16·k) vs the exact scan is pinned in
    * PcaSpec, with the shortlist=n degenerate case exactly equal. */
  val q132 = Q.noOracle("q132_pca_prefilter_topk") { (s, d) =>
    val vecs = Tables.embeddings(s, d)
    Pca.prefilterTopK(vecs, vecs.filter(col("vec_id") < 8), // small query set
      Pca.fit(vecs, "embedding", 64, 24), k = 10, shortlist = 160)
  }

  /** q134 — exact PHRASE search via positional postings
    * ([[Retrieval.phraseSearch]]): every (doc, start offset) where the
    * three query tokens occur consecutively — the index application
    * q111's position-free impact postings cannot answer. Each phrase
    * term's postings are a token-filtered slice of ONE shared
    * positional explode (an index lookup at scale, not a corpus scan)
    * and the intersection is equi-joins on (doc, offset). The fixture
    * phrase has df 7 at sf0.01 — real hits, not a vacuous empty set.
    * Oracle: the same consecutive-token predicate evaluated directly
    * on the token arrays. */
  val q134 = Q("q134_phrase_search",
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, CAST(i - 1 AS INT) AS start_pos
      |FROM t, unnest(range(1, len(w) - 1)) AS u(i)
      |WHERE w[i] = 'part' AND w[i+1] = 'filter' AND w[i+2] = 'scan'""".stripMargin) {
    (s, d) =>
      Retrieval.phraseSearch(Tables.documents(s, d), "doc_id", "text",
        Seq("part", "filter", "scan"))
  }

  /** Shared oracle CTE chain for the exact-substring family: every
    * length-8 token window with its corpus-wide duplication count —
    * the brute-force n·win materialization DuckDB can afford at gate
    * scale, which the engine's prefix-doubling labels must equal
    * EXACTLY (no hash, no df cap in either path). Ends with
    * `dupw(doc_id, pos, n_dup)`. */
  private val exactWindowCteSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS t
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, unnest(range(1, len(t) - 8 + 2)) AS pos, t
      |  FROM toks WHERE len(t) >= 8),
      |ws AS (
      |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      |         array_to_string(list_slice(t, pos, pos + 7), ' ') AS wstr
      |  FROM w),
      |g AS (SELECT wstr, COUNT(*) AS n_dup FROM ws GROUP BY 1),
      |dupw AS (
      |  SELECT ws.doc_id, ws.pos, g.n_dup
      |  FROM ws JOIN g USING (wstr) WHERE g.n_dup >= 2)""".stripMargin

  /** q138 — EXACT duplicated substring windows via distributed prefix
    * doubling ([[SuffixDedup.duplicateWindows]]): every position whose
    * length-8 token window recurs anywhere in the corpus, with the
    * occurrence count. This upgrades the span family from q110's
    * winnowing/positional-gram APPROXIMATION (hashed grams + df cap)
    * to the real suffix-array algorithm behind Lee et al. ExactSubstr:
    * the decision path has no hashes and no caps, duplication is a
    * group size (never a pair join), and the whole construction is
    * ⌈log₂ 8⌉ = 3 keyed aggregate+join rounds — the O(log L)
    * distributed SA recipe (Flick & Aluru). The oracle materializes
    * every window verbatim and counts — exactly what the labels
    * assert. */
  val q138 = Q("q138_exact_dup_windows",
    s"""$exactWindowCteSql
       |SELECT doc_id, pos, CAST(n_dup AS BIGINT) AS n_dup FROM dupw""".stripMargin) {
    (s, d) =>
      SuffixDedup.duplicateWindows(Tables.documents(s, d), "doc_id", "text", win = 8)
  }

  /** q139 — maximal EXACT duplicated spans ([[SuffixDedup
    * .duplicateSpans]]): q138's [pos, pos+7] windows merged per doc by
    * the house gaps-and-islands interval merge (the q117 shape),
    * emitting each span with the window count it absorbed. Every
    * length-8 window inside a span is duplicated somewhere — q110's
    * span view with the exactness guarantee its df cap forfeits. */
  val q139 = Q("q139_exact_dup_spans",
    s"""$exactWindowCteSql,
       |iv AS (SELECT doc_id, pos AS s, pos + 7 AS e FROM dupw),
       |ord AS (
       |  SELECT doc_id, s, e,
       |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM iv),
       |isl AS (
       |  SELECT doc_id, s, e,
       |         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY s, e
       |                 ROWS UNBOUNDED PRECEDING) AS island
       |  FROM ord)
       |SELECT doc_id, CAST(MIN(s) AS BIGINT) AS s, CAST(MAX(e) AS BIGINT) AS e,
       |       COUNT(*) AS n_windows
       |FROM isl GROUP BY doc_id, island""".stripMargin) { (s, d) =>
    SuffixDedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text", win = 8)
  }

  /** q140 — ExactSubstr REMOVAL over the exact window groups
    * ([[SuffixDedup.cutExactDuplicateSpans]]): the canonical
    * (lexicographically-first) occurrence of every duplicated window
    * keeps its tokens, all other occurrences are cut, texts rebuilt in
    * token order. q117 is this step's pair-based approximation (cut
    * from the higher-id doc per PAIR — a three-way duplicate can lose
    * every copy); the group view provably retains one canonical copy
    * per window. Canonicality in the oracle is `row_number() = 1 over
    * (window-content ORDER BY doc_id, pos)` — the same (doc, pos)
    * minimum the engine's label already encodes, so the policy costs
    * the engine one integer comparison. */
  val q140 = Q("q140_exact_span_cut",
    s"""$exactWindowCteSql,
       |nc AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT ws.doc_id, ws.pos,
       |           row_number() OVER (PARTITION BY ws.wstr
       |                              ORDER BY ws.doc_id, ws.pos) AS rn,
       |           g.n_dup
       |    FROM ws JOIN g USING (wstr))
       |  WHERE n_dup >= 2 AND rn >= 2),
       |covered AS (
       |  SELECT DISTINCT doc_id, pos + off AS p
       |  FROM nc CROSS JOIN (SELECT unnest(range(0, 8)) AS off)),
       |tp AS (
       |  SELECT doc_id, unnest(t) AS tok,
       |         CAST(unnest(range(1, len(t) + 1)) AS BIGINT) AS pos
       |  FROM toks),
       |kept AS (
       |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
       |  WHERE NOT EXISTS (SELECT 1 FROM covered c
       |                    WHERE c.doc_id = tp.doc_id AND c.p = tp.pos))
       |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |FROM kept GROUP BY doc_id""".stripMargin) { (s, d) =>
    SuffixDedup.cutExactDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
      win = 8)
  }

  /** q146 — per-language EXACT length-quantile trim
    * ([[graft.operators.Quantiles.trimToRange]]): drop every doc whose
    * n_chars falls outside its language's [p05, p95] band — the
    * Gopher-style length cut, computed with EXACT distributed
    * quantiles instead of `percentile_approx` (whose GK-sketch rank
    * error is engine-specific and unhashable). The only corpus-wide
    * move is the map-side-combined (lang, n_chars) histogram — at
    * 100 TB the histogram is still only |langs|·|distinct lengths|
    * rows; the rank arithmetic (window cumsum, inf-CDF threshold
    * pick, all int64: `cc·den ≥ num·n`) runs over that compact table,
    * and the one-row-per-lang thresholds join back planner-broadcast.
    */
  val q146 = Q("q146_length_quantile_trim",
    """WITH hist AS (
      |  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, n_chars,
      |         SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cc,
      |         SUM(c) OVER (PARTITION BY lang) AS n
      |  FROM hist),
      |lo AS (SELECT lang, MIN(n_chars) AS lo FROM cum
      |       WHERE cc * 20 >= n * 1 GROUP BY lang),
      |hi AS (SELECT lang, MIN(n_chars) AS hi FROM cum
      |       WHERE cc * 20 >= n * 19 GROUP BY lang)
      |SELECT d.doc_id, d.lang, d.n_chars
      |FROM documents d JOIN lo USING (lang) JOIN hi USING (lang)
      |WHERE d.n_chars >= lo AND d.n_chars <= hi""".stripMargin) { (s, d) =>
    graft.operators.Quantiles.trimToRange(
      Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
      "lang", "n_chars", 1, 20, 19, 20)
  }

  /** q147 — hashed linear-classifier quality filter
    * ([[Text.hashedLinearScore]]): the fastText/DSIR model-based
    * quality cut as ONE map-only scan — score = Σ_tokens w[h(token)]
    * with the weight lookup pure int64 arithmetic on the token hash
    * (trained weights drop into the same plumbing; the placeholder
    * weight derivation is the stub seam, hash→weight-sum→threshold is
    * the real, oracle-gated machinery). Zero shuffle, zero corpus
    * pass, scan-speed at 100 TB next to q16/q90's heuristic signals.
    */
  val q147 = Q("q147_hashed_classifier",
    s"""WITH s AS (
       |  SELECT doc_id,
       |         ${Text.hashedLinearScoreSql("text")} AS cls_score
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id, cls_score,
       |       CAST(CASE WHEN cls_score > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM s""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"),
        Text.hashedLinearScore(col("text")).as("cls_score"))
      .withColumn("keep", when(col("cls_score") > 0, 1L).otherwise(0L))
  }

  /** q148 — PERSISTED incremental inverted text index
    * ([[graft.functions.TextIndex]]): build the postings artifact over
    * the base corpus (doc_id % 5 ≠ 0), index the held-out shard by
    * arrival WITHOUT rescanning the base (delete-then-insert by doc
    * id, one AtomicTable version per arrival), and emit the
    * impact-ordered view read back from the committed artifact. The
    * oracle builds the q111 index from scratch over the FULL corpus —
    * exactly what incremental maintenance must equal. q101 gives this
    * discipline to the LSH dedup index and q136 to the ANN side; this
    * completes it for lexical retrieval. Re-crawl replacement and
    * version isolation are pinned in TextIndexSpec. */
  val q148 = Q("q148_text_index_incremental",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
      |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |r AS (SELECT token, doc_id, tf,
      |             row_number() OVER (PARTITION BY token
      |                                ORDER BY tf DESC, doc_id) AS rn
      |      FROM tf)
      |SELECT token, COUNT(*) AS df,
      |       array_to_string(list(doc_id || ':' || tf ORDER BY tf DESC, doc_id)
      |                         FILTER (WHERE rn <= 16), ',') AS postings
      |FROM r GROUP BY token""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // one artifact dir per (JVM, sfDir): bench reps and repeated verify
    // runs re-commit fresh versions into the SAME bounded dir instead
    // of leaking a new /tmp index per invocation
    val tmp = q148Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
      graft.pipeline.TempDirs.scoped("graft_textindex_"))
    TextIndex.build(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", tmp)
    TextIndex.addShard(docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", tmp)
    TextIndex.indexView(s, tmp, topK = 16)
  }

  private val q148Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q153 — phrase search SERVED FROM the persisted positional tier
    * ([[TextIndex.phraseSearch]]): build the positional artifact over
    * the base corpus (doc_id % 5 ≠ 0), index the held-out shard by
    * arrival (delete-then-insert, no base rescan — the q148
    * discipline on the position-carrying tier), and answer q134's
    * exact phrase query from the committed artifact. The oracle is
    * q134's consecutive-token predicate VERBATIM over the full
    * corpus: index-served results must equal scanning the raw text.
    * With q111→q148 (impact tier), q102→q152 (BM25 serving), and now
    * q134→q153, every lexical-retrieval workload in the suite runs
    * off the maintained index. */
  val q153 = Q("q153_phrase_from_index",
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, CAST(i - 1 AS INT) AS start_pos
      |FROM t, unnest(range(1, len(w) - 1)) AS u(i)
      |WHERE w[i] = 'part' AND w[i+1] = 'filter' AND w[i+2] = 'scan'""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d)
      val tmp = q153Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
        graft.pipeline.TempDirs.scoped("graft_posindex_"))
      TextIndex.buildPositional(docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", tmp)
      TextIndex.addShardPositional(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", tmp)
      TextIndex.phraseSearch(s, tmp, Seq("part", "filter", "scan"))
  }

  private val q153Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q159 — QUERY-TABLE-driven phrase search over the persisted
    * positional tier ([[Retrieval.phraseQueryTable]]): a MIXED-LENGTH
    * batch (four 3-term phrases + one 2-term) arrives as a broadcast
    * relation and is answered in ONE pass over q153's committed
    * positional artifact — closing the r11 "one hardcoded phrase" gap
    * the way q157 closed it for BM25. Instead of one per-term join
    * chain per phrase, every matching posting votes for the start its
    * slot implies and a (phrase, doc, start) cell with one vote per
    * slot is a consecutive occurrence — one map-side-combined integer
    * aggregate for the whole batch, completeness checked against each
    * phrase's own length. The oracle carries the same phrase table as
    * a VALUES CTE over the raw text (index-served ≡ text-scanned, the
    * q153 contract), grouped by the same start-vote rule with the same
    * per-phrase HAVING bound. */
  val q159 = Q("q159_phrase_query_table",
    """WITH pt(phrase_id, slot, term) AS (
      |  VALUES (CAST(1 AS BIGINT), 1, 'slow'), (2, 1, 'part'),
      |         (3, 1, 'row'), (4, 1, 'data'), (5, 1, 'merge'),
      |         (1, 2, 'hash'), (2, 2, 'filter'),
      |         (3, 2, 'column'), (4, 2, 'merge'), (5, 2, 'order'),
      |         (1, 3, 'batch'), (2, 3, 'scan'),
      |         (3, 3, 'sort'), (4, 3, 'group')),
      |pl AS (SELECT phrase_id, MAX(slot) AS len FROM pt GROUP BY 1),
      |t AS (SELECT doc_id, string_split(trim(text), ' ') AS w
      |      FROM documents WHERE text IS NOT NULL),
      |pos AS (SELECT doc_id, i, w[i] AS tok
      |        FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
      |votes AS (
      |  SELECT p.phrase_id, x.doc_id, x.i - (p.slot - 1) AS s
      |  FROM pos x JOIN pt p ON x.tok = p.term)
      |SELECT v.phrase_id, v.doc_id, CAST(v.s - 1 AS INT) AS start_pos
      |FROM votes v JOIN pl ON v.phrase_id = pl.phrase_id
      |WHERE v.s >= 1
      |GROUP BY 1, 2, v.s, pl.len HAVING COUNT(*) = pl.len""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val tmp = q153Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
      graft.pipeline.TempDirs.scoped("graft_posindex_"))
    TextIndex.buildPositional(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", tmp)
    TextIndex.addShardPositional(docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", tmp)
    val phrases = Seq(
      (1L, 1, "slow"), (1L, 2, "hash"), (1L, 3, "batch"),
      (2L, 1, "part"), (2L, 2, "filter"), (2L, 3, "scan"),
      (3L, 1, "row"), (3L, 2, "column"), (3L, 3, "sort"),
      (4L, 1, "data"), (4L, 2, "merge"), (4L, 3, "group"),
      (5L, 1, "merge"), (5L, 2, "order"))
      .toDF("phrase_id", "slot", "term")
    Retrieval.phraseQueryTable(
      TextIndex.positionalPostings(s, tmp), "doc_id", phrases)
  }

  /** q164 — RIGHT-TO-BE-FORGOTTEN served from the maintained text
    * index ([[TextIndex.forget]]): build + shard-arrive the postings
    * artifact (the q148 lifecycle), then FORGET every doc_id % 7 == 0
    * — one committed delete-only version — and serve the impact view
    * from the surviving artifact. The oracle is q148's from-scratch
    * index SQL over `documents` WITH THE FORGOTTEN DOCS FILTERED OUT:
    * post-forget serving must be indistinguishable from never having
    * ingested them, which is the entire compliance contract (df
    * counts, impact ordering and top-16 cuts all re-rank without the
    * deleted postings). The vector-tier twin (raw-embedding rows +
    * PQ codes leave; id-sampled-centroid corner REFUSES) is pinned in
    * VectorIndexSpec. */
  val q164 = Q("q164_forget_from_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
      |  FROM documents WHERE doc_id % 7 <> 0),
      |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |r AS (SELECT token, doc_id, tf,
      |             row_number() OVER (PARTITION BY token
      |                                ORDER BY tf DESC, doc_id) AS rn
      |      FROM tf)
      |SELECT token, COUNT(*) AS df,
      |       array_to_string(list(doc_id || ':' || tf ORDER BY tf DESC, doc_id)
      |                         FILTER (WHERE rn <= 16), ',') AS postings
      |FROM r GROUP BY token""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tmp = q164Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
      graft.pipeline.TempDirs.scoped("graft_forget_"))
    TextIndex.build(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", tmp)
    TextIndex.addShard(docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", tmp)
    TextIndex.forget(s, docs.filter(col("doc_id") % 7 === 0).select("doc_id"), tmp)
    TextIndex.indexView(s, tmp, topK = 16)
  }

  private val q164Dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q163 — word-bigram STUPID BACKOFF scoring
    * ([[LanguageModel.stupidBackoffScores]], Brants et al. 2007): the
    * LM rule designed for distributed count tables — no normalization
    * pass, the model IS two count relations and scoring is equi-joins.
    * Trained on the base split (doc_id % 5 ≠ 0), scored over EVERY doc,
    * so backoff genuinely fires on held-out-only bigrams and OOV on
    * held-out-only words. Costs are the integer bitlength quantization
    * (the q151 discipline): seen = bl(c_ctx)−bl(c_bi), backoff =
    * bl(N)−bl(c_uni)+2, OOV = bl(N)+2 — exact on both engines, no
    * libm log. Complements the char-trigram LM (q113: no backoff
    * structure) in the CCNet-style quality battery. */
  val q163 = Q("q163_bigram_backoff_lm",
    """WITH tr AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |  WHERE text IS NOT NULL AND doc_id % 5 <> 0),
      |trp AS (
      |  SELECT w[i] AS w1, w[i+1] AS w2
      |  FROM tr, unnest(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
      |bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM trp GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(SUM(c_bi) AS BIGINT) AS c_ctx FROM bi GROUP BY 1),
      |trt AS (SELECT unnest(w) AS tok FROM tr),
      |uni AS (SELECT tok, COUNT(*) AS c_uni FROM trt
      |        WHERE length(tok) >= 1 GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM trt WHERE length(tok) >= 1),
      |sc AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |  WHERE text IS NOT NULL),
      |scp AS (
      |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM sc, unnest(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
      |db AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM scp GROUP BY 1, 2, 3),
      |costed AS (
      |  SELECT d.doc_id, d.tf,
      |         b.c_bi IS NULL AS backoff,
      |         (b.c_bi IS NULL AND u.c_uni IS NULL) AS oov,
      |         CASE WHEN b.c_bi IS NOT NULL
      |                THEN length(bin(c.c_ctx)) - length(bin(b.c_bi))
      |              WHEN u.c_uni IS NOT NULL
      |                THEN length(bin(nn.n)) - length(bin(u.c_uni)) + 2
      |              ELSE length(bin(nn.n)) + 2 END AS cost
      |  FROM db d
      |  LEFT JOIN bi b ON d.w1 = b.w1 AND d.w2 = b.w2
      |  LEFT JOIN ctx c ON d.w1 = c.w1
      |  LEFT JOIN uni u ON d.w2 = u.tok
      |  CROSS JOIN nn)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_pairs,
      |       CAST(SUM(CASE WHEN backoff THEN tf ELSE 0 END) AS BIGINT) AS n_backoff,
      |       CAST(SUM(CASE WHEN oov THEN tf ELSE 0 END) AS BIGINT) AS n_oov,
      |       CAST(SUM(tf * cost) AS BIGINT) AS total_cost
      |FROM costed GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    LanguageModel.stupidBackoffScores(
      docs.filter(col("doc_id") % 5 =!= 0), docs, "doc_id", "text")
  }

  /** q172 — n-gram NOVELTY score per doc (the memorization-risk
    * complement every dataset datasheet wants next to its dup rate): a
    * doc position is novel iff its word 8-gram appears in NO other
    * document; novelty = novel/total as ONE IEEE division of the two
    * int64 counts. Docs under 8 tokens have no 8-gram and drop out
    * (the q110 convention). Shape: gram explode folds straight into a
    * two-level distinct-doc count (map-side combined), one join back,
    * one per-doc aggregate — the q110/q142 gram-join discipline
    * without the pair blow-up (df is grouped per gram, never joined
    * doc×doc). */
  /** The q172 novelty CTE chain, shared verbatim with q174's oracle. */
  private val noveltyCteSql =
    """toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
      |              FROM documents),
      |p AS (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS pos
      |      FROM toks WHERE len(t) >= 8),
      |g AS (SELECT doc_id,
      |             t[pos]   || ' ' || t[pos+1] || ' ' || t[pos+2] || ' ' ||
      |             t[pos+3] || ' ' || t[pos+4] || ' ' || t[pos+5] || ' ' ||
      |             t[pos+6] || ' ' || t[pos+7] AS gram
      |      FROM p),
      |gdf AS (SELECT gram, COUNT(DISTINCT doc_id) AS ddf FROM g GROUP BY 1),
      |nov AS (
      |  SELECT g.doc_id, COUNT(*) AS n_grams,
      |         CAST(SUM(CASE WHEN gdf.ddf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |         CAST(SUM(CASE WHEN gdf.ddf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |           / CAST(COUNT(*) AS DOUBLE) AS novelty
      |  FROM g JOIN gdf ON g.gram = gdf.gram
      |  GROUP BY 1)""".stripMargin

  val q172 = Q("q172_ngram_novelty",
    s"""WITH $noveltyCteSql
       |SELECT doc_id, n_grams, n_novel, novelty FROM nov""".stripMargin) { (s, d) =>
    Text.ngramNovelty(Tables.documents(s, d), "doc_id", "text", n = 8)
  }

  /** q174 — the COMPOSED curation pipeline ([[Text.curationSignals]]):
    * the keep/drop table with REASONS an end-to-end cleaning run
    * emits — exact-dup cluster losers (min-id keep, the q94 policy),
    * under-20-token docs, and dup-heavy docs (8-gram novelty < 0.2 —
    * the near-dup smell exact hashing misses; q172's operator reused).
    * Every doc keeps its row so the drop AUDIT is queryable, the
    * composition is one plan (novelty's gram join + two vocab-scale
    * joins), and all signals are deterministic ⇒ the whole table
    * hash-gates. The oracle carries q172's novelty CTEs verbatim plus
    * a window-MIN dup rule (engine uses groupBy+min-join — same
    * values, map-side-combined shape). */
  val q174 = Q("q174_curation_pipeline",
    s"""WITH $noveltyCteSql,
       |sig AS (
       |  SELECT d.doc_id,
       |         d.doc_id <> MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS dup_loser,
       |         len(string_split(trim(d.text), ' ')) < 20 AS too_short,
       |         COALESCE(n.novelty < 0.2, FALSE) AS dup_heavy
       |  FROM documents d LEFT JOIN nov n ON n.doc_id = d.doc_id)
       |SELECT doc_id, dup_loser, too_short, dup_heavy,
       |       NOT (dup_loser OR too_short OR dup_heavy) AS kept
       |FROM sig""".stripMargin) { (s, d) =>
    Text.curationSignals(Tables.documents(s, d), "doc_id", "text",
      minTokens = 20, n = 8, noveltyFloor = 0.2)
  }

  /** q173 — exact-duplicate CLUSTER-SIZE histogram (the dup-rate row
    * of a dataset datasheet, q15's aggregate view): md5 clusters by
    * size, sizes by count. Two map-side-combined aggregates; null
    * text forms its own cluster on both engines (md5(NULL) = NULL
    * groups as one key — the q15 convention). */
  val q173 = Q("q173_dup_cluster_histogram",
    """WITH c AS (SELECT md5(text) AS h, COUNT(*) AS sz
      |           FROM documents GROUP BY 1)
      |SELECT sz AS cluster_size, COUNT(*) AS n_clusters
      |FROM c GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size")).agg(count(lit(1)).as("n_clusters"))
  }

  /** q179 — sliding-window token CO-OCCURRENCE counts (the GloVe /
    * word2vec-SGNS statistics table: Pennington et al. 2014 build
    * embeddings from exactly this relation): for every unordered token
    * pair within ±3 positions, the corpus-wide pair count plus both
    * unigram counts — PMI or GloVe weighting is then one driver-free
    * arithmetic pass (log of integer counts, deliberately left OUT of
    * the gated output per the no-transcendentals rule). Shape: the
    * pair expansion is MAP-ONLY — per row, one bound token array
    * (gramArray's lambda-bind discipline: the split runs once, not
    * once per offset) emits the ≤3·|t| in-window pairs as an array of
    * structs, exploded and normalized (least, greatest) — then ONE
    * map-side-combined groupBy. No self-join on position, no window:
    * at 100 TB co-occurrence is a scan + one shuffle of (pair, count)
    * cells, and the ≥5 support floor keeps the output vocab²-bounded
    * in practice. */
  val q179 = Q("q179_cooccurrence",
    """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |pr AS (
      |  SELECT unnest(flatten(list_transform(range(1, 4), o ->
      |           list_transform(range(1, greatest(len(t) - o + 1, 1)),
      |                          i -> {'a': t[i], 'b': t[i + o]})))) AS p
      |  FROM toks),
      |cnt AS (SELECT least(p.a, p.b) AS tok_a, greatest(p.a, p.b) AS tok_b,
      |               count(*) AS pair_ct
      |        FROM pr GROUP BY 1, 2 HAVING count(*) >= 5),
      |uni AS (SELECT unnest(t) AS tok FROM toks),
      |uc AS (SELECT tok, count(*) AS ct FROM uni GROUP BY 1)
      |SELECT c.tok_a, c.tok_b, c.pair_ct, ua.ct AS ct_a, ub.ct AS ct_b
      |FROM cnt c JOIN uc ua ON ua.tok = c.tok_a
      |JOIN uc ub ON ub.tok = c.tok_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pr = docs.select(explode(Text.cooccurrencePairs(col("text"), 3)).as("p"))
      .select(least(col("p.a"), col("p.b")).as("tok_a"),
        greatest(col("p.a"), col("p.b")).as("tok_b"))
    val cnt = pr.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("pair_ct"))
      .filter(col("pair_ct") >= 5)
    val uni = docs.select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("ct"))
    cnt
      .join(uni.select(col("tok").as("tok_a"), col("ct").as("ct_a")), Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("ct").as("ct_b")), Seq("tok_b"))
      .select("tok_a", "tok_b", "pair_ct", "ct_a", "ct_b")
  }

  /** q185 — PROXIMITY search served from the persisted positional tier
    * ([[graft.functions.Retrieval.proximitySearchFromPostings]]):
    * 'merge' within ±3 positions of 'window', answered off q153's
    * committed artifact (same per-(JVM, fixture) dir, same base+shard
    * build — computeIfAbsent makes whichever of q153/q185 runs first
    * pay the build). Fills the gap between exact phrase (q153: order +
    * adjacency) and boolean AND (q186: no positions): the NEAR
    * operator every production query language ships. Oracle replays
    * the distance predicate over raw-text positions — index-served
    * must equal scanning the corpus. */
  val q185 = Q("q185_proximity_from_index",
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |p AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token
      |      FROM t, unnest(range(1, len(w) + 1)) AS u(i)),
      |pr AS (SELECT a.doc_id, abs(a.pos - b.pos) AS dist
      |       FROM p a JOIN p b
      |         ON a.doc_id = b.doc_id AND b.token = 'window'
      |       WHERE a.token = 'merge'
      |         AND abs(a.pos - b.pos) <= 3 AND a.pos <> b.pos)
      |SELECT doc_id, COUNT(*) AS n_pairs, CAST(MIN(dist) AS INT) AS min_dist
      |FROM pr GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tmp = q153Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
      graft.pipeline.TempDirs.scoped("graft_posindex_"))
    TextIndex.buildPositional(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", tmp)
    TextIndex.addShardPositional(docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", tmp)
    Retrieval.proximitySearchFromPostings(
      TextIndex.positionalPostings(s, tmp), "doc_id",
      "merge", "window", maxDist = 3)
  }

  /** q186 — BOOLEAN retrieval (AND + NOT) served from the persisted
    * text index ([[graft.functions.Retrieval.booleanSearchFromPostings]]
    * over q148's committed artifact, same shared per-(JVM, fixture)
    * dir): docs containing BOTH 'spark' and 'merge' and NOT 'error',
    * scored by summed must-term tf. With q152 (ranked BM25), q153/q159
    * (phrase), q185 (proximity) and this, the artifact now serves the
    * full classical query algebra. Oracle: set-containment via
    * count-distinct over raw tokens, exclusion via NOT IN — raw-scan
    * semantics the index must reproduce exactly. */
  val q186 = Q("q186_boolean_from_index",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |m AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS match_tf
      |      FROM tf WHERE token IN ('spark', 'merge')
      |      GROUP BY 1 HAVING COUNT(DISTINCT token) = 2)
      |SELECT m.doc_id, m.match_tf FROM m
      |WHERE m.doc_id NOT IN (SELECT doc_id FROM tf WHERE token = 'error')""".stripMargin) {
    (s, d) =>
      val docs = Tables.documents(s, d)
      val tmp = q148Dirs.computeIfAbsent(Q.dataStamp(d), _ =>
        graft.pipeline.TempDirs.scoped("graft_textindex_"))
      TextIndex.build(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", tmp)
      TextIndex.addShard(docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", tmp)
      Retrieval.booleanSearchFromPostings(
        TextIndex.postings(s, tmp), Seq("spark", "merge"), Seq("error"))
  }

  val all: Seq[Q] = Seq(q110, q111, q112, q113, q113p, q114, q115, q116, q117,
    q118, q118p, q119, q119p, q121, q122, q122p, q124, q124p, q128, q129, q132,
    q134, q138, q139, q140, q146, q147, q148, q153, q159, q163, q164,
    q172, q173, q174, q179, q185, q186)
}
