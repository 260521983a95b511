package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import graft.Tables
import graft.functions.Text
import graft.operators.PrefixScan

/** Round-13 evaluation/statistics batch: the metrics a training-data
  * pipeline computes ABOUT its models and curation rules — exact
  * rank-statistic AUC, a classifier confusion matrix, per-group OLS
  * trend fitting, robust (median/MAD) outlier detection, Holt linear
  * trend smoothing, and behavioral subsequence support. Everything
  * hash-gates: ranks/counts are integers, OLS moments go through
  * DECIMAL(38,0) (HUGEINT in the oracle), the only floats are single
  * IEEE divisions of exact operands or the midpoint-interpolated exact
  * percentile both engines compute identically (the q38 discipline).
  */
object EvalQueries {

  /** q245 — exact AUC (Mann-Whitney U with average-rank tie handling)
    * of the length-quality score `n_chars` as a predictor of
    * `lang = 'en'` — the eval metric every curation classifier
    * (q128/q147) reports. Rank statistics over a corpus normally mean
    * one global sort; here ranks come from the (score → count,
    * positives) HISTOGRAM — |distinct n_chars|-sized, never
    * |documents|-sized — with the cumulative "rows strictly below this
    * score" via [[PrefixScan]]'s two-level scan (no single-task
    * window). For a tied group of n rows starting at global rank st,
    * each row's average rank is st + (n−1)/2, so twice the positive
    * rank-sum is Σ p·(2·cumBefore + n + 1) — integers throughout;
    * AUC = (2R⁺ − P(P+1)) / (2PN) with ONE final IEEE division.
    * Products are DECIMAL(38,0): rank·count terms reach N² and a
    * 100 TB corpus overflows int64. */
  val q245 = Q("q245_auc_quality",
    """WITH s AS (
      |  SELECT CAST(n_chars AS BIGINT) AS score,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |h AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
      |             CAST(SUM(y) AS BIGINT) AS p
      |      FROM s GROUP BY 1),
      |c AS (SELECT score, n, p,
      |             CAST(COALESCE(SUM(n) OVER (ORDER BY score
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
      |      FROM h),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(p) AS BIGINT) AS tp FROM h),
      |r AS (SELECT CAST(SUM(CAST(p AS HUGEINT) * (2 * cb + n + 1)) AS HUGEINT) AS r2 FROM c)
      |SELECT t.tp AS positives, t.tn - t.tp AS negatives,
      |       CAST(r.r2 - CAST(t.tp AS HUGEINT) * (t.tp + 1) AS BIGINT) AS auc_num2,
      |       2 * t.tp * (t.tn - t.tp) AS auc_den,
      |       CAST(r.r2 - CAST(t.tp AS HUGEINT) * (t.tp + 1) AS DOUBLE)
      |         / CAST(2 * t.tp * (t.tn - t.tp) AS DOUBLE) AS auc
      |FROM r, t""".stripMargin) { (s, d) =>
    val sc = Tables.documents(s, d).select(
      col("n_chars").cast(LongType).as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val h = sc.groupBy("score").agg(count(lit(1)).as("g_n"), sum("y").as("g_p"))
    val c = PrefixScan.exclusiveRunningSum(h, "score", "g_n", "g_cb", expr("score div 64"))
    val t = h.agg(sum("g_n").as("g_tn"), sum("g_p").as("g_tp"))
    c.agg(sum(col("g_p").cast(DecimalType(38, 0))
        * (lit(2) * col("g_cb") + col("g_n") + 1)).as("g_r2"))
      .crossJoin(broadcast(t))
      .selectExpr(
        "g_tp AS positives",
        "g_tn - g_tp AS negatives",
        "CAST(g_r2 - CAST(g_tp AS DECIMAL(38,0)) * (g_tp + 1) AS BIGINT) AS auc_num2",
        "2 * g_tp * (g_tn - g_tp) AS auc_den",
        "CAST(g_r2 - CAST(g_tp AS DECIMAL(38,0)) * (g_tp + 1) AS DOUBLE)" +
          " / CAST(2 * g_tp * (g_tn - g_tp) AS DOUBLE) AS auc")
  }

  /** q246 — the confusion matrix of the q17 stopword language-ID
    * against the declared `lang` label, with per-cell recall share
    * (cell count / declared-class total — ONE IEEE division of two
    * exact counts). One groupBy over the corpus plus a broadcast join
    * against the |langs|-sized class totals; the matrix itself is at
    * most |langs|·(|langs|+1) rows at any corpus size. */
  val q246 = {
    val en = Text.Stopwords("en"); val es = Text.Stopwords("es")
    val de = Text.Stopwords("de"); val fr = Text.Stopwords("fr")
    def hits(ws: Seq[String]) =
      s"len(list_filter(string_split(trim(text), ' '), x -> x IN (${ws.map("'" + _ + "'").mkString(",")})))"
    val (he, hs, hd, hf) = (hits(en), hits(es), hits(de), hits(fr))
    Q("q246_langid_confusion",
      s"""WITH pred AS (
         |  SELECT lang AS lang_declared,
         |    CASE WHEN $he = 0 AND $hs = 0 AND $hd = 0 AND $hf = 0 THEN 'und'
         |         WHEN $he >= $hs AND $he >= $hd AND $he >= $hf THEN 'en'
         |         WHEN $hs >= $hd AND $hs >= $hf THEN 'es'
         |         WHEN $hd >= $hf THEN 'de' ELSE 'fr' END AS lang_predicted
         |  FROM documents),
         |cells AS (
         |  SELECT lang_declared, lang_predicted, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM pred GROUP BY 1, 2),
         |tot AS (
         |  SELECT lang_declared, CAST(SUM(n) AS BIGINT) AS class_n
         |  FROM cells GROUP BY 1)
         |SELECT c.lang_declared, c.lang_predicted, c.n, t.class_n,
         |       CAST(c.n AS DOUBLE) / CAST(t.class_n AS DOUBLE) AS recall_share
         |FROM cells c JOIN tot t ON c.lang_declared = t.lang_declared""".stripMargin) { (s, d) =>
      val pred = Tables.documents(s, d).select(
        col("lang").as("lang_declared"),
        Text.langId(col("text")).as("lang_predicted"))
      val cells = pred.groupBy("lang_declared", "lang_predicted")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang_declared").agg(sum("n").as("class_n"))
      cells.join(broadcast(tot), Seq("lang_declared"))
        .select(col("lang_declared"), col("lang_predicted"), col("n"),
          col("class_n"),
          (col("n").cast("double") / col("class_n").cast("double")).as("recall_share"))
    }
  }

  /** q247 — per-nation ordinary-least-squares revenue trend: the slope
    * of monthly revenue against the month index, fit in closed form
    * from exact integer moments (n, Σx, Σy, Σxy, Σx²) — the
    * regression every KPI dashboard draws, computed as ONE map-side-
    * combined aggregate per nation (never a per-nation sort). Moment
    * products run in DECIMAL(38,0)/HUGEINT — n·Σxy at 100 TB revenue
    * magnitudes overflows int64 — and land as BIGINT numerator /
    * denominator (slope = num/den is the single IEEE division).
    * x = year·12 + month, exact in both engines. Nations whose orders
    * span a single month are excluded (identically in both engines):
    * their slope_den is 0 and 0/0 = NaN, whose serialization/hash
    * parity across the two result paths is exactly the bet this guard
    * refuses to make (r13 advice). */
  val q247 = Q("q247_ols_trend",
    """WITH m AS (
      |  SELECT n.n_name,
      |         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT) AS x,
      |         CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2),
      |mo AS (
      |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_months,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |  FROM m GROUP BY 1)
      |SELECT n_name, n_months, sx AS sum_x, sy AS sum_y_cents,
      |       CAST(n_months * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS slope_num,
      |       CAST(n_months * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT) AS slope_den,
      |       CAST(n_months * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |         / CAST(n_months * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope_cents_per_month
      |FROM mo WHERE n_months >= 2""".stripMargin) { (s, d) =>
    val m = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast(LongType).as("x"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)).as("y"))
    m.groupBy("n_name")
      .agg(count(lit(1)).as("n_months"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))
      .filter(col("n_months") >= 2)
      .selectExpr("n_name", "n_months", "sx AS sum_x", "sy AS sum_y_cents",
        "CAST(n_months * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS slope_num",
        "CAST(n_months * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS slope_den",
        "CAST(n_months * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
          " / CAST(n_months * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)" +
          " AS slope_cents_per_month")
  }

  /** q248 — robust per-event-type outlier detection by median/MAD (the
    * 3-MAD rule, Hampel 1974): the location/scale estimates a drift
    * monitor trusts when the mean is already poisoned by the outliers
    * it hunts. Both quantiles are Spark's EXACT `percentile` against
    * DuckDB's `quantile_cont` (the q38-proven midpoint interpolation —
    * operands are integer cents, so the .5-grid doubles are exact in
    * both engines). The aggregate buffers a value→count map per group:
    * memory is the |distinct cents| DOMAIN per event type (price-grid
    * bounded), never the row count — the property that keeps an exact
    * corpus-scale median feasible. Three map-side-combined passes
    * (median → MAD → outlier count), each joined back via a
    * |event_type|-row broadcast. */
  val q248 = Q("q248_mad_outliers",
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(CAST("value" AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |m AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM e GROUP BY 1),
      |dv AS (
      |  SELECT e.event_type, abs(CAST(e.v AS DOUBLE) - m.med) AS dev, m.med
      |  FROM e JOIN m ON e.event_type = m.event_type),
      |s AS (
      |  SELECT event_type, quantile_cont(dev, 0.5) AS mad,
      |         CAST(COUNT(*) AS BIGINT) AS n, MIN(med) AS med
      |  FROM dv GROUP BY 1)
      |SELECT s.event_type, s.n, s.med AS median_c, s.mad AS mad_c,
      |       CAST(SUM(CASE WHEN dv.dev > 3 * s.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dv JOIN s ON dv.event_type = s.event_type
      |GROUP BY 1, 2, 3, 4""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_type"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("v"))
    val m = e.groupBy("event_type").agg(percentile(col("v"), lit(0.5)).as("med"))
    val dv = e.join(broadcast(m), Seq("event_type"))
      .select(col("event_type"),
        abs(col("v").cast("double") - col("med")).as("dev"), col("med"))
    val st = dv.groupBy("event_type").agg(
      percentile(col("dev"), lit(0.5)).as("mad"),
      count(lit(1)).as("n"), min("med").as("med"))
    dv.select("event_type", "dev").join(broadcast(st), Seq("event_type"))
      .groupBy(col("event_type"), col("n"), col("med").as("median_c"),
        col("mad").as("mad_c"))
      .agg(sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .select("event_type", "n", "median_c", "mad_c", "n_outliers")
  }

  /** q249 — Holt linear-trend smoothing of daily revenue in exact
    * fixed-point integers (Holt 1957): level
    * lₜ = (xₜ + 4·(lₜ₋₁+bₜ₋₁)) div 5 (α = 1/5) and trend
    * bₜ = ((lₜ−lₜ₋₁) + 2·bₜ₋₁) div 3 (β = 1/3), l₁ = x₁, b₁ = 0;
    * the residual is the ONE-STEP-AHEAD forecast error
    * xₜ − (lₜ₋₁+bₜ₋₁) — the trend-aware upgrade of q212's simple ES
    * (which a drifting level fools). Same execution contract as
    * q197/q212: the recurrence is non-associative, so it driver-folds
    * over the AGGREGATED calendar-day domain (bounded at any corpus
    * scale — the collect is |distinct days|, never |orders|) after one
    * map-side-combined groupBy; the oracle replays it as a recursive
    * CTE. Integer division is TRUNCATION toward zero on both sides
    * (DuckDB `//` truncates — measured, -7 // 5 = -1 — and so does
    * Scala Long `/`); the trend term goes negative routinely, so the
    * sign convention is load-bearing here, unlike q212. */
  val q249 = Q("q249_holt_trend",
    """WITH RECURSIVE d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |i AS (SELECT day, cents, row_number() OVER (ORDER BY day) AS rn FROM d),
      |c AS (
      |  SELECT rn, day, cents, cents AS l, CAST(0 AS BIGINT) AS b,
      |         CAST(0 AS BIGINT) AS resid
      |  FROM i WHERE rn = 1
      |  UNION ALL
      |  SELECT i.rn, i.day, i.cents,
      |         (i.cents + 4 * (c.l + c.b)) // 5,
      |         (((i.cents + 4 * (c.l + c.b)) // 5) - c.l + 2 * c.b) // 3,
      |         i.cents - (c.l + c.b)
      |  FROM c JOIN i ON i.rn = c.rn + 1)
      |SELECT day, cents, l AS level, b AS trend, resid AS residual
      |FROM c""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)).as("cents"))
      .orderBy("day")
    // collect() allowlist: |distinct o_orderdate| — calendar-bounded at
    // any corpus scale — and the coupled (l, b) recurrence is
    // non-associative under integer floor division (the q212 argument).
    val rows = daily.collect().map(r => (r.getDate(0), r.getLong(1)))
    var l = 0L; var b = 0L
    val out = rows.zipWithIndex.map { case ((day, cents), i) =>
      if (i == 0) { l = cents; b = 0L; (day, cents, l, b, 0L) }
      else {
        val resid = cents - (l + b)
        val lNew = (cents + 4 * (l + b)) / 5L
        val bNew = (lNew - l + 2 * b) / 3L
        l = lNew; b = bNew
        (day, cents, l, b, resid)
      }
    }
    import s.implicits._
    out.toSeq.toDF("day", "cents", "level", "trend", "residual")
  }

  /** q250 — behavioral SUBSEQUENCE support (the PrefixSpan-style
    * "a then b, anywhere later" pattern, vs q182's adjacent-transition
    * matrix and q201's contiguous paths): how many users ever do
    * event type A strictly before event type B. The existence test
    * "∃ tₐ < t_b" collapses to min(tsₐ) < max(ts_b) per user, so the
    * whole mining pass is ONE groupBy to the |users|·|types| summary
    * and an equi-join on user over that summary — no per-user sequence
    * reconstruction, no quadratic event pairing, and the same-type
    * cell (a repeat visit) falls out of the strict < on (min, max). */
  val q250 = Q("q250_subsequence_support",
    """WITH ev AS (SELECT epoch_ns(ts) AS ts, user_id, event_type FROM events),
      |b AS (
      |  SELECT user_id, event_type, MIN(ts) AS mn, MAX(ts) AS mx
      |  FROM ev GROUP BY 1, 2)
      |SELECT a.event_type AS first_type, z.event_type AS then_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM b a JOIN b z ON a.user_id = z.user_id
      |WHERE a.mn < z.mx
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val b = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min("ts").as("mn"), max("ts").as("mx"))
    val a = b.select(col("user_id"), col("event_type").as("first_type"), col("mn"))
    val z = b.select(col("user_id"), col("event_type").as("then_type"), col("mx"))
    a.join(z, Seq("user_id"))
      .filter(col("mn") < col("mx"))
      .groupBy("first_type", "then_type")
      .agg(count(lit(1)).as("n_users"))
  }

  /** The q251 dictionary. Every pattern is verified BORDER-FREE at
    * class-init (no proper prefix that is also a suffix), which makes
    * all-occurrence counts equal non-overlapping counts — the property
    * that lets a SQL replace-length oracle check the automaton. */
  private val AcPatterns =
    Seq("spark", "customer", "fast scan", "data window", "group value", "big vector")
  require(AcPatterns.forall(graft.plans.AhoCorasickCounts.isBorderFree),
    "q251 oracle precondition: patterns must be border-free")

  /** q251 — dictionary scan over the corpus with the native
    * Aho–Corasick kernel ([[graft.plans.AhoCorasickCounts]]): counts of
    * every dictionary term (PII markers, blocklist phrases, topic
    * keywords — the curation primitives) per document in ONE pass over
    * the text whatever the dictionary size, inside whole-stage codegen.
    * The oracle runs |patterns| separate replace-length scans — the
    * very plan shape the automaton exists to avoid (at a 500-term
    * dictionary the SQL form is 500 scans of 100 TB; the kernel is
    * one). Patterns are border-free (checked structurally above), so
    * overlapping-vs-non-overlapping counting cannot diverge; the
    * automaton's general overlap handling is spec-gated separately. */
  val q251 = {
    val pats = AcPatterns
    val values = pats.map(p => s"('$p')").mkString(", ")
    Q("q251_multi_pattern_scan",
      s"""WITH pats AS (SELECT * FROM (VALUES $values) AS t(pattern))
         |SELECT d.doc_id, p.pattern,
         |       CAST((length(d.text) - length(replace(d.text, p.pattern, '')))
         |              // length(p.pattern) AS BIGINT) AS n_matches
         |FROM documents d CROSS JOIN pats p
         |WHERE length(d.text) <> length(replace(d.text, p.pattern, ''))""".stripMargin) { (s, d) =>
      val counts = graft.plans.NativeExpressions.acCounts(col("text"), pats)
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(counts).as(Seq("pos", "n_matches")))
        .filter(col("n_matches") > 0)
        .select(col("doc_id"),
          element_at(typedLit(pats), col("pos") + 1).as("pattern"),
          col("n_matches"))
    }
  }

  /** q252 — Newman modularity of the `source` metadata partition over
    * the rare-gram near-dup graph (Newman & Girvan 2004): does shared
    * boilerplate stay WITHIN a crawl source or bridge across sources —
    * the assortativity number that decides whether per-source dedup is
    * safe or cross-source decontamination (q135) is mandatory. Exact
    * integer arithmetic throughout: Q = (4m·e_in − Σ_c D_c²) / 4m²
    * after multiplying out, with e_in the within-source edge count and
    * D_c the per-source degree sums — products in DECIMAL(38,0)/
    * HUGEINT, ONE final IEEE division. Graph shape: the q68 edge
    * builder (df-capped grams, never O(n²)); everything after it is
    * one broadcast-joinable label lookup and two tiny aggregates.
    * Hash-collision tolerance (the standard rare-gram caveat, see
    * [[graft.functions.Dedup.rareGramEdges]]): the engine keys grams
    * by xxhash64 while the oracle compares raw trigram strings, so a
    * 64-bit collision merging two gram classes could add an engine-
    * side edge the oracle lacks (~k²/2⁶⁵ for k distinct grams —
    * negligible at any tested scale, and absorbed the same way by
    * every rare-gram consumer: q68, q83, q110). */
  val q252 = Q("q252_source_modularity",
    """WITH toks AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
      |                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      |  FROM toks),
      |rare AS (
      |  SELECT g.doc_id, g.gram FROM grams g
      |  JOIN (SELECT gram, COUNT(*) AS gram_df FROM grams GROUP BY 1) f
      |    ON g.gram = f.gram
      |  WHERE f.gram_df BETWEEN 2 AND 50),
      |e0 AS (
      |  SELECT ga.doc_id AS a, gb.doc_id AS b
      |  FROM rare ga JOIN rare gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |lab AS (SELECT doc_id, source FROM documents),
      |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
      |ie AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS inside
      |  FROM e0 e JOIN lab la ON la.doc_id = e.a JOIN lab lb ON lb.doc_id = e.b
      |  WHERE la.source = lb.source),
      |deg AS (
      |  SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
      |  FROM (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0) u GROUP BY 1),
      |dc AS (
      |  SELECT l.source, CAST(SUM(COALESCE(d.dg, 0)) AS BIGINT) AS dsum
      |  FROM lab l LEFT JOIN deg d ON d.v = l.doc_id GROUP BY 1),
      |s2 AS (SELECT CAST(SUM(CAST(dsum AS HUGEINT) * dsum) AS HUGEINT) AS sum_dc2 FROM dc)
      |SELECT mm.m AS m_edges, ie.inside AS inside_edges,
      |       CAST(s2.sum_dc2 AS BIGINT) AS sum_dc2,
      |       CAST(4 * CAST(mm.m AS HUGEINT) * ie.inside - s2.sum_dc2 AS BIGINT) AS q_num,
      |       4 * mm.m * mm.m AS q_den,
      |       CAST(4 * CAST(mm.m AS HUGEINT) * ie.inside - s2.sum_dc2 AS DOUBLE)
      |         / CAST(4 * mm.m * mm.m AS DOUBLE) AS modularity
      |FROM mm, ie, s2""".stripMargin) { (s, d) =>
    import graft.functions.Dedup
    val docs = Tables.documents(s, d)
    val edges = Dedup.rareGramEdges(docs, "doc_id", "text", n = 3,
      maxDf = 50L, minShared = 2L)
    val lab = docs.select(col("doc_id"), col("source"))
    // no broadcast hint: the label projection is |documents|-sized (a
    // corpus-scaling relation — PlanAudit rightly rejects hinting it);
    // AQE broadcasts it when it happens to fit, shuffles when not
    val withSrc = edges
      .join(lab.select(col("doc_id").as("a"), col("source").as("src_a")), Seq("a"))
      .join(lab.select(col("doc_id").as("b"), col("source").as("src_b")), Seq("b"))
    val tot = withSrc.agg(
      count(lit(1)).as("m"),
      sum(when(col("src_a") === col("src_b"), 1L).otherwise(0L)).as("inside"))
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val dc = lab.join(deg, lab("doc_id") === deg("v"), "left")
      .groupBy("source").agg(sum(coalesce(col("dg"), lit(0L))).as("dsum"))
    val s2 = dc.agg(sum(col("dsum").cast(DecimalType(38, 0)) * col("dsum")).as("sum_dc2"))
    tot.crossJoin(s2)
      .selectExpr("m AS m_edges", "inside AS inside_edges",
        "CAST(sum_dc2 AS BIGINT) AS sum_dc2",
        "CAST(4 * CAST(m AS DECIMAL(38,0)) * inside - sum_dc2 AS BIGINT) AS q_num",
        "4 * m * m AS q_den",
        "CAST(4 * CAST(m AS DECIMAL(38,0)) * inside - sum_dc2 AS DOUBLE)" +
          " / CAST(4 * m * m AS DOUBLE) AS modularity")
  }

  /** One best-Gini-stump pass over (x: Long, y: 0/1) — q213's exact
    * machinery (histogram → two [[PrefixScan]] cumulative passes →
    * exact-rational impurity → deterministic argmin) factored so the
    * depth-2 tree can apply it per branch. */
  private def bestStump(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hist = e.groupBy("x").agg(count(lit(1)).as("g_n"), sum("y").as("g_p"))
    val cum = PrefixScan.exclusiveRunningSum(
      PrefixScan.exclusiveRunningSum(
        hist, "x", "g_n", "g_cn", expr("x div 100")),
      "x", "g_p", "g_cp", expr("x div 100"))
    val tot = hist.agg(sum("g_n").as("g_tn"), sum("g_p").as("g_tp"))
    cum.crossJoin(broadcast(tot))
      .selectExpr("x AS threshold",
        "g_cn + g_n AS n_left", "g_cp + g_p AS p_left",
        "g_tn - (g_cn + g_n) AS n_right", "g_tp - (g_cp + g_p) AS p_right")
      .filter(col("n_right") > 0)
      .selectExpr("threshold", "n_left", "p_left", "n_right", "p_right",
        "CAST(CAST(p_left AS DECIMAL(38,0)) * (n_left - p_left) * n_right" +
          " + CAST(p_right AS DECIMAL(38,0)) * (n_right - p_right) * n_left AS DOUBLE)" +
          " / CAST(CAST(n_left AS DECIMAL(38,0)) * n_right AS DOUBLE) AS split_score")
      .orderBy(col("split_score"), col("threshold")).limit(1)
  }

  /** The q213 stump chain as oracle SQL, parameterized by source CTE —
    * emitted once per tree node. */
  private def stumpSql(src: String, p: String): String =
    s"""${p}_h AS (SELECT x, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS p FROM $src GROUP BY 1),
       |${p}_c AS (SELECT x, n, p,
       |        CAST(SUM(n) OVER w AS BIGINT) AS nl, CAST(SUM(p) OVER w AS BIGINT) AS pl
       |      FROM ${p}_h WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |${p}_t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(p) AS BIGINT) AS tp FROM ${p}_h),
       |${p}_cand AS (
       |  SELECT c.x AS threshold, c.nl AS n_left, c.pl AS p_left,
       |         t.tn - c.nl AS n_right, t.tp - c.pl AS p_right
       |  FROM ${p}_c c, ${p}_t t WHERE t.tn - c.nl > 0),
       |${p}_best AS (
       |  SELECT threshold, n_left, p_left, n_right, p_right,
       |    CAST(CAST(p_left AS HUGEINT) * (n_left - p_left) * n_right
       |         + CAST(p_right AS HUGEINT) * (n_right - p_right) * n_left AS DOUBLE)
       |      / CAST(CAST(n_left AS HUGEINT) * n_right AS DOUBLE) AS split_score
       |  FROM ${p}_cand ORDER BY split_score, threshold LIMIT 1)""".stripMargin

  /** q253 — depth-2 CART tree on the purchase label: the root stump
    * (q213) plus the best stump WITHIN each branch — recursive
    * partitioning as three applications of one exact primitive, each a
    * pair of shuffles over the value HISTOGRAM (the branch filter
    * reaches the scan; the root threshold arrives as a 1-row
    * broadcast, so no collect and no driver value). Every impurity is
    * the exact rational q213 computes; node selection is the same
    * deterministic (score, threshold) argmin, so the whole tree is
    * hash-replayable — the oracle grows the identical tree with three
    * copies of the stump chain. A branch too pure to split (no
    * candidate with a non-empty right side) simply emits no row. */
  val q253 = Q("q253_tree_depth2",
    s"""WITH e AS (SELECT CAST(floor("value") AS BIGINT) AS x,
       |                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |           FROM events),
       |${stumpSql("e", "root")},
       |le AS (SELECT e.x, e.y FROM e, root_best WHERE e.x <= root_best.threshold),
       |${stumpSql("le", "l")},
       |re AS (SELECT e.x, e.y FROM e, root_best WHERE e.x > root_best.threshold),
       |${stumpSql("re", "r")}
       |SELECT 'root' AS node, threshold, n_left, p_left, n_right, p_right, split_score FROM root_best
       |UNION ALL
       |SELECT 'left', threshold, n_left, p_left, n_right, p_right, split_score FROM l_best
       |UNION ALL
       |SELECT 'right', threshold, n_left, p_left, n_right, p_right, split_score FROM r_best""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(
      floor(col("value")).cast(LongType).as("x"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    // materialize the ONE-ROW root stump (spill-and-read, the
    // TempDirs.spillParquet plan-truncation discipline): left and
    // right each embed the threshold source, so a lazy root
    // replicated its whole two-prefix-scan subtree THREE times into
    // one ~440-Exchange plan — planning and codegen of that tree cost
    // more than the query (guide §3.3: very wide plans, materialize
    // intermediates)
    val root = graft.pipeline.TempDirs.spillParquet(bestStump(e), "graft_q253_root_")
    val thr = broadcast(root.select(col("threshold").as("g_thr")))
    val left = bestStump(e.crossJoin(thr).filter(col("x") <= col("g_thr")).select("x", "y"))
    val right = bestStump(e.crossJoin(thr).filter(col("x") > col("g_thr")).select("x", "y"))
    def tag(df: org.apache.spark.sql.DataFrame, n: String) =
      df.select(lit(n).as("node"), col("threshold"), col("n_left"), col("p_left"),
        col("n_right"), col("p_right"), col("split_score"))
    tag(root, "root").unionAll(tag(left, "left")).unionAll(tag(right, "right"))
  }

  /** q254 — exact EQUI-DEPTH histogram of order totals (16 buckets):
    * the optimizer statistic q224's NDV tier lacks — selectivity
    * estimation needs value DISTRIBUTION, not just cardinality. The 15
    * interior boundaries are ONE exact-`percentile` aggregate (the q38
    * discipline — sixteenth fractions are exact binary doubles, and
    * the aggregation buffer is the |distinct cents| DOMAIN, not the
    * row count); each row's bucket is then "how many boundaries are
    * strictly below v" via a 15-element HOF over the broadcast
    * boundary array — one extra scan, no second shuffle, ties landing
    * deterministically in the lower bucket on both engines. */
  val q254 = {
    val fracs = (1 to 15).map(i => i / 16.0)
    Q("q254_equi_depth_histogram",
      s"""WITH e AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM orders),
         |q AS (SELECT quantile_cont(v, [${fracs.mkString(", ")}]) AS qs FROM e)
         |SELECT CAST(len(list_filter(q.qs, b -> CAST(e.v AS DOUBLE) > b)) AS BIGINT) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(MIN(e.v) AS BIGINT) AS lo_c, CAST(MAX(e.v) AS BIGINT) AS hi_c
         |FROM e, q
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val e = Tables.orders(s, d).select(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType).as("v"))
      val qs = e.agg(percentile(col("v"), typedLit(fracs)).as("qs"))
      e.crossJoin(broadcast(qs))
        .select(col("v"),
          size(filter(col("qs"), b => col("v").cast("double") > b))
            .cast(LongType).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"), min("v").as("lo_c"), max("v").as("hi_c"))
    }
  }

  /** q255 — the calibration curve (reliability diagram) for the q245
    * score: per score-DECILE, predicted-rank position vs observed
    * positive rate — AUC says the ranking is good, calibration says
    * whether the score's LEVELS mean anything. Same two-piece shape as
    * q254: 9 interior decile boundaries from one exact-percentile
    * aggregate, per-row bucket by counting boundaries strictly below
    * the score (broadcast array HOF — no second shuffle), then one
    * grouped count with ONE IEEE division per bucket. Tenth fractions
    * are inexact doubles but both engines parse the identical literal
    * and evaluate the identical (n−1)·q interpolation — the q38
    * precedent (0.9) already pins this. */
  val q255 = {
    val fracs = (1 to 9).map(i => i / 10.0)
    Q("q255_calibration_curve",
      s"""WITH s AS (
         |  SELECT CAST(n_chars AS BIGINT) AS score,
         |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |q AS (SELECT quantile_cont(score, [${fracs.mkString(", ")}]) AS qs FROM s)
         |SELECT CAST(len(list_filter(q.qs, b -> CAST(s.score AS DOUBLE) > b)) AS BIGINT) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(s.y) AS BIGINT) AS positives,
         |       CAST(MIN(s.score) AS BIGINT) AS lo_score,
         |       CAST(MAX(s.score) AS BIGINT) AS hi_score,
         |       CAST(SUM(s.y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS observed_rate
         |FROM s, q
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val sc = Tables.documents(s, d).select(
        col("n_chars").cast(LongType).as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      val qs = sc.agg(percentile(col("score"), typedLit(fracs)).as("qs"))
      sc.crossJoin(broadcast(qs))
        .select(col("score"), col("y"),
          size(filter(col("qs"), b => col("score").cast("double") > b))
            .cast(LongType).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("y").as("positives"),
          min("score").as("lo_score"), max("score").as("hi_score"),
          (sum("y").cast("double") / count(lit(1)).cast("double")).as("observed_rate"))
    }
  }

  /** q256 — NDCG@10 of the view-count item ranking against purchase
    * relevance, with the house's EXACT bit-length discount in place of
    * the transcendental log₂ (the q113/q214 surrogate): weight(pos) =
    * 12 / bl(pos+1), bl(x) = ⌊log₂x⌋+1, so every per-position weight
    * is an INTEGER (12 is lcm of the bl values over pos 1..10 —
    * {2,3,4}) and DCG·12 / IDCG·12 are exact integer sums; NDCG is the
    * single IEEE division. Ranking: per user, items by view count
    * descending with item tiebreak (one groupBy + one user-partitioned
    * window over the |user × item| summary); relevance: the user ever
    * purchased the item (a semi-joinable set, here a LEFT join flag);
    * ideal DCG takes the top-R weights for R = min(relevant-in-corpus,
    * 10). Users with no purchased item have no defined NDCG and emit
    * no row. */
  val q256 = Q("q256_ndcg_bl",
    """WITH e AS (
      |  SELECT user_id, CAST(floor("value") AS INT) % 97 AS item_id, event_type
      |  FROM events),
      |views AS (
      |  SELECT user_id, item_id, COUNT(*) AS n_views
      |  FROM e WHERE event_type = 'view' GROUP BY 1, 2),
      |bought AS (
      |  SELECT DISTINCT user_id, item_id FROM e WHERE event_type = 'purchase'),
      |ranked AS (
      |  SELECT v.user_id, v.item_id,
      |         row_number() OVER (PARTITION BY v.user_id
      |                            ORDER BY v.n_views DESC, v.item_id) AS pos,
      |         CASE WHEN b.item_id IS NULL THEN 0 ELSE 1 END AS rel
      |  FROM views v LEFT JOIN bought b
      |    ON b.user_id = v.user_id AND b.item_id = v.item_id),
      |w AS (
      |  SELECT user_id, pos, rel,
      |         CASE WHEN pos + 1 < 4 THEN 6
      |              WHEN pos + 1 < 8 THEN 4 ELSE 3 END AS w12
      |  FROM ranked WHERE pos <= 10),
      |r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      |      FROM bought GROUP BY 1),
      |dcg AS (
      |  SELECT user_id, CAST(SUM(rel * w12) AS BIGINT) AS dcg12
      |  FROM w GROUP BY 1),
      |idcg AS (
      |  SELECT r.user_id,
      |         CAST(SUM(CASE WHEN w.pos <= r.n_rel THEN w.w12 ELSE 0 END) AS BIGINT) AS idcg12
      |  FROM r JOIN (SELECT * FROM (VALUES (1, 6), (2, 6), (3, 4), (4, 4), (5, 4),
      |                                     (6, 4), (7, 3), (8, 3), (9, 3), (10, 3))
      |               AS t(pos, w12)) w ON TRUE
      |  GROUP BY 1)
      |SELECT d.user_id, d.dcg12, i.idcg12,
      |       CAST(d.dcg12 AS DOUBLE) / CAST(i.idcg12 AS DOUBLE) AS ndcg
      |FROM dcg d JOIN idcg i ON d.user_id = i.user_id
      |WHERE i.idcg12 > 0""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("user_id"),
      (floor(col("value")).cast(IntegerType) % 97).as("item_id"), col("event_type"))
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id", "item_id").agg(count(lit(1)).as("n_views"))
    val bought = e.filter(col("event_type") === "purchase")
      .select("user_id", "item_id").distinct()
    val boughtR = bought.select(col("user_id").as("b_user"), col("item_id").as("b_item"))
    val ranked = views.join(boughtR,
        col("user_id") === col("b_user") && col("item_id") === col("b_item"), "left")
      .select(col("user_id"), col("item_id"), col("n_views"),
        when(col("b_item").isNull, 0L).otherwise(1L).as("rel"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_views").desc, col("item_id"))))
      .filter(col("pos") <= 10)
      .withColumn("w12",
        when(col("pos") + 1 < 4, 6L).when(col("pos") + 1 < 8, 4L).otherwise(3L))
    val dcg = ranked.groupBy("user_id").agg(sum(col("rel") * col("w12")).as("dcg12"))
    val nRel = bought.groupBy("user_id").agg(count(lit(1)).as("n_rel"))
    val weights = Seq(1 -> 6L, 2 -> 6L, 3 -> 4L, 4 -> 4L, 5 -> 4L,
      6 -> 4L, 7 -> 3L, 8 -> 3L, 9 -> 3L, 10 -> 3L)
    import s.implicits._
    val wTab = weights.toDF("pos", "w12")
    val idcg = nRel.crossJoin(broadcast(wTab))
      .groupBy("user_id")
      .agg(sum(when(col("pos") <= col("n_rel"), col("w12")).otherwise(0L)).as("idcg12"))
    dcg.join(idcg, Seq("user_id"))
      .filter(col("idcg12") > 0)
      .select(col("user_id"), col("dcg12"), col("idcg12"),
        (col("dcg12").cast("double") / col("idcg12").cast("double")).as("ndcg"))
  }

  /** q257 — Maximal Marginal Relevance diversified re-ranking
    * (Carbonell & Goldstein, SIGIR'98) made EXACT: embeddings quantize
    * to a fixed 1/1024 integer grid, so relevance (dot with the query
    * vector) and pairwise shortlist similarity are integer sums, and
    * the greedy trade-off score with λ = 1/2 doubles into the exact
    * integer rel − max_sim. Execution shape at 100 TB: the corpus-wide
    * work is the relevance scan + a distributed TakeOrdered to a
    * k-bounded shortlist and ONE |shortlist|²-row similarity join; the
    * inherently-sequential greedy selection then folds on the driver
    * over that bounded set (collect() allowlist: ≤ 12 + 132 rows by
    * construction — the bounded-candidate-set discipline, same as the
    * k-means|| rounds·l sets). The oracle replays the identical greedy
    * with 5 unrolled argmax CTEs. */
  val q257 = {
    val k = 5; val shortN = 12
    def roundSql(i: Int): String = {
      val sels = (1 until i).map(j => s"SELECT vec_id FROM sel$j").mkString(" UNION ALL ")
      s"""cand$i AS (
         |  SELECT c.vec_id, c.rel, MAX(s.sim) AS maxsim
         |  FROM short c
         |  JOIN sims s ON s.a = c.vec_id
         |  WHERE s.b IN ($sels) AND c.vec_id NOT IN ($sels)
         |  GROUP BY 1, 2),
         |sel$i AS (
         |  SELECT CAST($i AS BIGINT) AS round, vec_id, rel, maxsim,
         |         rel - maxsim AS mmr2
         |  FROM cand$i ORDER BY mmr2 DESC, vec_id LIMIT 1)""".stripMargin
    }
    val unionAll = (1 to k).map(i =>
      s"SELECT round, vec_id, rel, maxsim, mmr2 FROM sel$i").mkString("\nUNION ALL\n")
    Q("q257_mmr_rerank",
      s"""WITH ql AS (
         |  SELECT CAST(gi - 1 AS INT) AS dim,
         |         CAST(floor(CAST(embedding[gi] AS DOUBLE) * 1024) AS BIGINT) AS qv
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS gi) WHERE vec_id = 0),
         |el AS (
         |  SELECT vec_id, CAST(gi - 1 AS INT) AS dim,
         |         CAST(floor(CAST(embedding[gi] AS DOUBLE) * 1024) AS BIGINT) AS qv
         |  FROM embeddings, (SELECT unnest(range(1, 65)) AS gi) WHERE vec_id <> 0),
         |rel AS (
         |  SELECT e.vec_id, CAST(SUM(e.qv * q.qv) AS BIGINT) AS rel
         |  FROM el e JOIN ql q ON e.dim = q.dim GROUP BY 1),
         |short AS (
         |  SELECT vec_id, rel FROM (
         |    SELECT vec_id, rel, row_number() OVER (ORDER BY rel DESC, vec_id) AS rn
         |    FROM rel) t WHERE rn <= $shortN),
         |sl AS (SELECT e.vec_id, e.dim, e.qv FROM el e JOIN short s ON s.vec_id = e.vec_id),
         |sims AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b, CAST(SUM(a.qv * b.qv) AS BIGINT) AS sim
         |  FROM sl a JOIN sl b ON a.dim = b.dim AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2),
         |sel1 AS (
         |  SELECT CAST(1 AS BIGINT) AS round, vec_id, rel,
         |         CAST(0 AS BIGINT) AS maxsim, rel AS mmr2
         |  FROM short ORDER BY rel DESC, vec_id LIMIT 1),
         |${(2 to k).map(roundSql).mkString(",\n")}
         |$unionAll""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val qLong = emb.select(col("vec_id"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1024).cast(LongType))).as(Seq("dim", "qv")))
      val ql = qLong.filter(col("vec_id") === 0).select(col("dim"), col("qv").as("qqv"))
      val el = qLong.filter(col("vec_id") =!= 0)
      val rel = el.join(broadcast(ql), Seq("dim"))
        .groupBy("vec_id").agg(sum(col("qv") * col("qqv")).as("rel"))
      val short = rel.orderBy(col("rel").desc, col("vec_id")).limit(shortN)
      val sl = el.join(broadcast(short.select("vec_id")), Seq("vec_id"))
      val sims = sl.select(col("vec_id").as("a"), col("dim"), col("qv").as("qa"))
        .join(sl.select(col("vec_id").as("b"), col("dim"), col("qv").as("qb")), Seq("dim"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(sum(col("qa") * col("qb")).as("sim"))
      // collect() allowlist: both relations are k-bounded by construction
      // (shortlist ≤ 12 rows, sims ≤ 12·11 rows) and the MMR greedy is
      // inherently sequential (each argmax depends on the previous
      // selections), so a driver fold over the bounded candidate set is
      // the correct plan — the q212/k-means|| discipline.
      val cands = short.collect().map(r => (r.getLong(0), r.getLong(1)))
      val simMap = sims.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      val chosen = scala.collection.mutable.Set.empty[Long]
      (1 to k).foreach { round =>
        val scored = cands.filterNot(c => chosen(c._1)).map { case (id, r) =>
          val maxsim =
            if (chosen.isEmpty) 0L
            else chosen.map(sid => simMap.getOrElse((id, sid), 0L)).max
          (id, r, maxsim, r - maxsim)
        }
        if (scored.nonEmpty) {
          val best = scored.minBy { case (id, _, _, m2) => (-m2, id) }
          chosen += best._1
          selected += ((round.toLong, best._1, best._2, best._3, best._4))
        }
      }
      import s.implicits._
      selected.toSeq.toDF("round", "vec_id", "rel", "maxsim", "mmr2")
    }
  }

  /** q258 — Kaplan–Meier survival over user lifetimes (Kaplan & Meier
    * 1958): per user, duration = last-event day − first-event day;
    * users whose last activity predates the corpus horizon are CHURN
    * events, users active on the final day are right-CENSORED — the
    * estimator survival analysis exists for (naive "avg lifetime"
    * UNDERSTATES retention because it treats the still-alive as dead
    * today). Per distinct duration t: at-risk n_t = users with
    * duration ≥ t (N − exclusive-prefix-count via [[PrefixScan]] — no
    * single-task window), churn d_t, and the product-limit
    * Ŝ(t) = Π_{u≤t} (1 − d_u/n_u). The product recurrence folds on
    * the driver over the duration domain (calendar-bounded — ≤ |days|
    * rows at any corpus scale) and the oracle replays it as a
    * recursive CTE; every step is the same IEEE divide/subtract/
    * multiply on the same exact integer operands in the same order,
    * so even the float survival hash-matches. */
  val q258 = Q("q258_kaplan_meier",
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
      |u AS (
      |  SELECT user_id, MAX(day) - MIN(day) AS dur FROM ev GROUP BY 1),
      |mx AS (SELECT MAX(day) AS horizon FROM ev),
      |lab AS (
      |  SELECT u.dur,
      |         CASE WHEN e.last_day < mx.horizon THEN 1 ELSE 0 END AS churned
      |  FROM u JOIN (SELECT user_id, MAX(day) AS last_day FROM ev GROUP BY 1) e
      |    ON e.user_id = u.user_id, mx),
      |h AS (
      |  SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_users,
      |         CAST(SUM(churned) AS BIGINT) AS d_churn
      |  FROM lab GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS total FROM h),
      |i AS (
      |  SELECT dur, n_users, d_churn,
      |         t.total - CAST(COALESCE(SUM(n_users) OVER (ORDER BY dur
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk,
      |         row_number() OVER (ORDER BY dur) AS rn
      |  FROM h, t),
      |c AS (
      |  SELECT rn, dur, n_users, d_churn, n_at_risk,
      |         1.0 - CAST(d_churn AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS surv
      |  FROM i WHERE rn = 1
      |  UNION ALL
      |  SELECT i.rn, i.dur, i.n_users, i.d_churn, i.n_at_risk,
      |         c.surv * (1.0 - CAST(i.d_churn AS DOUBLE) / CAST(i.n_at_risk AS DOUBLE))
      |  FROM c JOIN i ON i.rn = c.rn + 1)
      |SELECT dur AS duration_days, n_at_risk, d_churn,
      |       n_users - d_churn AS c_censored, surv AS survival
      |FROM c""".stripMargin) { (s, d) =>
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division and
    // epoch-nanos exceed 2^53 (the Cols.nanosToTimestamp lesson).
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("ts div 86400000000000").as("day"))
    val u = ev.groupBy("user_id")
      .agg(min("day").as("first_day"), max("day").as("last_day"))
    val mx = ev.agg(max("day").as("horizon"))
    val h = u.crossJoin(broadcast(mx))
      .select((col("last_day") - col("first_day")).as("dur"),
        when(col("last_day") < col("horizon"), 1L).otherwise(0L).as("churned"))
      .groupBy("dur")
      .agg(count(lit(1)).as("g_n"), sum("churned").as("g_d"))
    val withRisk = PrefixScan.exclusiveRunningSum(h, "dur", "g_n", "g_cb", expr("dur div 64"))
      .crossJoin(broadcast(h.agg(sum("g_n").as("g_tot"))))
      .select(col("dur"), col("g_n"), col("g_d"),
        (col("g_tot") - col("g_cb")).as("n_at_risk"))
      .orderBy("dur")
    // collect() allowlist: the duration domain is calendar-bounded
    // (≤ |distinct days| rows at any corpus scale) and the
    // product-limit recurrence is non-associative — the q212 plan.
    val rows = withRisk.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var surv = 1.0
    val out = rows.map { case (dur, n, dch, risk) =>
      surv = surv * (1.0 - dch.toDouble / risk.toDouble)
      (dur, risk, dch, n - dch, surv)
    }
    import s.implicits._
    out.toSeq.toDF("duration_days", "n_at_risk", "d_churn", "c_censored", "survival")
  }

  /** q259 — PMI-style collocation mining: the top-20 adjacent bigrams
    * by LIFT, n_big·c(a,b) / (c(a)·c(b)) — the log-free monotone twin
    * of pointwise mutual information (log is transcendental; the RATIO
    * of exact integers orders identically and both engines compute the
    * identical IEEE quotient of identical BIGINTs). One explode for
    * bigram counts, one for unigram counts (both vocab-bounded
    * aggregates with map-side combine), two vocab-sized joins, a
    * distributed TakeOrdered — no corpus-sized sort. Support floor
    * c(a,b) ≥ 5 keeps the rare-pair PMI pathology (hapax pairs score
    * infinity) out, the textbook fix. Products go through
    * DECIMAL(38,0)/HUGEINT: n_big·c_ab at corpus scale overflows
    * int64. */
  val q259 = Q("q259_pmi_collocations",
    """WITH toks AS (SELECT string_split(trim(text), ' ') AS t FROM documents),
      |big AS (
      |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
      |                               i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM toks),
      |cab AS (SELECT string_split(bg, ' ')[1] AS a, string_split(bg, ' ')[2] AS b,
      |               CAST(COUNT(*) AS BIGINT) AS c_ab
      |        FROM big GROUP BY 1, 2),
      |uni AS (SELECT unnest(t) AS w FROM toks),
      |cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM uni GROUP BY 1),
      |nb AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_big FROM cab),
      |scored AS (
      |  SELECT cab.a, cab.b, cab.c_ab, ca.c_w AS c_a, cb.c_w AS c_b,
      |         CAST(CAST(nb.n_big AS HUGEINT) * cab.c_ab AS DOUBLE)
      |           / CAST(CAST(ca.c_w AS HUGEINT) * cb.c_w AS DOUBLE) AS lift
      |  FROM cab JOIN cu ca ON ca.w = cab.a JOIN cu cb ON cb.w = cab.b, nb
      |  WHERE cab.c_ab >= 5)
      |SELECT a, b, c_ab, c_a, c_b, lift FROM (
      |  SELECT *, row_number() OVER (ORDER BY lift DESC, a, b) AS rn FROM scored) t
      |WHERE rn <= 20""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(split(trim(col("text")), " ").as("t"))
    val cab = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS a, t[i+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val cu = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val nb = toks.select(
        when(size(col("t")) >= 2, size(col("t")) - 1).otherwise(0).cast(LongType).as("k"))
      .agg(sum("k").as("n_big"))
    val scored = cab
      .join(cu.select(col("w").as("a"), col("c_w").as("c_a")), Seq("a"))
      .join(cu.select(col("w").as("b"), col("c_w").as("c_b")), Seq("b"))
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        (col("n_big").cast(DecimalType(38, 0)) * col("c_ab")).cast("double")
          ./(
          (col("c_a").cast(DecimalType(38, 0)) * col("c_b")).cast("double"))
          .as("lift"))
    scored.orderBy(col("lift").desc, col("a"), col("b")).limit(20)
  }

  /** q260 — classical seasonal decomposition of daily revenue
    * (trend + seasonal + residual, the moving-average method of
    * Macaulay 1931 / the STL ancestor), EXACT: the trend is a centered
    * 7-OBSERVATION moving sum kept as the integer `trend_sum7` (÷7
    * deferred), the detrended series is the integer 7·xₜ − trend_sum7,
    * the weekday seasonal is that integer's per-isodow mean as an
    * exact fraction (s_num/s_den), and the residual
    * xₜ − trend − seasonal collapses to (dt·s_den − 7·s_num)/(7·s_den)
    * — every float output is ONE IEEE division of DECIMAL(38,0)/
    * HUGEINT integers. Edge days without a full 7-observation window
    * are excluded from the fit and the output (both engines apply the
    * same count-7 predicate). The window runs over the AGGREGATED
    * calendar-day relation — the q225 discipline: a single-task window
    * is correct on a domain that is ≤ |days| at any corpus scale;
    * the corpus-sized work is the one map-side-combined daily groupBy.
    * Complements q210 (which fits weekday shares of the RAW level —
    * confounded by trend; this one fits them on the detrended
    * series). */
  val q260 = Q("q260_seasonal_decompose",
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT day, cents,
      |         CAST(SUM(cents) OVER win AS BIGINT) AS t7,
      |         CAST(COUNT(*) OVER win AS BIGINT) AS c7,
      |         CAST(isodow(day) AS BIGINT) AS dow
      |  FROM d WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |i AS (SELECT day, cents, t7, dow, 7 * cents - t7 AS dt FROM w WHERE c7 = 7),
      |s AS (SELECT dow, CAST(SUM(dt) AS BIGINT) AS s_num,
      |             CAST(7 * COUNT(*) AS BIGINT) AS s_den
      |      FROM i GROUP BY 1)
      |SELECT i.day, i.cents, i.t7 AS trend_sum7, i.dow AS isodow,
      |       s.s_num AS seasonal_num, s.s_den AS seasonal_den,
      |       CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE) AS seasonal,
      |       CAST(CAST(i.dt AS HUGEINT) * s.s_den - 7 * CAST(s.s_num AS HUGEINT) AS DOUBLE)
      |         / CAST(7 * CAST(s.s_den AS HUGEINT) AS DOUBLE) AS residual
      |FROM i JOIN s ON i.dow = s.dow""".stripMargin) { (s, d) =>
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)).as("cents"))
    val win = org.apache.spark.sql.expressions.Window.orderBy("day").rowsBetween(-3, 3)
    val i = daily.select(col("day"), col("cents"),
        sum("cents").over(win).as("t7"),
        count(lit(1)).over(win).as("c7"),
        (weekday(col("day")) + 1).cast(LongType).as("dow"))
      .filter(col("c7") === 7)
      .withColumn("dt", lit(7) * col("cents") - col("t7"))
    val sTab = i.groupBy("dow")
      .agg(sum("dt").as("s_num"), (lit(7L) * count(lit(1))).as("s_den"))
    i.join(broadcast(sTab), Seq("dow"))
      .selectExpr("day", "cents", "t7 AS trend_sum7", "dow AS isodow",
        "s_num AS seasonal_num", "s_den AS seasonal_den",
        "CAST(s_num AS DOUBLE) / CAST(s_den AS DOUBLE) AS seasonal",
        "CAST(CAST(dt AS DECIMAL(38,0)) * s_den - 7 * CAST(s_num AS DECIMAL(38,0)) AS DOUBLE)" +
          " / CAST(7 * CAST(s_den AS DECIMAL(38,0)) AS DOUBLE) AS residual")
  }

  val all: Seq[Q] = Seq(q245, q246, q247, q248, q249, q250, q251, q252,
    q253, q254, q255, q256, q257, q258, q259, q260)
}
