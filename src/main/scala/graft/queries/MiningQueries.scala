package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{FuzzyJoin, Kmv}
import graft.operators.{Bfs, Skyline}
import graft.pipeline.TempDirs.spillParquet

/** Round-12 mining batch: fuzzy entity matching (SymSpell ED-1 join),
  * graph traversal (multi-source BFS), deterministic KMV sketch set
  * algebra, the 2-D skyline operator, and deterministic weighted
  * sampling. Everything here hash-gates — including the sketch query,
  * whose md5-derived bottom-k arithmetic is exactly replayable in the
  * DuckDB oracle (the first fully-oracled sketch in the suite; the
  * HLL/CMS/t-digest tier is rows-only by design because THEIR
  * estimators are float/engine-specific).
  */
object MiningQueries {

  /** q189 — fuzzy self-join on customer names at edit distance ≤ 1
    * (typo-tolerant entity resolution, the record-linkage primitive).
    * Candidates come from the SymSpell deletion-neighborhood equi-join
    * — lossless for ED ≤ 1 ([[graft.functions.FuzzyJoin]] proves it) —
    * so the oracle can be the O(n²) `levenshtein` pair join the prune
    * avoids: the candidate generation itself is under the hash gate,
    * exactly the q178 prefix-filter discipline. */
  val q189 = Q("q189_fuzzy_name_join",
    """WITH v AS (SELECT DISTINCT c_name AS w FROM customer)
      |SELECT a.w AS w_a, b.w AS w_b
      |FROM v a JOIN v b ON a.w < b.w
      |WHERE levenshtein(a.w, b.w) <= 1""".stripMargin) { (s, d) =>
    FuzzyJoin.ed1Pairs(Tables.customer(s, d), "c_name")
  }

  /** q190 — multi-source BFS over the co-purchase part graph: hop
    * distance (≤ 3) from the basket of the earliest order to every
    * reachable part — "how many recommendation steps away is the rest
    * of the catalog". Frontier-join rounds with staged lineage
    * ([[graft.operators.Bfs]]); the oracle replays it as a bounded
    * recursive CTE. The seed set is derived IN the plan (join against
    * the 1-row min-order aggregate — no driver round-trip). */
  val q190 = Q("q190_bfs_hops",
    """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS x, b.p AS y
      |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
      |seed AS (SELECT DISTINCT p FROM op WHERE o = (SELECT MIN(o) FROM op)),
      |r AS (
      |  SELECT p, 0 AS hop FROM seed
      |  UNION
      |  SELECT e.y, r.hop + 1 FROM r JOIN e ON e.x = r.p WHERE r.hop < 3)
      |SELECT p AS part, CAST(MIN(hop) AS BIGINT) AS hop FROM r GROUP BY 1""".stripMargin) { (s, d) =>
    val op = spillParquet(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct(),
      "graft_bfs_op_")
    val edges = spillParquet(
      op.select(col("o"), col("p").as("x"))
        .join(op.select(col("o"), col("p").as("y")), Seq("o"))
        .filter(col("x") =!= col("y"))
        .select("x", "y").distinct(),
      "graft_bfs_edges_")
    val minO = op.agg(min(col("o")).as("g_mo"))
    val seeds = op.join(broadcast(minO), col("o") === col("g_mo"))
      .select(col("p").as("part"))
    Bfs.hopDistances(edges, "x", "y", seeds, "part", maxHops = 3)
  }

  /** q191 — KMV bottom-64 sketch set algebra over event-user sets:
    * distinct viewers, distinct purchasers, their union (sketch MERGE
    * — bottom-k of the sketch union, the mergeability that makes KMV a
    * partial aggregate), and the Beyer et al. intersection estimator
    * ρ·n̂_union with ρ = in-both fraction of the union sketch. All
    * integer arithmetic over the house md5-h40 hash: the sketch, the
    * k-th minimum, and both estimators replay bit-for-bit in the
    * oracle — approximate ANSWERS under an exact GATE. Exact
    * counterparts ride along in the same row, so the driver's compare
    * also pins the estimator against its target. (The theoretical
    * div-by-zero at h₍ₖ₎ = 0 needs 64 md5 outputs below 2²⁰/2⁶⁰ —
    * ~2⁻²⁰ each — and would fail loudly in both engines, not skew.) */
  val q191 = {
    val k = 64
    val h = Kmv.h40Sql("CAST(user_id AS VARCHAR)")
    val est = (c: String, m: String) => Kmv.estimateSql(c, m, k)
    Q("q191_kmv_set_algebra",
      s"""WITH vu AS (SELECT DISTINCT $h AS h FROM events WHERE event_type = 'view'),
         |pu AS (SELECT DISTINCT $h AS h FROM events WHERE event_type = 'purchase'),
         |mu AS (SELECT h, MAX(fv) AS in_v, MAX(fp) AS in_p FROM (
         |         SELECT h, 1 AS fv, 0 AS fp FROM vu
         |         UNION ALL SELECT h, 0 AS fv, 1 AS fp FROM pu) u GROUP BY h),
         |sv AS (SELECT h FROM vu ORDER BY h LIMIT $k),
         |sp AS (SELECT h FROM pu ORDER BY h LIMIT $k),
         |su AS (SELECT h, in_v, in_p FROM mu ORDER BY h LIMIT $k),
         |agg AS (SELECT
         |  (SELECT COUNT(*) FROM sv) AS v_cnt, (SELECT MAX(h) FROM sv) AS v_kth,
         |  (SELECT COUNT(*) FROM sp) AS p_cnt, (SELECT MAX(h) FROM sp) AS p_kth,
         |  (SELECT COUNT(*) FROM su) AS u_cnt, (SELECT MAX(h) FROM su) AS u_kth,
         |  (SELECT CAST(SUM(in_v * in_p) AS BIGINT) FROM su) AS inter_matches,
         |  (SELECT COUNT(*) FROM vu) AS exact_view,
         |  (SELECT COUNT(*) FROM pu) AS exact_purchase,
         |  (SELECT COUNT(*) FROM mu WHERE in_v = 1 AND in_p = 1) AS exact_intersection),
         |est AS (SELECT *,
         |  ${est("v_cnt", "v_kth")} AS est_view,
         |  ${est("p_cnt", "p_kth")} AS est_purchase,
         |  ${est("u_cnt", "u_kth")} AS est_union FROM agg)
         |SELECT est_view, est_purchase, est_union, inter_matches,
         |       (inter_matches * est_union) // $k AS est_intersection,
         |       exact_view, exact_purchase, exact_intersection
         |FROM est""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), Kmv.h40(col("user_id").cast("string")).as("h"))
      val vu = spillParquet(
        ev.filter(col("event_type") === "view").select("h").distinct(), "graft_kmv_vu_")
      val pu = spillParquet(
        ev.filter(col("event_type") === "purchase").select("h").distinct(), "graft_kmv_pu_")
      val mu = vu.select(col("h"), lit(1).as("fv"), lit(0).as("fp"))
        .unionAll(pu.select(col("h"), lit(0).as("fv"), lit(1).as("fp")))
        .groupBy("h").agg(max("fv").as("in_v"), max("fp").as("in_p"))
      val sv = Kmv.summary(Kmv.sketch(vu, "h", k), "h")
        .select(col("g_cnt").as("v_cnt"), col("g_kth").as("v_kth"))
      val sp = Kmv.summary(Kmv.sketch(pu, "h", k), "h")
        .select(col("g_cnt").as("p_cnt"), col("g_kth").as("p_kth"))
      val su = mu.orderBy("h").limit(k)
        .agg(count("h").as("u_cnt"), max("h").as("u_kth"),
          sum(col("in_v") * col("in_p")).cast("long").as("inter_matches"))
      val exacts = vu.agg(count("h").as("exact_view")).crossJoin(
        pu.agg(count("h").as("exact_purchase"))).crossJoin(
        mu.filter(col("in_v") === 1 && col("in_p") === 1)
          .agg(count("h").as("exact_intersection")))
      sv.crossJoin(sp).crossJoin(su).crossJoin(exacts)
        .selectExpr(
          s"${Kmv.estimateExpr("v_cnt", "v_kth", k)} AS est_view",
          s"${Kmv.estimateExpr("p_cnt", "p_kth", k)} AS est_purchase",
          s"${Kmv.estimateExpr("u_cnt", "u_kth", k)} AS est_union",
          "inter_matches", "exact_view", "exact_purchase", "exact_intersection")
        .selectExpr("est_view", "est_purchase", "est_union", "inter_matches",
          s"(inter_matches * est_union) div $k AS est_intersection",
          "exact_view", "exact_purchase", "exact_intersection")
    }
  }

  /** q192 — 2-D skyline over per-part sales stats: the Pareto frontier
    * of (lineitem count ↑, minimum sell price ↓) — "no other part both
    * sells more often and has been seen cheaper". Sorted-prefix
    * skyline ([[graft.operators.Skyline]]): one aggregation shuffle +
    * a distinct-x-domain running min, vs the oracle's O(n²) NOT
    * EXISTS. Price comparisons stay in DECIMAL(18,2) (exact) and only
    * the output casts to double, the house money rule. */
  val q192 = Q("q192_skyline_parts",
    """WITH m AS (SELECT l_partkey AS part, COUNT(*) AS n_li,
      |                  MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS mp
      |           FROM lineitem GROUP BY 1)
      |SELECT p.part, p.n_li, CAST(p.mp AS DOUBLE) AS min_price
      |FROM m p WHERE NOT EXISTS (
      |  SELECT 1 FROM m q
      |  WHERE q.n_li >= p.n_li AND q.mp <= p.mp
      |    AND (q.n_li > p.n_li OR q.mp < p.mp))""".stripMargin) { (s, d) =>
    val m = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("part"))
      .agg(count(lit(1)).as("n_li"),
        min(col("l_extendedprice").cast(DecimalType(18, 2))).as("g_mp"))
    Skyline.frontier2d(m, "n_li", "g_mp")
      .select(col("part"), col("n_li"), col("g_mp").cast("double").as("min_price"))
  }

  /** q193 — deterministic weighted sampling without replacement: 10
    * docs per language, priority ∝ hash/weight with weight = n_chars
    * (longer docs more likely) — the exponential-race shape of
    * Efraimidis–Spirakis reservoir sampling with the transcendental
    * key (−ln u)/w replaced by the integer floor priority
    * (h₄₀·2²⁰) div w, which preserves the monotone
    * bigger-weight-smaller-key structure while staying exact int64 in
    * both engines (the race is approximate-proportional, the
    * COMPUTATION is deterministic and hash-gated; for exact
    * w-proportional draws you'd pay a float log — the q30/q82
    * rows-only tier's trade, deliberately not taken here). Per-group
    * top-k via one window shuffle on the group key. */
  val q193 = {
    val h = Kmv.h40Sql("CAST(doc_id AS VARCHAR)")
    Q("q193_weighted_sample",
      s"""WITH w AS (SELECT lang, doc_id,
         |                  (($h) * 1048576) // n_chars AS pri
         |           FROM documents WHERE n_chars > 0),
         |r AS (SELECT lang, doc_id, pri,
         |             row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rank
         |      FROM w)
         |SELECT lang, doc_id, pri, rank FROM r WHERE rank <= 10""".stripMargin) { (s, d) =>
      val w = Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("lang"), col("doc_id"),
          Kmv.h40(col("doc_id").cast("string")).as("g_h40"), col("n_chars"))
        .selectExpr("lang", "doc_id", "(g_h40 * 1048576L) div n_chars AS pri")
      val win = Window.partitionBy("lang").orderBy(col("pri"), col("doc_id"))
      w.withColumn("rank", row_number().over(win)).filter(col("rank") <= 10)
    }
  }

  val all: Seq[Q] = Seq(q189, q190, q191, q192, q193)
}
