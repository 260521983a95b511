package graft

import org.apache.spark.sql.functions._
import graft.functions.{FuzzyJoin, Kmv}
import graft.operators.{Bfs, Skyline}

/** Round-12 mining batch: BFS min-hop semantics, skyline dominance vs
  * the quadratic definition, SymSpell ED-1 candidate completeness vs
  * brute force, and KMV sketch invariants (unsaturated exactness,
  * mergeability). The q189–q193 registrations are oracle-gated; these
  * pin the operator semantics on crafted edges the fixture corpus
  * can't guarantee to exercise. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---- BFS ----

  test("bfs: min hop on a cyclic graph, unreachable excluded, maxHops bound") {
    // 1→2→3→4→1 cycle plus shortcut 1→3; 9 isolated; 5→6 separate comp
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Bfs.hopDistances(edges, "src", "dst", seeds, "id", maxHops = 10)
      .as[(Long, Long)].collect().toMap
    // hop(3) = 1 via the shortcut, NOT 2 via 1→2→3
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))

    val capped = Bfs.hopDistances(edges, "src", "dst", seeds, "id", maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bfs: multi-source takes the nearest seed; empty seeds yield empty") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 3L)).toDF("src", "dst")
    val got = Bfs.hopDistances(edges, "src", "dst", Seq(1L, 10L).toDF("id"),
      "id", maxHops = 5).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L))
    assert(Bfs.hopDistances(edges, "src", "dst",
      spark.emptyDataset[Long].toDF("id"), "id", 3).isEmpty)
  }

  // ---- Skyline ----

  test("skyline: matches the quadratic NOT-EXISTS definition, incl. exact ties") {
    // (x bigger better, y smaller better); (5,3) twice — tied pairs survive
    // together; (4,3) dominated by (5,3); (5,4) dominated same-x; (6,9)
    // survives on x alone; (2,1) survives on y alone.
    val rows = Seq((1L, 5L, 3L), (2L, 5L, 3L), (3L, 4L, 3L), (4L, 5L, 4L),
      (5L, 6L, 9L), (6L, 2L, 1L), (7L, 1L, 9L)).toDF("id", "x", "y")
    val got = Skyline.frontier2d(rows, "x", "y").select("id")
      .as[Long].collect().toSet
    val brute = rows.as("p").join(rows.as("q"),
        col("q.x") >= col("p.x") && col("q.y") <= col("p.y") &&
          (col("q.x") > col("p.x") || col("q.y") < col("p.y")), "left_anti")
      .select(col("p.id")).as[Long].collect().toSet
    assert(got === brute)
    assert(got === Set(1L, 2L, 5L, 6L))
  }

  // ---- SymSpell fuzzy join ----

  test("fuzzy ed1: candidates are complete vs brute force on all edit kinds") {
    // substitution (cat/bat), deletion (cat/at), insertion (cat/cart),
    // identical strings collapse, distance-2 (cat/dog-ish) excluded
    val words = Seq("cat", "bat", "at", "cart", "cut", "coat", "dog", "dot",
      "a", "b", "ab", "cat").toDF("w")
    val got = FuzzyJoin.ed1Pairs(words, "w")
      .as[(String, String)].collect().toSet
    val v = words.select(col("w")).distinct()
    val brute = v.select(col("w").as("a")).crossJoin(v.select(col("w").as("b")))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .as[(String, String)].collect().toSet
    assert(got === brute)
    assert(got.contains(("bat", "cat"))) // substitution
    assert(got.contains(("at", "cat")))  // deletion
    assert(got.contains(("cart", "cat"))) // insertion
    assert(got.contains(("a", "ab")))
    assert(!got.contains(("cat", "dog")))
    assert(!got.exists(p => p._1 == p._2))
  }

  test("fuzzy ed1 blocked: per-block brute-force parity, cross-block excluded") {
    // "cat"/"bat" match only inside block 1; the same pair split across
    // blocks (cat@1 vs bat@2) must NOT match; exact duplicates of
    // (blk, w) collapse; block 2 has its own matches.
    val rows = Seq((1L, "cat"), (1L, "bat"), (1L, "cat"), (2L, "bat"),
      (2L, "bad"), (2L, "dog"), (3L, "cat")).toDF("g", "w")
    val got = FuzzyJoin.ed1PairsBlocked(rows, "w", "g")
      .as[(Long, String, String)].collect().toSet
    val v = rows.distinct()
    val brute = v.select(col("g"), col("w").as("a"))
      .join(v.select(col("g"), col("w").as("b")), Seq("g"))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .select(col("g"), col("a"), col("b"))
      .as[(Long, String, String)].collect().toSet
    assert(got === brute)
    assert(got === Set((1L, "bat", "cat"), (2L, "bad", "bat")))
  }

  test("fuzzy ed2 blocked: candidates complete vs brute force on all 2-edit kinds") {
    // 2 subs (cat/big? no — craft): transposition = 2 ops (acb/abc),
    // 2 dels (abcd/ab), del+ins (abcd/abxd? that's 1 sub... use
    // (abcde/axcdy) 2 subs), sub+del (abcd/axc), 2 ins (ab/axby),
    // distance-3 excluded (abc/xyz)
    val rows = Seq((1L, "abc"), (1L, "acb"), (1L, "abcd"), (1L, "ab"),
      (1L, "axc"), (1L, "axby"), (1L, "abcde"), (1L, "axcdy"),
      (1L, "xyz"), (2L, "abc"), (2L, "abd"), (3L, "aaaa"), (3L, "aa"))
      .toDF("g", "w")
    val got = FuzzyJoin.ed2PairsBlocked(rows, "w", "g")
      .as[(Long, String, String)].collect().toSet
    val v = rows.distinct()
    val brute = v.select(col("g"), col("w").as("a"))
      .join(v.select(col("g"), col("w").as("b")), Seq("g"))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 2)
      .select(col("g"), col("a"), col("b"))
      .as[(Long, String, String)].collect().toSet
    assert(got === brute)
    assert(got.contains((1L, "abc", "acb")))   // transposition (2 ops)
    assert(got.contains((1L, "ab", "abcd")))   // 2 deletions
    assert(got.contains((1L, "abcde", "axcdy"))) // 2 substitutions
    assert(got.contains((3L, "aa", "aaaa")))   // repeated-char runs
    assert(!got.exists(p => p._2 == "abc" && p._3 == "xyz"))
    assert(!got.exists(p => p._1 == 2L && p._2 == "abc" && p._3 == "acb"))
  }

  test("fuzzy ed2 df cap: identity above max df; bounds a concentrated block; cold pairs survive") {
    // observed per-(block, variant) multiplicity on the completeness
    // fixture, then cap AT it: capped must equal uncapped exactly
    val rows = Seq((1L, "abc"), (1L, "acb"), (1L, "abcd"), (1L, "ab"),
      (1L, "axc"), (1L, "axby"), (1L, "abcde"), (1L, "axcdy"),
      (1L, "xyz"), (2L, "abc"), (2L, "abd"), (3L, "aaaa"), (3L, "aa"))
      .toDF("g", "w")
    val uncapped = FuzzyJoin.ed2PairsBlocked(rows, "w", "g")
      .as[(Long, String, String)].collect().toSet
    // max df on this fixture is small; any cap ≥ the fixture's 13
    // distinct strings dominates every group
    val capped = FuzzyJoin.ed2PairsBlocked(rows, "w", "g", maxVariantDf = 13L)
      .as[(Long, String, String)].collect().toSet
    assert(capped === uncapped)
    // concentration: 26 strings "q<c>x" share the hot depth-2 variant
    // "q" (df 26) and pairwise hot "qx"/"q<c>" families; every pair is
    // within ED ≤ 2 (same length, ≤ 2 substitutions), so uncapped
    // emits all C(26,2) = 325 pairs. A cap of 5 drops the hot groups,
    // bounding each surviving group's fan-out at 5²/2 — the capped
    // result must shrink strictly, stay a subset, and leave the COLD
    // block's pair untouched (recall outside the hot cluster intact).
    val hot = ('a' to 'z').map(c => (9L, s"q${c}x")) ++
      Seq((7L, "cold"), (7L, "colt"))
    val hotDf = hot.toDF("g", "w")
    val u2 = FuzzyJoin.ed2PairsBlocked(hotDf, "w", "g")
      .as[(Long, String, String)].collect().toSet
    assert(u2.count(_._1 == 9L) === 26 * 25 / 2)
    val c2 = FuzzyJoin.ed2PairsBlocked(hotDf, "w", "g", maxVariantDf = 5L)
      .as[(Long, String, String)].collect().toSet
    assert(c2.subsetOf(u2))
    assert(c2.count(_._1 == 9L) < 26 * 25 / 2)
    assert(c2.contains((7L, "cold", "colt")))
  }

  test("normalized ER: case, token order, and accent collapse before the ED budget") {
    // raw ED would miss every pair here; normalization links them:
    //  - 1/2: casefold ("Anna Smith" vs "anna smith")
    //  - 2/3: token sort ("anna smith" vs "Smith Anna")
    //  - 4/5: NFC (é composed vs e + combining acute) + same text
    //  - 6/7: normalization THEN one real typo (smith/smyth, ED 1)
    //  - 8: unrelated, stays a singleton
    //  - 9: same normalized name as 1 but another nation — blocked
    val rows = Seq(
      (1L, "Anna Smith", 1L), (2L, "anna smith", 1L), (3L, "Smith Anna", 1L),
      (4L, "Jos\u00e9 Cruz", 1L), (5L, "Jose\u0301 Cruz", 1L),
      (6L, "mary smith", 1L), (7L, "mary smyth", 1L),
      (8L, "peter jones", 1L), (9L, "anna smith", 2L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val got = graft.queries.MiningQueries.resolveNormalized(rows)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 6L, 8L -> 8L, 9L -> 9L))
  }

  test("incremental ER: cross-batch chains, exact twins, block exclusion, replay no-op") {
    val dir = graft.pipeline.TempDirs.scoped("graft_erspec_") + "/er"
    def cust(rows: Seq[(Long, String, Long)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey")
    // batch 0: cat@n1, cat@n2 (same name, different block — must NOT
    // link), dog@n1, aaa@n1
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((10L, "cat", 1L), (20L, "cat", 2L), (30L, "dog", 1L),
        (40L, "aaa", 1L))), 0L)
    // batch 1: bat@n1 links to standing cat@n1; dog@n1 twin (lev 0);
    // aab + abb chain through each other to standing aaa
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((5L, "bat", 1L), (31L, "dog", 1L), (41L, "aab", 1L),
        (42L, "abb", 1L))), 1L)
    val got = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 5L, 5L -> 5L, 20L -> 20L, 30L -> 30L,
      31L -> 30L, 40L -> 40L, 41L -> 40L, 42L -> 40L))
    // the commit is a DELTA: batch 1's labels partition holds only the
    // arrivals (5, 31, 41, 42) plus the one standing vertex whose
    // canonical id moved (10: cat's min custkey dropped 10 → 5) — NOT
    // the full 8-vertex assignment (the pre-r14 full-rewrite commit)
    val d1 = spark.read.parquet(s"$dir/labels")
      .filter($"_er_batch" === 1L).select("v").as[Long].collect().toSet
    assert(d1 === Set(5L, 31L, 41L, 42L, 10L))
    // batch 0's partition is untouched by batch 1 (append-only base)
    val b0 = spark.read.parquet(s"$dir/base")
      .filter($"_er_batch" === 0L).select("k").as[Long].collect().toSet
    assert(b0 === Set(10L, 20L, 30L, 40L))
    // replaying batch 1 is a no-op: commit markers and serving unchanged
    val before = graft.operators.IncrementalEr.lastCommitted(spark, dir)
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((31L, "dog", 1L))), 1L)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === before)
    val got2 = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(got2 === got)
    // RE-OBSERVATION in a new batch (custkey 31 re-sent): keeps its
    // standing label — no conflicting self-row, one row per vertex
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((31L, "dog", 1L))), 2L)
    val got3 = graft.operators.IncrementalEr.resolved(spark, dir)
    assert(got3.count() === got3.select("c_custkey").distinct().count())
    assert(got3.select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap === got)
  }

  test("ER forget: cluster split, canonical move, emptied partition, replay, re-arrival") {
    val dir = graft.pipeline.TempDirs.scoped("graft_erfspec_") + "/er"
    def cust(rows: Seq[(Long, String, Long)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey")
    // batch 0: bridge chain aa(1)-ab(2)-bb(3) (aa/bb are ED 2 — linked
    // ONLY through ab); exact twins cat(5)/cat(10); loner fox(8)
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((1L, "aa", 1L), (2L, "ab", 1L), (3L, "bb", 1L),
        (5L, "cat", 1L), (10L, "cat", 1L), (8L, "fox", 1L))), 0L)
    // batch 1: only the loner wolf(9) in nation 2 — forgetting it must
    // empty and drop its whole base partition
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((9L, "wolf", 2L))), 1L)
    // forget the bridge (2), the canonical twin (5), and the lone
    // partition occupant (9); 999 is absent (no-op member)
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(2L, 5L, 9L, 999L).toDF("c_custkey"), 2L)
    val got = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    // split: aa/bb no longer connected; move: cat's canon 5 -> 10
    assert(got === Map(1L -> 1L, 3L -> 3L, 10L -> 10L, 8L -> 8L))
    // forgotten rows are gone from the base, and batch 1's partition
    // directory (emptied wholesale) was dropped
    val baseK = spark.read.parquet(s"$dir/base").select("k")
      .as[Long].collect().toSet
    assert(baseK === Set(1L, 3L, 10L, 8L))
    assert(!new java.io.File(s"$dir/base/_er_batch=1").exists())
    // replaying the forget is a no-op (same commit-sequence guard)
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(2L, 5L).toDF("c_custkey"), 2L)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(2L))
    // a forgotten id re-arriving is a NEW record: self-labels, matches
    // fresh (cat(5) rejoins the cat cluster and retakes the min id)
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((5L, "cat", 1L))), 3L)
    val got2 = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 1L, 3L -> 3L, 5L -> 5L, 10L -> 5L, 8L -> 8L))
  }

  test("ER compact: resolved() bit-equal before/after, vacuum prunes, folds continue on the snapshot") {
    val dir = graft.pipeline.TempDirs.scoped("graft_ercspec_") + "/er"
    def cust(rows: Seq[(Long, String, Long)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey")
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((10L, "cat", 1L), (30L, "dog", 1L), (40L, "aaa", 1L))), 0L)
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((5L, "bat", 1L), (31L, "dog", 1L))), 1L)
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(40L).toDF("c_custkey"), 2L)
    def served() = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val before = served()
    // snapshot generation: serving unchanged, tombstoned 40 stays absent
    graft.operators.IncrementalEr.compact(spark, dir, 3L)
    assert(served() === before)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(3L))
    // pre-snapshot label partitions prune away; serving still unchanged
    graft.operators.IncrementalEr.vacuumLabels(spark, dir)
    assert(served() === before)
    assert(!new java.io.File(s"$dir/labels/_er_batch=0").exists())
    assert(new java.io.File(s"$dir/labels/_er_batch=3").exists())
    // replaying the compact id is a no-op
    graft.operators.IncrementalEr.compact(spark, dir, 3L)
    assert(served() === before)
    // later folds read THROUGH the snapshot: rat links to standing bat/cat
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((3L, "rat", 1L))), 4L)
    assert(served().map(t => t._1 -> t._2).toMap ===
      Map(3L -> 3L, 5L -> 3L, 10L -> 3L, 30L -> 30L, 31L -> 30L))
    // and forgets do too (bat forgotten; rat-cat remain directly linked
    // — one substitution — so the cluster survives with canon 3)
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(5L).toDF("c_custkey"), 5L)
    assert(served().map(t => t._1 -> t._2).toMap ===
      Map(3L -> 3L, 10L -> 3L, 30L -> 30L, 31L -> 30L))
  }

  test("ER no-op commits consume their batch id durably") {
    val dir = graft.pipeline.TempDirs.scoped("graft_ernoop_") + "/er"
    def cust(rows: Seq[(Long, String, Long)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey")
    // forget against a never-committed table: id 0 is consumed, and the
    // marker-only dir must not wedge later folds
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(7L).toDF("c_custkey"), 0L)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(0L))
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((10L, "cat", 1L))), 1L)
    // forget of ids matching nothing: id 2 consumed, serving unchanged
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(999L).toDF("c_custkey"), 2L)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(2L))
    // all-re-observed fold: id 3 consumed, no new base partition
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((10L, "cat", 1L))), 3L)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(3L))
    assert(!new java.io.File(s"$dir/base/_er_batch=3").exists())
    // a replayed maintain under a consumed no-op id cannot commit work
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((50L, "dog", 1L))), 2L)
    assert(graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey").as[Long].collect().toSet === Set(10L))
  }

  test("ER variant index: persisted per-batch partitions, forget rewrites them") {
    val dir = graft.pipeline.TempDirs.scoped("graft_ervspec_") + "/er"
    def cust(rows: Seq[(Long, String, Long)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey")
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((10L, "cat", 1L), (30L, "dog", 1L))), 0L)
    graft.operators.IncrementalEr.maintainBatch(dir)(
      cust(Seq((5L, "bat", 1L))), 1L)
    // one variants partition per batch, L rows per name
    val v0 = spark.read.parquet(s"$dir/variants")
    assert(v0.filter($"_er_batch" === 0L).count() === 6) // cat+dog, 3 each
    assert(v0.filter($"_er_batch" === 1L).count() === 3)
    // forgetting cat rewrites batch 0's variant partition without it
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(10L).toDF("c_custkey"), 2L)
    val v1 = spark.read.parquet(s"$dir/variants")
    assert(v1.filter($"_er_batch" === 0L).select("k")
      .as[Long].collect().toSet === Set(30L))
    // forgetting the whole of batch 1 drops its variant partition dir
    graft.operators.IncrementalEr.forget(spark, dir,
      Seq(5L).toDF("c_custkey"), 3L)
    assert(!new java.io.File(s"$dir/variants/_er_batch=1").exists())
    assert(graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey").as[Long].collect().toSet === Set(30L))
  }

  // ---- KMV ----

  test("kmv: unsaturated sketch is the exact set; estimator returns exact count") {
    val hashes = Seq(5L, 9L, 2L, 5L, 9L).toDF("h")
    val sk = Kmv.sketch(hashes, "h", k = 64)
    assert(sk.as[Long].collect().sorted.toSeq === Seq(2L, 5L, 9L))
    val est = Kmv.summary(sk, "h")
      .selectExpr(Kmv.estimateExpr("g_cnt", "g_kth", 64) + " AS e")
      .as[Long].head()
    assert(est === 3L)
  }

  test("kmv: mergeability — sketch(A ∪ B) == bottom-k of sketch(A) ∪ sketch(B)") {
    val k = 8
    val a = spark.range(0, 200).select(Kmv.h40(col("id").cast("string")).as("h"))
    val b = spark.range(150, 400).select(Kmv.h40(col("id").cast("string")).as("h"))
    val direct = Kmv.sketch(a.unionAll(b), "h", k).as[Long].collect().sorted.toSeq
    val merged = Kmv.sketch(
      Kmv.sketch(a, "h", k).unionAll(Kmv.sketch(b, "h", k)), "h", k)
      .as[Long].collect().sorted.toSeq
    assert(direct === merged)
  }

  // ---- Bounded weighted SSSP ----

  test("sssp: cheap 2-hop path beats expensive direct edge; hop bound binds; negatives refused") {
    import graft.operators.Sssp
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5; 3→4 extends to 4 only with rounds ≥ 3
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val d3 = Sssp.boundedDistances(edges, "src", "dst", "w", seeds, "id", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(d3 === Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
    // with 1 round, only direct relaxations: 3 via the expensive edge
    val d1 = Sssp.boundedDistances(edges, "src", "dst", "w", seeds, "id", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(d1 === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    intercept[IllegalArgumentException] {
      Sssp.boundedDistances(Seq((1L, 2L, -5L)).toDF("src", "dst", "w"),
        "src", "dst", "w", seeds, "id", rounds = 1)
    }
  }

  // ---- IntervalJoin ----

  test("interval overlap: matches brute force, one row per pair across shared chunks") {
    import graft.operators.IntervalJoin
    // chunk = 10; pairs sharing multiple chunks must emit ONCE; touching
    // endpoints (l.end == r.start) count as overlap; disjoint excluded
    val l = Seq((1L, 0L, 35L), (2L, 5L, 9L), (3L, 40L, 45L), (4L, 100L, 200L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 30L, 55L), (11L, 9L, 12L), (12L, 300L, 310L), (13L, 150L, 150L))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, "ls", "le", r, "rs", "re", chunk = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val brute = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("le") >= col("rs"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === brute)
    // spans 1-10 share 3 chunks with 10-30..55 — still exactly one row
    assert(got === Seq((1L, 10L), (1L, 11L), (2L, 11L), (3L, 10L), (4L, 13L)))
  }

  test("kmv: saturated estimate lands within 3x of truth on 1000 distinct values") {
    val n = 1000
    val hs = spark.range(0, n).select(Kmv.h40(col("id").cast("string")).as("h"))
    val est = Kmv.summary(Kmv.sketch(hs, "h", 64), "h")
      .selectExpr(Kmv.estimateExpr("g_cnt", "g_kth", 64) + " AS e")
      .as[Long].head()
    // KMV k=64 has ~1/√62 ≈ 13% relative stddev; 3x is a loose sanity
    // band that still catches a broken estimator (off by 2^20, etc.)
    assert(est > n / 3 && est < n * 3L, s"estimate $est vs true $n")
  }

  test("q215 join-size estimates land within 2x of the exact counts at sf0.001") {
    val row = graft.queries.MiningQueries.q215.fn(spark, sf).collect().head
    val (estJ, exJ) = (row.getAs[Long]("est_join"), row.getAs[Long]("exact_join"))
    val (estF, exF) = (row.getAs[Long]("est_selfjoin_parts"),
      row.getAs[Long]("exact_selfjoin_parts"))
    // k=256 sketch: ~6% relative stddev on the union estimate; 2x is
    // the break-glass band — a unit mix-up (k vs cnt, 2^40 scaling)
    // lands orders of magnitude out, not within it
    assert(estJ > exJ / 2 && estJ < exJ * 2, s"join: est $estJ vs exact $exJ")
    assert(estF > exF / 2 && estF < exF * 2, s"F2: est $estF vs exact $exF")
  }
}
