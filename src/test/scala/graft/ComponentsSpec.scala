package graft

import graft.functions.Dedup
import graft.operators.Components

/** Distributed connected components (min-label propagation) — the
  * clustering stage of dedup. Registered under the oracle as q68; these
  * cases pin the graph semantics the oracle can't isolate. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], vertices: Seq[Long],
                    maxIters: Int = 100): Map[Long, Long] =
    Components.connectedComponents(
      edges.toDF("a", "b"), vertices.toDF("v"), maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain longer than one hop converges to the global min label") {
    // diameter 4: the min must propagate hop by hop across iterations
    val got = comps(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), 1L to 5L)
    assert(got === (1L to 5L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep distinct labels; isolated vertices self-label") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("edge direction is irrelevant (graph is symmetrized)") {
    assert(comps(Seq((1L, 9L), (9L, 2L)), Seq(1L, 2L, 9L)) ===
      Map(1L -> 1L, 2L -> 1L, 9L -> 1L))
  }

  test("star + cycle topologies: one component each, min label wins") {
    val star = (2L to 6L).map(x => (1L, x))
    val cycle = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val got = comps(star ++ cycle, (1L to 6L) ++ (20L to 22L))
    assert((1L to 6L).forall(got(_) == 1L))
    assert((20L to 22L).forall(got(_) == 20L))
  }

  test("star contraction == label propagation on every topology; long chain converges in O(log n) rounds") {
    val cases = Seq(
      // (edges, vertices)
      (Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), (1L to 5L).toSeq),
      (Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 2L, 3L, 10L, 11L, 99L)),
      ((2L to 6L).map(x => (1L, x)) ++ Seq((20L, 21L), (21L, 22L), (22L, 20L)),
        ((1L to 6L) ++ (20L to 22L)).toSeq),
      // adversarial 200-node chain: label propagation needs ~200 rounds
      ((1L until 200L).map(i => (i, i + 1L)), (1L to 200L).toSeq))
    cases.foreach { case (es, vs) =>
      val (starLabels, rounds) = Components.connectedComponentsStar(
        es.toDF("a", "b"), vs.toDF("v"))
      val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // propagation needs diameter-many rounds on the chain — give it 250
      assert(star === comps(es, vs, maxIters = 250), s"star != propagation on $es")
      assert(rounds <= 12, s"star contraction took $rounds rounds (expected O(log n))")
    }
  }

  test("randomized graphs: star contraction == propagation on 5 seeded Erdős–Rényi graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val es = for {
        i <- 1 to n; j <- (i + 1) to n if rnd.nextDouble() < 2.0 / n
      } yield (i.toLong, j.toLong)
      val vs = (1L to n.toLong).toSeq
      val (starLabels, _) = Components.connectedComponentsStar(es.toDF("a", "b"), vs.toDF("v"))
      val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star === comps(es, vs, maxIters = 250), s"mismatch on n=$n, |E|=${es.size}")
    }
  }

  test("non-convergence at maxIters fails loudly instead of returning wrong labels") {
    // diameter-4 chain, one iteration allowed: the min cannot reach the
    // far end, so partial labels would be silently wrong — both variants
    // must throw rather than return them
    val es = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    val ex = intercept[IllegalStateException] {
      // localMaxRows = 0: the maxIters contract belongs to the
      // DISTRIBUTED loop — the r16 union-find fast path has no
      // iteration bound to trip (it always converges), so force the
      // loop to pin its failure mode
      Components.connectedComponents(es.toDF("a", "b"), (1L to 5L).toDF("v"),
        maxIters = 1, localMaxRows = 0L)
    }
    assert(ex.getMessage.contains("did not converge"))
    val ex2 = intercept[IllegalStateException] {
      Components.connectedComponentsStar(
        (1L until 200L).map(i => (i, i + 1L)).toDF("a", "b"),
        (1L to 200L).toDF("v"), maxIters = 1)
    }
    assert(ex2.getMessage.contains("did not converge"))
    // the same graphs converge fine under the default bound
    assert(comps(es, 1L to 5L) === (1L to 5L).map(_ -> 1L).toMap)
  }

  test("rareGramEdges -> components on the corpus: labels form a valid partition") {
    val docs = Tables.documents(spark, sf)
    val edges = Dedup.rareGramEdges(docs, "doc_id", "text", n = 3,
      maxDf = 50L, minShared = 2L)
    val got = Components.connectedComponents(edges, docs.select($"doc_id"))
    val rows = got.collect().map(r => r.getLong(0) -> r.getLong(1))
    // every doc labeled exactly once, label <= id (min-reachable), and
    // every edge's endpoints agree on the component
    assert(rows.length === docs.count())
    assert(rows.forall { case (v, c) => c <= v })
    val label = rows.toMap
    val bad = edges.collect().filter(r => label(r.getLong(0)) != label(r.getLong(1)))
    assert(bad.isEmpty, s"edges crossing components: ${bad.take(5).mkString(",")}")
  }

  /** Driver-side reference: the same fixed-point integer PageRank,
    * vertex-at-a-time in plain Scala — every `/` is Long division, so
    * equality with the engine is EXACT, not approximate. */
  private def refPageRank(edges: Seq[(Long, Long)], vertices: Seq[Long],
                          iters: Int, scale: Long = 1000000000000L): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val n = vertices.size
    val teleport = (scale * 15L) / (100L * n)
    var rank = vertices.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((v, outs) <- adj; contrib = rank(v) / outs.size; u <- outs) in(u) += contrib
      rank = vertices.map(v => v -> (teleport + (85L * in(v)) / 100L)).toMap
    }
    rank
  }

  private def pr(edges: Seq[(Long, Long)], vertices: Seq[Long],
                 iters: Int = 5): Map[Long, Long] =
    graft.operators.PageRank.fixedPointRanks(
      edges.toDF("a", "b"), vertices.toDF("v"), "v", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("integer pagerank matches the driver-side reference EXACTLY on a mixed graph") {
    // star (1 is the hub) + a 2-cycle + an isolated vertex
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    for (k <- Seq(1, 3, 5))
      assert(pr(edges, vertices, k) === refPageRank(edges, vertices, k),
        s"mismatch at $k iterations")
  }

  test("pagerank ordering and teleport floor: hub > leaves; isolated vertex gets teleport only") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val vertices = Seq(1L, 2L, 3L, 4L, 9L)
    val got = pr(edges, vertices)
    assert(got(1L) > got(2L), "the hub must outrank its leaves")
    assert(got(2L) === got(3L) && got(3L) === got(4L), "symmetric leaves tie")
    val teleport = (1000000000000L * 15L) / (100L * 5L)
    assert(got(9L) === teleport, "an isolated vertex holds exactly the teleport mass")
  }

  test("leakage-safe split (q125): one split per component, and it is the component's hash split") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.ExtensionQueries.q125
      .fn(spark, "/root/testdata/sf0.001").cache()
    // the defining property: a near-dup cluster never straddles splits
    assert(out.groupBy("component")
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).isEmpty)
    // and the split is q57's arithmetic applied to the component label
    val h = graft.functions.Hashes
      .h60(concat(lit("split|"), col("component").cast("string"))) % 100
    val expect = when(h < 80, "train").when(h < 90, "val").otherwise("test")
    assert(out.filter(col("split") =!= expect).isEmpty)
    // every doc present exactly once
    assert(out.count() === Tables.documents(spark, "/root/testdata/sf0.001").count())
  }

  test("leakage audit (q130): naive doc-hash split leaks dup pairs; cluster split leaks none") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val naiveLeaks = graft.queries.ExtensionQueries.q130.fn(spark, dir).count()
    assert(naiveLeaks > 0, "fixture must exhibit the leakage q125 exists to prevent")
    // the same audit against q125's cluster-keyed assignment: zero by construction
    val docs = Tables.documents(spark, dir)
    val edges = graft.functions.Dedup.rareGramEdges(docs, "doc_id", "text", 3, 50L, 2L)
    val clusterSplit = graft.queries.ExtensionQueries.q125.fn(spark, dir)
      .select(col("doc_id"), col("split"))
    val clusterLeaks = edges
      .join(clusterSplit.select(col("doc_id").as("a"), col("split").as("sa")), Seq("a"))
      .join(clusterSplit.select(col("doc_id").as("b"), col("split").as("sb")), Seq("b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(clusterLeaks === 0L)
  }

  test("driver union-find fast path == distributed propagation (r16): fixed, randomized, and out-of-vertex-set edges") {
    def both(es: Seq[(Long, Long)], vs: Seq[Long]): Unit = {
      def run(cap: Long) = Components.connectedComponents(
          es.toDF("a", "b"), vs.toDF("v"), maxIters = 500, localMaxRows = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = run(Components.LocalCcMaxRows) // fast path (graphs are tiny)
      val dist = run(0L)                         // cap 0 disables → propagation loop
      assert(local === dist, s"local != distributed on edges=$es vertices=$vs")
    }
    // fixed topologies: chain, star+cycle, isolated vertices
    both(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), 1L to 5L)
    both((2L to 6L).map(x => (1L, x)) ++ Seq((20L, 21L), (21L, 22L), (22L, 20L)),
      (1L to 6L) ++ (20L to 22L))
    // an edge touching a vertex OUTSIDE the seeded set must not connect
    // through it on either path (the propagation loop never labels it)
    both(Seq((1L, 500L), (500L, 2L)), Seq(1L, 2L))
    // randomized graphs, fixed seed
    val rnd = new scala.util.Random(0xE5C0)
    (1 to 3).foreach { _ =>
      val n = 60 + rnd.nextInt(60)
      val vs = (1L to n.toLong).toSeq
      val es = Seq.fill(n)((1L + rnd.nextInt(n).toLong, 1L + rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      both(es, vs)
    }
  }
}
