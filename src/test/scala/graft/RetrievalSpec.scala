package graft

import org.apache.spark.sql.DataFrame
import graft.functions.Retrieval

/** BM25 semantics pinned against an independent driver-side reference
  * implementation (plain Scala over hand-counted tfs), plus the
  * ordering properties retrieval relies on. */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Reference BM25 computed doc-at-a-time in plain Scala (no Spark):
    * same rational Robertson idf, same constants. */
  private def refBm25(corpus: Map[Long, String], terms: Seq[String],
                      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfT = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      id -> terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = (n - dfT(t) + 0.5) / (dfT(t) + 0.5)
        idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
      }.sum
    }
  }

  test("bm25 matches the driver-side reference implementation exactly") {
    val corpus = Map(
      1L -> "rare common x x x x",
      2L -> "common common common x x x",
      3L -> "x x x x x x x x x x x x",
      4L -> "rare rare common x x x x x")
    val got = Retrieval.bm25Scores(docs(corpus.toSeq.sortBy(_._1): _*),
      "doc_id", "text", terms = Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refBm25(corpus, Seq("rare", "common"))
    assert(got.keySet === want.keySet)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 1e-12, s"doc $id: got ${got(id)}, want $w")
  }

  test("bm25 ordering: tf monotone at equal dl; rare term outranks common at equal tf") {
    // d2 has more 'dup' than d1 at the same length → strictly higher score
    val tfCorpus = docs(
      1L -> "dup x x x x x",
      2L -> "dup dup x x x x",
      3L -> "y y y y y y")
    val s1 = Retrieval.bm25Scores(tfCorpus, "doc_id", "text", Seq("dup"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1(2L) > s1(1L) && s1(1L) > 0.0)
    assert(s1(3L) === 0.0) // no query term → exactly zero

    // 'rare' is in 1 of 4 docs, 'common' in 3 of 4; the two probe docs
    // carry each term once at identical dl → idf decides the order
    val idfCorpus = docs(
      1L -> "rare z z z",
      2L -> "common z z z",
      3L -> "common q q q",
      4L -> "common w w w")
    val s2 = Retrieval.bm25Scores(idfCorpus, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s2(1L) > s2(2L), "the rarer term must outrank the common one")
  }

  test("phrase search: consecutive positions only, all occurrences, order matters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" at 0 and 3; "b c" at 1
      (2L, "b a c b a"),   // has a and b but never "a b" consecutively... (4L,"a") no
      (3L, "a b")).toDF("doc_id", "text")
    def hits(p: String*) = Retrieval.phraseSearch(docs, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(hits("a", "b") === Set((1L, 0), (1L, 3), (3L, 0)))
    assert(hits("b", "c") === Set((1L, 1)))
    assert(hits("c", "a") === Set((1L, 2)))
    assert(hits("b", "a") === Set((2L, 0), (2L, 3))) // order is not symmetric
    assert(hits("a", "b", "c", "a", "b") === Set((1L, 0)))
    assert(hits("a", "b", "x").isEmpty)
    // single term = plain positional postings of that token
    assert(hits("a") === Set((1L, 0), (1L, 3), (2L, 1), (2L, 4), (3L, 0)))
  }

  test("phraseQueryTable: batch answers == per-phrase phraseSearch; repeated term exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c a b"),
      (2L, "b a c b a"),
      (3L, "a a a"),      // overlapping occurrences of "a a" at 0 and 1
      (4L, "a b a")).toDF("doc_id", "text")
    val toks = Retrieval.positionalPostings(corpus, "doc_id", "text")
    val phrases = Seq(
      (1L, 1, "a"), (1L, 2, "b"),
      (2L, 1, "b"), (2L, 2, "a"),
      (3L, 1, "a"), (3L, 2, "a"), // repeated term inside one phrase
      (4L, 1, "b"), (4L, 2, "a"), (4L, 3, "c")) // mixed length in one batch
      .toDF("phrase_id", "slot", "term")
    val got = Retrieval.phraseQueryTable(toks, "doc_id", phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // each phrase must match its single-phrase join-chain evaluation
    val want = Seq(1L -> Seq("a", "b"), 2L -> Seq("b", "a"),
      3L -> Seq("a", "a"), 4L -> Seq("b", "a", "c"))
      .flatMap { case (pid, p) =>
        Retrieval.phraseSearch(corpus, "doc_id", "text", p)
          .collect().map(r => (pid, r.getLong(0), r.getInt(1)))
      }.toSet
    assert(got === want)
    // the 3-gram is not granted completeness by the 2-gram bound
    assert(got.filter(_._1 == 4L) === Set((4L, 2L, 0)))
    // the repeated-term phrase found both overlapping starts in doc 3
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3)) === Set((3L, 0), (3L, 1)))
    // a vote cell can never be completed by two slots at one position:
    // doc 4 "a b a" has 'a' twice but never consecutively
    assert(!got.contains((3L, 4L, 0)) && !got.contains((3L, 4L, 1)))
  }

  test("hourly anomaly flags: spike flagged, steady baseline not, warm-up withheld") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val h = 3600L * 1000000000L // one hour of nanos
    // type "s": 30 steady hours at 10 events, then one 50-event spike hour
    val steady = (0 until 30).flatMap(i => Seq.fill(10)(("s", i * h + 1)))
    val spike = Seq.fill(50)(("s", 30 * h + 1))
    // type "w": only 10 hours — never exits warm-up
    val warm = (0 until 10).flatMap(i => Seq.fill(5)(("w", i * h + 1)))
    val events = (steady ++ spike ++ warm).toDF("event_type", "ts")
    val out = graft.operators.Anomaly
      .hourlyCountAnomalies(events, "event_type", "ts", window = 24, zThreshold = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(!out.keys.exists(_._1 == "w"), "under-window type must be withheld")
    // steady hours after warm-up: 24..29 present and unflagged
    (24 to 29).foreach(i => assert(out(("s", i.toLong)) === false, s"hour $i"))
    // the spike hour: variance of the constant baseline is 0 -> flagged
    assert(out(("s", 30L)) === true)
    assert(out.size === 7) // hours 24..30 for "s" only
  }

  test("hourly anomaly: pre-1970 timestamps bucket by FLOOR division (DuckDB // parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val h = 3600L * 1000000000L
    // ts = -1 nano is inside hour -1 under floor division; truncate-
    // toward-zero would lump it with hour 0 (the r10 ADVICE seam)
    val events = Seq(("x", -1L), ("x", -h), ("x", 0L), ("x", h - 1)).toDF("event_type", "ts")
    val hours = events
      .select(expr(s"(ts - pmod(ts, ${h}L)) div ${h}L").as("hour"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(hours === Seq(-1L, -1L, 0L, 0L))
  }

  test("proportion drift: moved cell flags, steady cells don't, per-group isolation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group g1: lang x collapses from 40% to 4% between snapshots —
    // must flag (both x and the absorbing y); group g2 identical
    // across snapshots — must not flag anything
    val g1a = Seq.fill(40)(("g1", "x", true)) ++ Seq.fill(60)(("g1", "y", true))
    val g1b = Seq.fill(4)(("g1", "x", false)) ++ Seq.fill(96)(("g1", "y", false))
    val g2 = Seq(true, false).flatMap(s =>
      Seq.fill(50)(("g2", "x", s)) ++ Seq.fill(50)(("g2", "y", s)))
    val df = (g1a ++ g1b ++ g2).toDF("grp", "lang", "in_a")
    val out = graft.operators.Anomaly
      .proportionDriftFlags(df, "grp", "lang", col("in_a"), zThreshold = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(6)).toMap
    assert(out(("g1", "x")) && out(("g1", "y")))
    assert(!out(("g2", "x")) && !out(("g2", "y")))
    assert(out.size === 4)
  }

  test("proportion drift: cell present in only one snapshot flags; all-constant never flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq.fill(50)(("g", "new", false)) ++
      Seq(true, false).flatMap(s => Seq.fill(200)(("g", "base", s)))
    val out = graft.operators.Anomaly
      .proportionDriftFlags(rows.toDF("grp", "lang", "in_a"), "grp", "lang",
        col("in_a"), zThreshold = 3)
      .collect().map(r => r.getString(1) -> r.getBoolean(6)).toMap
    assert(out("new"), "a cell appearing only in snapshot B is drift by definition")
    // a cell whose share is EXACTLY constant has diff = 0 -> never flags
    // (base moved share too because totals changed; recompute directly)
    val constant = Seq(true, false).flatMap(s => Seq.fill(30)(("h", "only", s)))
    val out2 = graft.operators.Anomaly
      .proportionDriftFlags(constant.toDF("grp", "lang", "in_a"), "grp", "lang",
        col("in_a"), zThreshold = 3)
      .collect()
    assert(out2.forall(!_.getBoolean(6)))
  }

  private def ranks(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "rank")
  }

  test("rrf fusion: exact rational values for both-lists and single-list docs") {
    val lex = ranks(1L -> 1, 2L -> 2, 3L -> 3)
    val sem = ranks(2L -> 1, 4L -> 2)
    val out = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(2L) === ((120L + 2 + 1, 62L * 61L))) // both lists
    assert(out(1L) === ((1L, 61L)))                 // lex only
    assert(out(4L) === ((1L, 62L)))                 // sem only
    assert(out.size === 4)
  }

  test("rrf fusion: ranking places two-list consensus above single-list hits; id tiebreak") {
    val lex = ranks(1L -> 1, 2L -> 2)
    val sem = ranks(2L -> 2, 3L -> 1)
    val fused = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank")
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    // doc 2: 1/62+1/62 ≈ 0.0323 beats doc 1 (1/61 ≈ 0.0164) and doc 3 (1/61);
    // docs 1 and 3 tie exactly -> id order
    assert(fused === Seq(2L, 1L, 3L))
  }

  test("rrf fusion: 3-list fold matches a driver-side rational reference") {
    val a = ranks(1L -> 1, 2L -> 3)
    val b = ranks(1L -> 2, 3L -> 1)
    val c = ranks(2L -> 1, 1L -> 4)
    val out = Retrieval.rrfFuse(Seq(a, b, c), "doc_id", "rank")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def ref(rs: Seq[Int]): (Long, Long) =
      rs.foldLeft((0L, 1L)) { case ((n, d), r) => (n * (60L + r) + d, d * (60L + r)) }
    // doc 1 in all three (ranks 1,2,4), doc 2 in a and c, doc 3 in b only
    assert(out(1L)._1 === ref(Seq(1, 2, 4))._1)
    assert(out(1L)._2 === ref(Seq(1, 2, 4))._2)
    assert(out(2L)._1 === ref(Seq(3, 1))._1 && out(2L)._2 === ref(Seq(3, 1))._2)
    assert(out(3L) === ((1L, 61L, 1.0 / 61.0)))
    // emitted double is exactly the single division of the rational
    assert(out(1L)._3 === out(1L)._1.toDouble / out(1L)._2.toDouble)
  }

  test("rrf fusion: list count outside 1..8 fails loudly (int64 rational envelope)") {
    val l = ranks(1L -> 1)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.fill(9)(l), "doc_id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Nil, "doc_id", "rank")
    }
  }

  test("bm25 from postings ≡ bm25 from raw text (the index-serving path)") {
    import spark.implicits._
    val docs = Seq((1L, "spark dup dup window"), (2L, "merge merge"),
      (3L, "spark window window other tokens here")).toDF("doc_id", "text")
    val terms = Seq("dup", "spark", "merge", "window")
    val fromText = Retrieval.bm25Scores(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fromIndex = Retrieval
      .bm25ScoresFromPostings(Retrieval.rawPostings(docs, "doc_id", "text"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fromIndex == fromText, "the two routes must be bit-identical")
  }
}
