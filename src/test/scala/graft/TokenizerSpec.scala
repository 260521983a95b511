package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Semantics of the BPE merge-round fold (Text.mergePair): greedy
  * LEFTMOST non-overlapping pair replacement, pinned against a
  * driver-side reference scan — the fold ≡ parity-islands equivalence
  * the q105 oracle relies on is exercised here at random. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: the canonical greedy left-to-right BPE merge scan. */
  private def refMerge(toks: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += (a + b); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toList
  }

  private def engineMerge(rows: Seq[(Long, Seq[String])], a: String,
                          b: String): Map[Long, Seq[String]] =
    rows.toDF("id", "toks")
      .select(col("id"), Text.mergePair(col("toks"), a, b).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("merge round: hand cases incl. self-pair chains, created-symbol no-rematch, no-ops") {
    val cases = Seq(
      1L -> Seq("a", "b", "a", "b"), // both occurrences merge
      3L -> Seq("a", "a", "b"),      // the second a merges
      4L -> Seq("x", "y"),           // no occurrence: identity
      5L -> Seq("a"),                // single token: identity
      6L -> Seq("a", "b", "b"))      // created "ab" must not re-match as a
    val got = engineMerge(cases, "a", "b")
    assert(got(1L) === Seq("ab", "ab"))
    assert(got(3L) === Seq("a", "ab"))
    assert(got(4L) === Seq("x", "y"))
    assert(got(5L) === Seq("a"))
    assert(got(6L) === Seq("ab", "b"))
    // self-pair chain: leftmost wins, merged symbol does not chain on
    val tt = engineMerge(Seq(2L -> Seq("t", "t", "t")), "t", "t")
    assert(tt(2L) === Seq("tt", "t"))
  }

  /** Reference BPE trainer: per round count adjacent pairs, pick
    * (max count, lexicographically-least pair string), rewrite. */
  private def refTrain(corpus: Seq[List[String]],
                       rounds: Int): Seq[(Int, String, String, Long)] = {
    var docs = corpus
    val out = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val counts = docs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x + " " + y) }
        out += ((r, a, b, n))
        docs = docs.map(t => refMerge(t, a, b))
      }
      r += 1
    }
    out.toList
  }

  test("bpe trainer: merge sequence matches the reference trainer exactly; early exhaustion stops") {
    val corpus = Seq("a b a b c", "b c b c b c", "a b c a b c", "x y")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Text.bpeTrainMerges(df, "text", rounds = 6)
    assert(got === refTrain(corpus.map(_.split(" ").toList), 6))
    assert(got.size === 6, "this corpus sustains 6 merge rounds")
    // a corpus with one pair exhausts after one round, well before the budget
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Text.bpeTrainMerges(tiny, "text", rounds = 5) ===
      Seq((1, "a", "b", 1L)))
  }

  test("encodeBpe: train->encode replay equals the reference encoder; one projection, no shuffle") {
    val corpus = Seq("a b a b c d", "b c b c b c a b", "a b c a b c", "d d d d", "x")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Text.bpeTrainMerges(df, "text", rounds = 5).map(m => (m._2, m._3))
    val out = Text.encodeBpe(df, "doc_id", "text", merges)
    val got = out.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val want = merges.foldLeft(t.split(" ").toList) { case (ts, (a, b)) => refMerge(ts, a, b) }
      assert(got(i.toLong) === want, s"doc $i")
      assert(got(i.toLong).mkString === t.split(" ").mkString, "character mass conserved")
    }
    // scale claim: the M-merge fold is ONE map-side projection — the
    // encode pass itself adds zero exchanges over the scan
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 0, "encode must stay a single scan-speed projection")
    // empty merge list degrades to plain tokenization
    val plain = Text.encodeBpe(df, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(plain(0L) === List("a", "b", "a", "b", "c", "d"))
  }

  test("merge round: randomized equivalence with the reference scan; character mass conserved") {
    val rnd = new scala.util.Random(20260813L)
    val alpha = Vector("a", "b", "c")
    val rows: Seq[(Long, Seq[String])] = (1L to 200L).map(i =>
      i -> Vector.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(3))).toSeq)
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("c", "b"))) {
      val got = engineMerge(rows, a, b)
      rows.foreach { case (id, t) =>
        assert(got(id).toList === refMerge(t.toList, a, b), s"pair ($a,$b) on $t")
        assert(got(id).mkString === t.mkString, "character mass must be conserved")
      }
    }
  }
}
