package graft

import org.apache.spark.sql.functions._
import graft.functions.WordPiece
import graft.plans.{NativeExpressions, WordPieceEncode}

/** WordPiece greedy longest-match encode: kernel semantics (greedy,
  * continuation marking, UNK all-or-nothing), vocab closure, and the
  * dictionary-encode pipeline. */
class WordPieceSpec extends SparkSpec {

  private def set(ps: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); ps.foreach(s.add); s
  }
  private def enc(w: String, vocab: java.util.HashSet[String]): Seq[String] = {
    val a = WordPieceEncode.greedyEncode(w, vocab, 6)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }

  test("kernel: greedy longest-first beats shorter matches; ## marks continuations") {
    val v = set("ab", "abc", "a", "b", "c", "##ab", "##a", "##b", "##c")
    assert(enc("abcab", v) === Seq("abc", "##ab"))
    assert(enc("cab", v) === Seq("c", "##ab"))
    assert(enc("abc", v) === Seq("abc"))
    // greedy is NOT globally optimal: "ab"+"##?" dead-ends are not revisited —
    // with vocab {abc,a,##b,##c} the word "abc" takes the 3-piece whole match
    val v2 = set("a", "##b", "##c", "ab")
    assert(enc("abc", v2) === Seq("ab", "##c"))
  }

  test("kernel: a position matching nothing collapses the WHOLE word to [UNK]") {
    val v = set("a", "##a")
    assert(enc("aaa", v) === Seq("a", "##a", "##a"))
    assert(enc("aba", v) === Seq("[UNK]"))   // 'b' has no piece at position 2
    assert(enc("ba", v) === Seq("[UNK]"))    // nor as a prefix
    assert(enc("", v) === Seq.empty)
  }

  test("kernel: prefix pieces never match interior positions and vice versa") {
    val v = set("ab", "##c")                 // no plain 'c', no ##ab
    assert(enc("abc", v) === Seq("ab", "##c"))
    assert(enc("cab", v) === Seq("[UNK]"))   // 'c' only exists as continuation
  }

  test("trainVocab: topK cutoff + single-char closure in both forms") {
    import spark.implicits._
    val docs = Seq((1L, "abca abca bd"), (2L, "abca bd bd")).toDF("doc_id", "text")
    val vocab = WordPiece.trainVocab(docs, "text", topK = 2)
    // closure: every observed char survives as plain (pos 1) and ## (interior)
    assert(Set("a", "b", "##b", "##c", "##a", "##d").subsetOf(vocab.toSet))
    // but NOT forms never observed in that position ('d' never starts a word)
    assert(!vocab.contains("d") && !vocab.contains("##x"))
    // and the cutoff really bites: not every substring got in
    assert(!vocab.contains("abca"))
  }

  test("encodeDocs: pieces reassemble every word; same type encodes identically") {
    import spark.implicits._
    val docs = Seq((1L, "abca bd"), (2L, "bd abca")).toDF("doc_id", "text")
    val vocab = WordPiece.trainVocab(docs, "text", topK = 4)
    val out = WordPiece.encodeDocs(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // reassembly: concatenating pieces (## stripped) per (doc, word_pos)
    // reproduces the original token stream of each doc
    val rebuilt = out.groupBy(t => (t._1, t._2)).map { case ((d, p), ps) =>
      (d, p) -> ps.sortBy(_._3).map(_._4.stripPrefix("##")).mkString
    }
    assert(rebuilt((1L, 0)) === "abca" && rebuilt((1L, 1)) === "bd")
    assert(rebuilt((2L, 0)) === "bd" && rebuilt((2L, 1)) === "abca")
    // dictionary discipline: the same word type got the same pieces in both docs
    val abca1 = out.filter(t => t._1 == 1L && t._2 == 0).sortBy(_._3).map(_._4).toSeq
    val abca2 = out.filter(t => t._1 == 2L && t._2 == 1).sortBy(_._3).map(_._4).toSeq
    assert(abca1 === abca2)
    // first piece plain, rest ##-marked
    assert((abca1.head.take(2) != "##") && abca1.tail.forall(_.startsWith("##")))
  }

  test("expression: codegen path == kernel on the corpus word types") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val vocab = WordPiece.trainVocab(docs, "text", topK = 24)
    val types = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1).distinct()
    val viaExpr = types
      .select(col("w"), NativeExpressions.wordpiece(col("w"), vocab, 6).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val hs = set(vocab: _*)
    viaExpr.foreach { case (w, ps) => assert(ps === enc(w, hs), s"word $w") }
    assert(viaExpr.nonEmpty)
  }
}
