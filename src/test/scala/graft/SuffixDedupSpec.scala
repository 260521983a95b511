package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.{Dedup, SuffixDedup}

/** Exactness pins for the prefix-doubling suffix dedup: label equality
  * must coincide with verbatim window equality — no hash budget, no df
  * cap — on randomized corpora and at non-power-of-two window lengths
  * (the overlap-step round), plus the measured recall relationship to
  * q110's winnowing approximation. */
class SuffixDedupSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute-force reference: every length-win token window with its
    * corpus-wide count, computed doc-at-a-time in plain Scala. */
  private def refWindows(corpus: Seq[(Long, String)], win: Int): Map[(Long, Long), Long] = {
    val ws = corpus.flatMap { case (id, t) =>
      val toks = t.trim.split(" ").toSeq
      (1 to toks.size - win + 1).map(p => (id, p.toLong, toks.slice(p - 1, p - 1 + win).mkString(" ")))
    }
    val counts = ws.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    ws.collect { case (id, p, w) if counts(w) >= 2 => (id, p) -> counts(w) }.toMap
  }

  test("duplicate windows ≡ brute-force reference on randomized corpora, incl. odd win") {
    val rnd = new scala.util.Random(1138)
    for (win <- Seq(2, 3, 5, 8); trial <- 0 until 3) {
      val corpus = (0L until 12L).map { id =>
        id -> Seq.fill(6 + rnd.nextInt(30))(s"w${rnd.nextInt(6)}").mkString(" ")
      }
      val got = SuffixDedup.duplicateWindows(docs(corpus: _*), "doc_id", "text", win)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === refWindows(corpus, win), s"win=$win trial=$trial")
    }
  }

  test("self-duplication within one document counts (ExactSubstr convention)") {
    val d = docs(1L -> "a b c d a b c d x")
    val out = SuffixDedup.duplicateWindows(d, "doc_id", "text", win = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 2L, 5L -> 2L)) // "a b c d" at pos 1 and 5
  }

  test("spans: injected duplicate run is recovered maximally; islands merge per the house rule") {
    // 12-token run shared between two docs: all five 8-windows merge
    // into ONE [s,e] span covering exactly the run
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val d = docs(1L -> s"x1 x2 $run y1 y2", 2L -> s"z1 $run z2 z3 z4")
    val spans = SuffixDedup.duplicateSpans(d, "doc_id", "text", win = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set((1L, 3L, 14L, 5L), (2L, 2L, 13L, 5L)))
  }

  test("no duplication -> empty output; doc shorter than win emits nothing") {
    val d = docs(1L -> "a b c", 2L -> "d e f g h i j k l")
    assert(SuffixDedup.duplicateWindows(d, "doc_id", "text", win = 8).count() === 0)
  }

  test("out-of-range ids fail loudly, never wrap") {
    val d = docs((1L << 31) -> "a b a b")
    val e = intercept[Exception] {
      SuffixDedup.duplicateWindows(d, "doc_id", "text", win = 2).collect()
    }
    assert(e.getMessage.contains("SuffixDedup") ||
      Option(e.getCause).exists(_.getMessage.contains("SuffixDedup")))
  }

  test("cut: exactly one canonical copy of a three-way duplicate survives") {
    val run = (1 to 8).map(i => s"d$i").mkString(" ")
    val d = docs(1L -> s"a1 $run", 2L -> s"b1 b2 $run", 3L -> s"$run c1")
    val out = SuffixDedup.cutExactDuplicateSpans(d, "doc_id", "text", win = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // canonical = lexicographically-first occurrence = (doc 1, pos 2)
    assert(out === Map(1L -> s"a1 $run", 2L -> "b1 b2", 3L -> "c1"))
  }

  test("cut: untouched and shorter-than-win docs pass through; fully-covered doc disappears; NULL drops") {
    val run = (1 to 8).map(i => s"e$i").mkString(" ")
    val d = docs(1L -> run, 2L -> run, 3L -> "short doc", 4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9")
      .unionByName(docs(5L -> "x").withColumn("text", lit(null).cast("string")))
    val out = SuffixDedup.cutExactDuplicateSpans(d, "doc_id", "text", win = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 canonical survives whole; doc 2 is fully covered -> gone;
    // docs 3 (< win) and 4 (unique) unchanged; doc 5 NULL -> dropped
    assert(out === Map(1L -> run, 3L -> "short doc",
      4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
  }

  test("exact spans cover everything winnowing-approximate spans cover (recall ⊇, fixture-measured)") {
    // q110's approximation can only MISS or SPLIT (hashed grams +
    // df cap); modulo 64-bit collisions it never covers a position the
    // exact algorithm doesn't. Measured on sf0.001: the containment is
    // strict — the exact path also finds within-doc repeats that the
    // pair-based a<b view attributes differently.
    val d = Tables.documents(spark, sf)
    def coverage(df: DataFrame): Set[(Long, Long)] =
      df.select(col("doc_id"), explode(sequence(col("s"), col("e"))).as("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = coverage(SuffixDedup.duplicateSpans(d, "doc_id", "text", win = 8))
    // q110's b-side cut coordinates (the positions q117 would remove),
    // same window length as the exact gate
    val approx = coverage(Dedup
      .maximalDuplicateSpans(d, "doc_id", "text", n = 5, maxDf = 100L, minSpanTokens = 8)
      .select(col("b").as("doc_id"), col("start_b").as("s"),
        (col("start_b") + col("span_tokens") - 1L).as("e")))
    assert(approx.subsetOf(exact),
      s"winnowing covered ${(approx -- exact).size} positions the exact path missed")
    info(s"recall delta at sf0.001/win=8: exact covers ${exact.size} positions, " +
      s"winnowing (n=5, maxDf=100) covers ${approx.size} " +
      f"(${approx.size.toDouble / math.max(1, exact.size) * 100}%.1f%%)")
  }
}
