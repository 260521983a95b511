package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.plans.NativeExpressions

/** The native DotProductF32 expression: bit-parity with the HOF form,
  * SQL registration via GraftExtensions, the optimizer rewrite, and a
  * sanity perf comparison. */
class NativeSpec extends SparkSpec {

  /** Run `f` with the HOF→native rewrite rule disabled, so parity tests
    * genuinely compare the interpreted HOF path against the native one
    * (with the rule active both sides would BE the native expression). */
  private def withoutRewrite[T](f: => T): T = {
    val k = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "graft.plans.RewriteHofDotProduct")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("native dot == HOF dot, bit-exact, on the real embeddings") { withoutRewrite {
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id"), col("embedding").as("eb"))
    val both = a.join(b, "vec_id").limit(200).select(
      Similarity.dotHof(col("ea"), col("eb")).as("hof"),
      NativeExpressions.dotF32(col("ea"), col("eb")).as("native"))
    // exact bit equality, not tolerance: both are left-to-right double sums
    assert(both.filter(col("hof") =!= col("native")).isEmpty)
    assert(both.count() === 200)
  } }

  test("optimizer rule: the HOF dot-product pattern rewrites to graft_dot_f32") {
    val e = Tables.embeddings(spark, sf)
    val q = e.select(Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot_f32"),
      "expected RewriteHofDotProduct to fire on the aggregate(zip_with(...)) pattern")
    // rewritten values == the genuinely-interpreted HOF values
    val rewritten = q.collect().map(_.getDouble(0))
    val plain = withoutRewrite {
      val p = e.select(Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
      assert(!p.queryExecution.optimizedPlan.toString.contains("graft_dot_f32"))
      p.collect().map(_.getDouble(0))
    }
    assert(rewritten.toSeq === plain.toSeq)
  }

  test("graft_dot_f32 resolves in SQL through GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT graft_dot_f32(a.embedding, b.embedding) AS d
        |FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    assert(!r.isNullAt(0) && (r.getDouble(0) !== 0.0))
  }

  test("null inputs propagate (BinaryExpression null-intolerance)") {
    import spark.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(NativeExpressions.dotF32(col("a"), col("b"))).head().isNullAt(0))
  }

  test("native l2sq == HOF l2sq, bit-exact, on the real embeddings") { withoutRewrite {
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id"), col("embedding").as("ea"))
    val b = e.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("eb"))
    val both = a.join(b, "vec_id").limit(200).select(
      Similarity.l2sqHof(col("ea"), col("eb")).as("hof"),
      NativeExpressions.l2sqF32(col("ea"), col("eb")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).isEmpty)
    assert(both.count() === 200)
  } }

  test("optimizer rule: the HOF L2-squared pattern rewrites to graft_l2sq_f32") {
    val e = Tables.embeddings(spark, sf)
    val q = e.select(Similarity.l2sqHof(col("embedding"), reverse(col("embedding"))).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_l2sq_f32"),
      "expected RewriteHofDotProduct to fire on the squared-difference pattern")
    val rewritten = q.collect().map(_.getDouble(0))
    val plain = withoutRewrite {
      val p = e.select(Similarity.l2sqHof(col("embedding"), reverse(col("embedding"))).as("d"))
      assert(!p.queryExecution.optimizedPlan.toString.contains("graft_l2sq_f32"))
      p.collect().map(_.getDouble(0))
    }
    assert(rewritten.toSeq === plain.toSeq)
  }

  test("graft_l2sq_f32: nulls/ragged propagate; SQL form resolves") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), Option.empty[Array[Float]]),   // null side
      (Some(Array(1f, 2f)), Some(Array(1f)))               // ragged pair
    ).toDF("a", "b")
    val r = df.select(NativeExpressions.l2sqF32(col("a"), col("b")).as("d")).collect()
    assert(r.forall(_.isNullAt(0)))
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_l2_v")
    val s = spark.sql(
      """SELECT graft_l2sq_f32(a.embedding, b.embedding) AS d
        |FROM emb_l2_v a JOIN emb_l2_v b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    assert(!s.isNullAt(0) && s.getDouble(0) > 0.0)
  }

  test("native simhash == HOF simhash on the corpus; SQL form resolves") {
    val d = Tables.documents(spark, sf)
    val both = d.select(
      graft.functions.Dedup.simhash(col("text")).as("native"),
      graft.functions.Dedup.simhashHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    d.createOrReplaceTempView("docs_v")
    val r = spark.sql(
      """SELECT graft_simhash64(transform(split(trim(text), ' '), t -> xxhash64(t))) AS sh
        |FROM docs_v LIMIT 1""".stripMargin).head()
    assert(!r.isNullAt(0))
  }

  test("graft_nfc: JDK-reference parity on randomized unicode, ASCII fast path, nulls, SQL form") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // alphabet mixes precomposed (\u00e9, \u00fc), decomposed
    // (e/u + combining U+0301/U+0308), a bare combining mark, Hangul
    // jamo (NFC composes full syllables), and ASCII
    val alpha = Vector("a", "\u00e9", "e\u0301", "\u0301", "A",
      "\u1100", "\u1161", " ", "\u00fc", "u\u0308")
    val rows: Seq[(Long, String)] = (1L to 300L).map { i =>
      i -> Vector.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size))).mkString
    } :+ (1000L -> null)
    val got = rows.toDF("id", "s")
      .select(col("id"), graft.functions.Text.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    rows.foreach { case (id, s) =>
      val want = if (s == null) null
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got(id) === want, s"input ${Option(s).map(_.codePoints.toArray.toSeq)}")
    }
    // SQL registration: decomposed in (2 code units), precomposed out
    val n = spark.sql("SELECT graft_nfc('e\u0301') AS n").head().getString(0)
    assert(n === "\u00e9" && n.length === 1)
    // the whole cleanText chain is one codegen'd projection over the scan
    val plan = Tables.documents(spark, sf)
      .select(graft.functions.Text.cleanText(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) === 0)
  }

  test("native path is not slower than HOF on a 250k-pair workload") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.select(col("embedding").as("ea"))
      .crossJoin(e.select(col("embedding").as("eb"))).cache()
    pairs.count() // materialize cache so both timings measure compute only
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      pairs.select(sum(c)).head()
      (System.nanoTime() - t0) / 1e9
    }
    val hof = withoutRewrite(time(Similarity.dotHof(col("ea"), col("eb"))))
    val native = time(NativeExpressions.dotF32(col("ea"), col("eb")))
    pairs.unpersist()
    info(f"hof=$hof%.2fs native=$native%.2fs speedup=${hof / native}%.1fx")
    assert(native <= hof * 1.5, f"native=$native%.2fs hof=$hof%.2fs") // generous: no regression
  }

  test("native bpe merge == HOF fold on randomized arrays incl. nulls; SQL form resolves") {
    import graft.functions.Text
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val alpha = Vector("a", "b", "c")
    val rows: Seq[(Long, Seq[String])] = (1L to 300L).map { i =>
      i -> Vector.fill(rnd.nextInt(14))(
        if (rnd.nextInt(10) == 0) null else alpha(rnd.nextInt(3))).toSeq
    }
    val df = rows.toDF("id", "toks")
    for ((a, b) <- Seq(("a", "b"), ("a", "a"))) {
      val both = df.select(col("id"),
        Text.mergePair(col("toks"), a, b).as("nat"),
        Text.mergePairHof(col("toks"), a, b).as("hof"))
      val diff = both.filter(not(col("nat") <=> col("hof")))
      assert(diff.isEmpty, s"pair ($a,$b): ${diff.collect().take(3).mkString}")
    }
    // null array propagates; empty array round-trips
    val edge = Seq((1L, null), (2L, Seq.empty[String]))
      .toDF("id", "toks")
      .select(col("id"), Text.mergePair(col("toks"), "a", "b").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(edge(1L).isEmpty && edge(2L).contains(Seq.empty[String]))
    // SQL registration through GraftExtensions
    val viaSql = spark.sql(
      "SELECT graft_bpe_merge(array('a','b','x'), 'a', 'b') AS m")
      .head().getSeq[String](0)
    assert(viaSql === Seq("ab", "x"))
  }

  test("graft_within_ed1 == levenshtein<=1 on randomized strings incl. surrogates and nulls; SQL form resolves") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    // alphabet forces the hard cases: repeated chars (dedup runs),
    // zero-padded digits (the q189 shape), an astral code point
    // (surrogate pair — the code-point walk must not count it twice),
    // and a combining mark (levenshtein is code-point, not grapheme)
    val alpha = Vector("a", "a", "0", "0", "1", "b", "😀", "́")
    val mk = () => Vector.fill(rnd.nextInt(8))(alpha(rnd.nextInt(alpha.size))).mkString
    val rows: Seq[(String, String)] =
      (1 to 800).map(_ => (mk(), mk())) ++
        Seq(("", ""), ("", "a"), ("a", null), (null, null),
          ("😀", "a"), ("a😀b", "ab"))
    val bad = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        NativeExpressions.withinEd1(col("a"), col("b")).as("nat"),
        (levenshtein(col("a"), col("b")) <= 1).as("ref"))
      .filter(not(col("nat") <=> col("ref")))
    assert(bad.isEmpty, bad.collect().take(5).mkString)
    // SQL registration through GraftExtensions
    assert(spark.sql("SELECT graft_within_ed1('cat', 'cart') AS e").head().getBoolean(0))
    assert(!spark.sql("SELECT graft_within_ed1('cat', 'dog') AS e").head().getBoolean(0))
  }

  test("graft_within_ed2 == levenshtein<=2 on randomized strings incl. surrogates and nulls; SQL form resolves") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    // same hard-case alphabet as the ed1 test; slightly longer strings
    // so length gaps of exactly 2 and 3 both occur
    val alpha = Vector("a", "a", "0", "0", "1", "b", "😀", "́")
    val mk = () => Vector.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.size))).mkString
    val rows: Seq[(String, String)] =
      (1 to 800).map(_ => (mk(), mk())) ++
        Seq(("", ""), ("", "ab"), ("", "abc"), ("a", null), (null, null),
          ("😀😀", "ab"), ("a😀b😀c", "abc"), ("kitten", "sitten"),
          ("kitten", "sittin"), ("kitten", "sitting"))
    val bad = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        NativeExpressions.withinEd2(col("a"), col("b")).as("nat"),
        (levenshtein(col("a"), col("b")) <= 2).as("ref"))
      .filter(not(col("nat") <=> col("ref")))
    assert(bad.isEmpty, bad.collect().take(5).mkString)
    // SQL registration through GraftExtensions
    assert(spark.sql("SELECT graft_within_ed2('cat', 'carts') AS e").head().getBoolean(0))
    assert(!spark.sql("SELECT graft_within_ed2('kitten', 'sitting') AS e").head().getBoolean(0))
  }

  test("AhoCorasickCounts counts ALL occurrences: overlaps, nesting, randomized brute-force parity") {
    import spark.implicits._
    import graft.plans.AhoCorasickCounts
    // brute force: count every start position where the pattern matches
    def brute(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

    // hand-picked adversarial dictionary: self-overlapping ("aa", "aba"),
    // nested ("ab" inside "aab"/"aba"), shared prefixes, a full word
    val pats = Seq("aa", "ab", "aba", "aab", "baa", "b")
    assert(!AhoCorasickCounts.isBorderFree("aa"))
    assert(!AhoCorasickCounts.isBorderFree("aba"))
    assert(AhoCorasickCounts.isBorderFree("ab"))
    assert(AhoCorasickCounts.isBorderFree("spark"))
    assert(AhoCorasickCounts.isBorderFree("fast scan"))

    // "aaaa" contains "aa" at 3 OVERLAPPING positions — the case a
    // replace-length count undercounts (it would say 2)
    val dfa = AhoCorasickCounts.build(pats)
    def scanOf(t: String): Seq[Long] =
      AhoCorasickCounts.scan(t, dfa, pats.length).toLongArray().toSeq
    assert(scanOf("aaaa") == pats.map(p => brute("aaaa", p)))
    assert(scanOf("aaaa").head == 3L)

    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      val t = Vector.fill(rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(scanOf(t) == pats.map(p => brute(t, p)), s"text=$t")
    }

    // expression path (codegen + eval) against the same brute force,
    // including null and non-ASCII resets
    val texts = Seq("abab aba", "", "aab😀aa", null, "bbbaaab")
    val out = texts.map(Tuple1(_)).toDF("t")
      .select(NativeExpressions.acCounts(col("t"), pats).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    texts.zip(out).foreach {
      case (null, got) => assert(got == null)
      case (t, got) => assert(got == pats.map(p => brute(t, p)), s"text=$t")
    }
  }
}
