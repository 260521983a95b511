package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector path — preference
  * order (b) from the build contract: when composing built-ins leaves
  * measurable cost on the table, a codegen'd `Expression` beats the
  * higher-order-function form (which allocates a zipped array and boxes
  * through lambda dispatch per element), and both beat any UDF.
  *
  * `DotProductF32` computes the same left-to-right double summation as
  * `Similarity.dot`'s `aggregate(zip_with(...))` — bit-identical
  * results (NativeSpec pins this on the real embeddings) — as one tight
  * primitive loop with no intermediate array.
  *
  * Null semantics match the HOF form exactly, so the optimizer rewrite
  * is semantics-preserving on ANY input: ragged pair (zip_with would
  * null-pad and poison the sum) ⇒ NULL; any null element ⇒ NULL; the
  * per-element null scan is only emitted when the array types say
  * `containsNull` — fixed-dimension non-null embeddings keep the tight
  * two-load loop.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes would be the idiomatic mixin, but AbstractDataType
  // is private[sql] in Spark 4 — manual check instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_f32 expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f32"
  // NULL on ragged/null-element inputs even when both arrays are non-null
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val nullScan = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullScan
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance over two float arrays — the twin of
  * [[DotProductF32]] for the IVF/PQ path, where every centroid assign,
  * codebook-training step, encode pass and ADC lookup-table build is a
  * `Σ (x−y)²`. Same left-to-right double accumulation as the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> (x−y)·(x−y)), 0.0, +)` —
  * bit-identical (NativeSpec pins it) — and the same null contract:
  * ragged pair ⇒ NULL, null element ⇒ NULL, null scan only emitted when
  * the type says `containsNull`.
  */
case class L2SqF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_l2sq_f32 expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq_f32"
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val nullScan = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullScan
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SimHash-64 over an array of 64-bit token hashes: per-bit majority
  * vote, one pass, no per-bit re-traversal (the HOF form in
  * graft.functions.Dedup walks the hash array 64 times). Bit-identical
  * to the HOF form (NativeSpec pins it). Empty array ⇒ 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < xs.numElements()) {
      val h = xs.getLong(i); var b = 0
      while (b < 64) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      i += 1
    }
    var r = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) r |= (1L << b); b += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h"); val r = ctx.freshName("r")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $r |= (1L << $b); }
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One BPE merge round over a token array: greedy LEFTMOST
  * non-overlapping replacement of the adjacent pair (a, b) by the
  * concatenated symbol, in ONE pass. The HOF fold form
  * (`Text.mergePairHof`) rebuilds the accumulator array per element —
  * O(L²) element copies per document, invisible at 50 tokens and a
  * real trap at 2k-token production documents; this is O(L) with a
  * single output allocation. Semantics are IDENTICAL to the fold for
  * NON-EMPTY pair components (NativeSpec pins it on randomized
  * arrays, nulls included; `Text.mergePair` enforces the non-empty
  * precondition — with b = "" the fold would chain-merge where this
  * scan consumes two positions per merge): null elements pass
  * through and never participate in a merge; null array ⇒ NULL.
  */
case class BpeMergeRound(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, a, b) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_merge expects (array<string>, string, string), got ($t, $a, $b)")
    }
  override def dataType: DataType = first.dataType
  override def prettyName: String = "graft_bpe_merge"

  override def nullSafeEval(t: Any, av: Any, bv: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val xs = t.asInstanceOf[ArrayData]
    val a = av.asInstanceOf[UTF8String]; val b = bv.asInstanceOf[UTF8String]
    val merged = UTF8String.concat(a, b)
    val n = xs.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val cur = if (xs.isNullAt(i)) null else xs.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(a) &&
          !xs.isNullAt(i + 1) && xs.getUTF8String(i + 1).equals(b)) {
        out.add(merged); i += 2
      } else { out.add(cur); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val cur = ctx.freshName("cur")
      val merged = ctx.freshName("merged")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $t.numElements();
         |java.util.ArrayList $out = new java.util.ArrayList($n);
         |$utf8 $merged = $utf8.concat($a, $b);
         |int $i = 0;
         |while ($i < $n) {
         |  $utf8 $cur = $t.isNullAt($i) ? null : $t.getUTF8String($i);
         |  if ($i + 1 < $n && $cur != null && $cur.equals($a)
         |      && !$t.isNullAt($i + 1) && $t.getUTF8String($i + 1).equals($b)) {
         |    $out.add($merged); $i += 2;
         |  } else { $out.add($cur); $i += 1; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Unicode NFC normalization of a string — the canonical-composition
  * pass every text-ingest pipeline runs before hashing/deduping
  * (decomposed "e‌+◌́" and precomposed "é" must collide, or every
  * hash-based dedup silently treats them as different documents).
  * Spark has no built-in for it; this wraps the JDK's normalizer as a
  * codegen'd unary expression with an `isNormalized` fast path, so the
  * overwhelmingly-common already-NFC row costs one scan and ZERO
  * allocations (the input UTF8String is returned as-is). The DuckDB
  * oracle twin is `nfc_normalize` — both implement UAX #15.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NfcNormalize {
  import org.apache.spark.unsafe.types.UTF8String
  /** Static kernel the generated code calls. */
  def normalize(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

/** Membership probe against a pre-built Bloom filter (Spark's public
  * `org.apache.spark.util.sketch.BloomFilter`, serialized into the
  * expression) — the probe-side reducer of
  * [[graft.operators.Relational.bloomPreJoin]]. Mirrors Spark's own
  * internal `BloomFilterMightContain` (InjectRuntimeFilter), which is
  * NOT in the public function registry — this is the case where no
  * built-in fits and a codegen'd Expression is the next rung down.
  *
  * The filter bytes ride in the expression (broadcast to executors with
  * the serialized plan, deserialized once per JVM via the transient
  * lazy); codegen emits one virtual call per row into the loaded
  * filter — no boxing, stays inside whole-stage codegen. NULL keys
  * probe as NULL (same as a join key: they can never match). */
case class BloomContainsLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects BIGINT key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  /** Instance entry point the generated code calls. */
  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomContainsLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** WordPiece-style GREEDY LONGEST-MATCH-FIRST subword encode of one
  * word against a fixed vocabulary (the BERT tokenizer's inference
  * rule): repeatedly take the longest vocab piece that prefixes the
  * remaining suffix, continuation pieces carrying the `##` marker; if
  * some position matches nothing the WHOLE word encodes as `[UNK]`
  * (the standard all-or-nothing rule — a corpus-derived vocab that
  * includes every observed single character never triggers it, so the
  * relational/oracle path can ignore UNK while the kernel stays
  * faithful for out-of-corpus input). Per-word cost is
  * O(len · maxPieceLen) hash probes in ONE codegen'd projection — the
  * vocab (bounded: topK + single-char closure) rides in the expression
  * and deserializes once per JVM, the [[BloomContainsLong]] discipline.
  * Piece lengths count String chars (UTF-16 units), matching DuckDB's
  * substr on the ASCII corpus; `maxPieceLen` bounds CONTENT length
  * (the `##` marker doesn't count). Empty word ⇒ empty array.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String], maxPieceLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece expects string word, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"
  override def nullable: Boolean = child.nullable

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add); s
  }

  /** Instance entry point the generated code calls. */
  def encode(w: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    WordPieceEncode.greedyEncode(w.toString, vocabSet, maxPieceLen)

  override def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWp", this, classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordPieceEncode {
  import org.apache.spark.unsafe.types.UTF8String
  val Unk = "[UNK]"

  def greedyEncode(w: String, vocab: java.util.HashSet[String],
                   maxPieceLen: Int): ArrayData = {
    val n = w.length
    val out = new java.util.ArrayList[AnyRef](4)
    var off = 0
    while (off < n) {
      var l = math.min(maxPieceLen, n - off)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (off == 0) w.substring(0, l) else "##" + w.substring(off, off + l)
        if (vocab.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[AnyRef](UTF8String.fromString(Unk)))
      out.add(UTF8String.fromString(hit)); off += l
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `levenshtein(a, b) <= 1` as ONE O(n) pass instead of the O(n·m) DP
  * matrix the general function allocates per row. Profiled on the q189
  * candidate verify (9.8M pairs at sf1.0): the built-in `levenshtein`
  * filter cost ~36 s of the 54 s wall — the threshold form never needs
  * the matrix. Equal lengths ⇒ lev ≤ 1 iff ≤ 1 position differs (the
  * one edit must be a substitution); lengths off by one ⇒ iff the
  * shorter is the longer minus one code point (single-skip walk);
  * otherwise false. Counts CODE POINTS (surrogate-aware), matching
  * both Spark's and DuckDB's levenshtein on any input. NULL if either
  * side is NULL — identical to the `levenshtein(a,b) <= 1` predicate
  * it replaces. */
case class WithinEd1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_within_ed1 expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_within_ed1"

  override def nullSafeEval(a: Any, b: Any): Any =
    WithinEd1.check(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.WithinEd1$$.MODULE$$.check($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WithinEd1 {
  import org.apache.spark.unsafe.types.UTF8String

  /** Static kernel the generated code calls. */
  def check(ua: UTF8String, ub: UTF8String): Boolean = {
    if (ua.equals(ub)) return true // byte-equal fast path (lev = 0)
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length; val lb = b.length
    if (la == lb) {
      var i = 0; var diff = 0
      while (i < la) {
        if (a(i) != b(i)) { diff += 1; if (diff > 1) return false }
        i += 1
      }
      true
    } else if (math.abs(la - lb) == 1) {
      val (s, l) = if (la < lb) (a, b) else (b, a)
      var i = 0; var j = 0; var skipped = false
      while (i < s.length && j < l.length) {
        if (s(i) == l(j)) { i += 1; j += 1 }
        else {
          if (skipped) return false
          skipped = true; j += 1
        }
      }
      true // at most the longer's final code point remains unmatched
    } else false
  }
}

/** `levenshtein(a, b) <= 2` as a BANDED Ukkonen DP — O(5·n) cells
  * instead of the O(n·m) matrix: with threshold k, only cells within
  * |i − j| ≤ k of the diagonal can stay ≤ k, so each row touches at
  * most 2k+1 = 5 columns and the scan bails the moment a whole band
  * exceeds 2. The q189/q238 verify-stage discipline one threshold
  * higher than [[WithinEd1]] (whose equal-length / off-by-one case
  * split has no 3-case analogue at k = 2 — the band IS the closed
  * form). Code points (surrogate-aware); NULL if either side is NULL —
  * identical to the `levenshtein(a, b) <= 2` predicate it replaces. */
case class WithinEd2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_within_ed2 expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_within_ed2"

  override def nullSafeEval(a: Any, b: Any): Any =
    WithinEd2.check(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.WithinEd2$$.MODULE$$.check($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WithinEd2 {
  import org.apache.spark.unsafe.types.UTF8String
  private final val K = 2
  private final val Inf = Int.MaxValue >> 1

  /** Static kernel the generated code calls. */
  def check(ua: UTF8String, ub: UTF8String): Boolean = {
    if (ua.equals(ub)) return true // byte-equal fast path (lev = 0)
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length; val lb = b.length
    if (math.abs(la - lb) > K) return false
    // two rolling rows, cells outside the |i-j| <= K band stay Inf
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= K) j else Inf; j += 1 }
    var i = 1
    while (i <= la) {
      val lo = math.max(1, i - K); val hi = math.min(lb, i + K)
      if (lo > 1) cur(lo - 1) = Inf
      cur(0) = if (i <= K) i else Inf
      var rowMin = cur(0)
      j = lo
      while (j <= hi) {
        val sub = if (a(i - 1) == b(j - 1)) prev(j - 1)
                  else prev(j - 1) + 1
        val del = prev(j) + 1   // drop a(i-1); Inf+1 stays "infinite"
        val ins = cur(j - 1) + 1
        var v = sub
        if (del < v) v = del
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < lb) cur(hi + 1) = Inf
      if (rowMin > K) return false // the band can only grow
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb) <= K
  }
}

/** Aho–Corasick multi-pattern occurrence counting (Aho & Corasick 1975,
  * CACM 18(6)): ALL occurrences of EVERY dictionary pattern in ONE
  * left-to-right pass — O(|text| + matches) regardless of dictionary
  * size, vs one `instr`/`replace` scan PER pattern (the naive plan is
  * |patterns|× the IO-free cost, and a PII/keyword dictionary is
  * hundreds of terms). The automaton is built once per expression
  * instance on the driver (goto trie + BFS failure links, resolved to
  * a dense DFA over the 7-bit alphabet; dictionary-suffix outputs are
  * aggregated per node at build time), shipped to executors inside the
  * serialized expression, and rebuilt lazily per JVM — the scan loop
  * is two array loads per input char inside whole-stage codegen.
  * Overlapping matches and patterns nested inside other patterns are
  * counted correctly (that is what the output-link aggregation is
  * for). Counts are per-pattern, in dictionary order.
  * Non-ASCII input chars can never continue an ASCII-pattern match and
  * reset to the root state; the patterns themselves must be 7-bit (the
  * constructor rejects otherwise). */
case class AhoCorasickCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "graft_ac_counts: patterns must be non-empty 7-bit ASCII strings")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ac_counts expects string text, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ac_counts"
  override def nullable: Boolean = child.nullable

  @transient private lazy val auto: AhoCorasickCounts.Dfa =
    AhoCorasickCounts.build(patterns)

  /** Instance entry point the generated code calls. */
  def scan(t: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    AhoCorasickCounts.scan(t.toString, auto, patterns.length)

  override def nullSafeEval(v: Any): Any =
    scan(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", this, classOf[AhoCorasickCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scan($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AhoCorasickCounts {
  /** Failure-resolved DFA: `next` is node×128 transitions, `outs` the
    * pattern ids (dictionary-suffix-aggregated) ending at each node. */
  final class Dfa(val next: Array[Array[Int]], val outs: Array[Array[Int]])

  def build(patterns: Seq[String]): Dfa = {
    // goto trie
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { ch =>
        if (next(s)(ch) == -1) {
          next += Array.fill(128)(-1); out += Nil
          next(s)(ch) = next.size - 1
        }
        s = next(s)(ch)
      }
      out(s) = pid :: out(s)
    }
    // BFS failure links, resolving goto misses into DFA transitions and
    // merging each node's outputs with its failure node's (already
    // complete when dequeued — BFS order guarantees it)
    val fail = Array.fill(next.size)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 128).foreach { c =>
      if (next(0)(c) == -1) next(0)(c) = 0
      else { fail(next(0)(c)) = 0; queue.enqueue(next(0)(c)) }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = out(u) ++ out(fail(u))
      (0 until 128).foreach { c =>
        val v = next(u)(c)
        if (v == -1) next(u)(c) = next(fail(u))(c)
        else { fail(v) = next(fail(u))(c); queue.enqueue(v) }
      }
    }
    new Dfa(next.toArray, out.map(_.toArray.sorted).toArray)
  }

  def scan(text: String, dfa: Dfa, nPatterns: Int): ArrayData = {
    val counts = new Array[Long](nPatterns)
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      s = if (ch < 128) dfa.next(s)(ch) else 0
      val os = dfa.outs(s)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  /** True iff the pattern has NO proper border (no prefix that is also
    * a suffix — KMP failure of the last position is 0). A border-free
    * pattern cannot overlap itself, so its all-occurrence count equals
    * the non-overlapping count a SQL `replace`-length oracle measures —
    * the structural precondition q251's oracle relies on. */
  def isBorderFree(p: String): Boolean = {
    val pi = new Array[Int](p.length)
    var k = 0
    (1 until p.length).foreach { i =>
      while (k > 0 && p.charAt(k) != p.charAt(i)) k = pi(k - 1)
      if (p.charAt(k) == p.charAt(i)) k += 1
      pi(i) = k
    }
    p.length <= 1 || pi(p.length - 1) == 0
  }
}

object NativeExpressions {
  /** Session-free Column form (no registry needed). */
  def withinEd1(a: Column, b: Column): Column =
    ColumnBridge.column(WithinEd1(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def withinEd2(a: Column, b: Column): Column =
    ColumnBridge.column(WithinEd2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2sqF32(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def bpeMerge(tokens: Column, a: Column, b: Column): Column =
    ColumnBridge.column(BpeMergeRound(ColumnBridge.expression(tokens),
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nfc(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  def bloomContains(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomContainsLong(ColumnBridge.expression(key), bloomBytes))

  def wordpiece(word: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    ColumnBridge.column(WordPieceEncode(ColumnBridge.expression(word), vocab, maxPieceLen))

  def acCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AhoCorasickCounts(ColumnBridge.expression(text), patterns))
}

/** SQL-side registration via SparkSessionExtensions — activates
  * `graft_dot_f32(a, b)` in `spark.sql(...)` when the session is built
  * with `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "graft_dot_f32"),
      (exprs: Seq[Expression]) => DotProductF32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_l2sq_f32"),
      new ExpressionInfo(classOf[L2SqF32].getName, "graft_l2sq_f32"),
      (exprs: Seq[Expression]) => L2SqF32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[BpeMergeRound].getName, "graft_bpe_merge"),
      (exprs: Seq[Expression]) => BpeMergeRound(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_within_ed1"),
      new ExpressionInfo(classOf[WithinEd1].getName, "graft_within_ed1"),
      (exprs: Seq[Expression]) => WithinEd1(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_within_ed2"),
      new ExpressionInfo(classOf[WithinEd2].getName, "graft_within_ed2"),
      (exprs: Seq[Expression]) => WithinEd2(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
