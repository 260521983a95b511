package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.streaming.Events
import graft.functions.Multimodal

/** ScalaCheck property suites over the pure-function surface
  * (SURVEY §5.2): rerank laws and the stub decoder contract. Run by
  * sbt's built-in ScalaCheck framework alongside the ScalaTest suites.
  */
object RerankProps extends Properties("rerank") {
  private val ids = Gen.listOf(Gen.oneOf((1 to 30).map("p" + _)))

  property("duplicate-free and capped at 10") = Prop.forAll(ids, ids, ids) { (o, v, c) =>
    val r = Events.rerank(o, v, c)
    r.distinct == r && r.lengthCompare(10) <= 0
  }

  property("outputs come only from the inputs") = Prop.forAll(ids, ids, ids) { (o, v, c) =>
    val all = (o ++ v ++ c).toSet
    Events.rerank(o, v, c).forall(all.contains)
  }

  property("cart is a prefix, in order") = Prop.forAll(ids, ids, ids) { (o, v, c) =>
    val r = Events.rerank(o, v, c)
    r.take(c.distinct.take(10).size) == c.distinct.take(10)
  }

  property("priority: a cart item never ranks below a views-only item") =
    Prop.forAll(ids, ids, ids) { (o, v, c) =>
      val r = Events.rerank(o, v, c)
      val cartSet = c.toSet
      val (cartPos, otherPos) = r.zipWithIndex.partition { case (x, _) => cartSet.contains(x) }
      cartPos.isEmpty || otherPos.isEmpty ||
        cartPos.map(_._2).max < otherPos.map(_._2).min
    }

  property("idempotent: reranking the result changes nothing") =
    Prop.forAll(ids, ids, ids) { (o, v, c) =>
      val r = Events.rerank(o, v, c)
      Events.rerank(Nil, Nil, r.toList) == r
    }
}

object DecoderProps extends Properties("stub-decoder") {
  private val payloads = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("deterministic") = Prop.forAll(payloads) { p =>
    Multimodal.StubDecoder.decode(p) == Multimodal.StubDecoder.decode(p)
  }

  property("features in declared ranges") = Prop.forAll(payloads) { p =>
    val (w, h, _) = Multimodal.StubDecoder.decode(p)
    w >= 1 && w <= 640 && h >= 1 && h <= 480
  }
}

/** The q133 anomaly gate replaces the float z-score with the exact
  * integer inequality (c·n − s)² > T²·(n·q − s²). This pins the
  * ALGEBRA: on random integer windows the integer test agrees with the
  * double z-score everywhere the float comparison is numerically
  * unambiguous (away from the |z| = T boundary by more than float
  * error), and NEVER disagrees in the direction that would let float
  * rounding flip a flag. */
object AnomalyAlgebraProps extends Properties("anomaly-algebra") {
  private val windows = for {
    n <- Gen.choose(2, 48)
    xs <- Gen.listOfN(n, Gen.choose(0L, 100000L))
    c <- Gen.choose(0L, 200000L)
  } yield (xs, c)

  property("integer test == float z-test away from the boundary") =
    Prop.forAll(windows) { case (xs, c) =>
      val n = xs.length.toLong
      val s = xs.sum
      val q = xs.map(x => x * x).sum
      val lhs = (c * n - s) * (c * n - s)
      val rhs = 9L * (q * n - s * s)
      val intFlag = lhs > rhs
      val mean = s.toDouble / n
      val variance = (q.toDouble / n) - mean * mean
      if (variance <= 0) {
        // constant window: any deviation is infinite z — flag iff c != mean
        intFlag == (c.toDouble != mean)
      } else {
        val z2 = (c - mean) * (c - mean) / variance
        // compare only when the float value is clearly on one side —
        // AT the boundary the integer form is the ground truth
        math.abs(z2 - 9.0) < 1e-6 * math.max(1.0, z2) || intFlag == (z2 > 9.0)
      }
    }
}

/** phraseSearch's join algebra vs an independent sliding-window
  * reference over random small-vocabulary token sequences. Pure-
  * function check of the position arithmetic (the Spark plan itself is
  * pinned in RetrievalSpec); this guards the i-offset convention. */
object PhraseProps extends Properties("phrase-positions") {
  private val token = Gen.oneOf("a", "b", "c")
  private val doc = Gen.listOf(token)
  private val phrase = Gen.choose(1, 3).flatMap(Gen.listOfN(_, token))

  private def referenceHits(words: List[String], p: List[String]): Set[Int] =
    if (p.isEmpty || words.lengthCompare(p.length) < 0) Set.empty
    else words.sliding(p.length).zipWithIndex
      .collect { case (w, i) if w == p => i }.toSet

  property("anchor+offset intersection == sliding-window reference") =
    Prop.forAll(doc, phrase) { (words, p) =>
      // re-derive the operator's algebra without Spark: anchor at the
      // first term's positions, each later term shifts back by i
      val postings = words.zipWithIndex.groupMap(_._1)(_._2)
      val anchors = postings.getOrElse(p.head, Nil).toSet
      val hits = p.zipWithIndex.drop(1).foldLeft(anchors) { case (acc, (w, i)) =>
        acc & postings.getOrElse(w, Nil).map(_ - i).toSet
      }.filter(start => start + p.length <= words.length)
      hits == referenceHits(words, p)
    }
}

/** The q143 two-proportion drift inequality vs the float pooled z²:
  * (c₁n₂ − c₂n₁)²·N > T²·c·(N−c)·n₁n₂ must agree with the textbook
  * z² > T² wherever the float value is numerically unambiguous —
  * the same contract [[AnomalyAlgebraProps]] pins for the windowed
  * z-test. Degenerate pools (c = 0 or c = N: zero pooled variance)
  * must never flag. */
object DriftAlgebraProps extends Properties("drift-algebra") {
  private val cells = for {
    n1 <- Gen.choose(1L, 5000L)
    n2 <- Gen.choose(1L, 5000L)
    c1 <- Gen.choose(0L, n1)
    c2 <- Gen.choose(0L, n2)
  } yield (c1, n1, c2, n2)

  property("integer inequality == float pooled z-test away from the boundary") =
    Prop.forAll(cells) { case (c1, n1, c2, n2) =>
      val nTot = n1 + n2
      val c = c1 + c2
      val diff = c1 * n2 - c2 * n1
      val intFlag = diff * diff * nTot > 9L * c * (nTot - c) * n1 * n2
      if (c == 0 || c == nTot) !intFlag // zero pooled variance: no evidence
      else {
        val p = c.toDouble / nTot
        val z2 = {
          val num = c1.toDouble / n1 - c2.toDouble / n2
          num * num / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
        }
        math.abs(z2 - 9.0) < 1e-6 * math.max(1.0, z2) || intFlag == (z2 > 9.0)
      }
    }

  property("rrf rational fold == BigInt fraction arithmetic") =
    Prop.forAll(Gen.listOf(Gen.choose(1, 100))) { ranks =>
      // the same left fold Retrieval.rrfFuse builds as Columns,
      // re-derived in exact BigInt arithmetic: n/d after folding list i
      // must equal Σ 1/(60+rᵢ) as a fraction
      val (n, d) = ranks.foldLeft((0L, 1L)) { case ((n, d), r) =>
        (n * (60L + r) + d, d * (60L + r))
      }
      val lhs = BigInt(n) * ranks.map(r => BigInt(60 + r)).product
      val rhs = BigInt(d) * ranks.map(r =>
        ranks.map(x => BigInt(60 + x)).product / BigInt(60 + r)).sum
      ranks.lengthCompare(8) > 0 || lhs == rhs
    }
}
