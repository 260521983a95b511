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
