package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.CountMin

/** Count-min sketch guarantees, pinned against exact counts on the real
  * corpus (registered rows-only as q77; the exact twin is q69). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = Tables.documents(spark, sf)
    .select(explode(Text.tokens($"text")).as("token"))

  test("CMS never underestimates, overestimate is bounded, and the head is exact") {
    val w = 1024; val d = 4
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val est = CountMin.estimate(CountMin.sketch(toks, "token", w, d),
        toks, "token", w, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"CMS underestimated '$t': $e < ${exact(t)}")
      // ε = e/w ⇒ bound εN; deterministic slack ×4 keeps the test
      // non-flaky while still catching a broken hash family
      assert(e - exact(t) <= 4L * math.ceil(math.E / w * n).toLong,
        s"'$t' overestimate ${e - exact(t)} breaks the εN bound")
    }
    // with this vocabulary/sketch ratio the head of the distribution
    // is exact: the top-1 by estimate IS the top-1 by true count
    val topEst = est.maxBy { case (t, e) => (e, t) }._1
    val topTrue = exact.maxBy { case (t, c) => (c, t) }._1
    assert(topEst === topTrue)
  }

  test("heavy hitters: ranked, deterministic, k-bounded") {
    val hh = CountMin.heavyHitters(toks, "token", toks, k = 5).collect()
    assert(hh.length === 5)
    assert(hh.map(_.getInt(2)).toSeq === (1 to 5))
    val ests = hh.map(_.getLong(1)).toSeq
    assert(ests === ests.sorted.reverse, "estimates must be non-increasing in rank")
  }

  test("sketches are mergeable: merge(sketch(A), sketch(B)) == sketch(A ∪ B)") {
    val a = toks.filter(crc32($"token".cast("binary")) % 2 === 0)
    val b = toks.filter(crc32($"token".cast("binary")) % 2 =!= 0)
    val merged = CountMin.merge(
        CountMin.sketch(a, "token"), CountMin.sketch(b, "token"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.sketch(toks, "token")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole,
      "independent sketches must merge to the whole-corpus sketch exactly")
  }

  test("idempotent foreachBatch: a replayed batch id is not applied twice") {
    import graft.streaming.Events
    Events.InMemoryKV.clear()
    val batch = Seq(("u1", "p1", "page_view")).toDF("user_id", "product_id", "event_type")
    val sink = Events.idempotentServingStateBatch(Events.InMemoryKV, tag = "t1") _
    sink(batch, 7L)
    sink(batch, 7L) // replay after restart: must be skipped
    assert(Events.InMemoryKV.get("user:u1:views") === Seq("p1"))
    sink(batch, 8L) // genuinely new batch: applied
    assert(Events.InMemoryKV.get("user:u1:views") === Seq("p1", "p1"))
  }
}
