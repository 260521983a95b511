package graft

import org.apache.spark.sql.functions._

import graft.operators.Als
import graft.streaming.Events

/** [[Als]] — fixed-point implicit ALS, the `recommend:offline:{id}`
  * producer (reference streaming_flow.py:145-147 reads those lists;
  * nothing in the reference writes them). The registered queries
  * q219/q220 put init → rounds → scoring under the DuckDB hash gate;
  * this spec pins what SQL can't: recommendation QUALITY on a
  * structured fixture, and the end-to-end serving seam offline
  * factors → KV store → U1 rerank.
  */
class AlsSpec extends SparkSpec {
  import spark.implicits._

  /** Two disjoint taste cliques (B's catalog is 10 items so a 10-deep
    * rec list exists). User 1 is missing exactly one of its clique's
    * items (item 3); collaborative filtering must surface it ahead of
    * every cross-clique item. */
  private def cliqueRatings = {
    val groupA = for { u <- 1L to 5L; i <- 1L to 4L
                       if !(u == 1L && i == 3L) } yield (u, i, 3L)
    val groupB = for { u <- 6L to 10L; i <- 11L to 20L } yield (u, i, 3L)
    (groupA ++ groupB).toDF("user", "item", "cnt")
  }

  test("ALS surfaces the held-out within-clique item ahead of every cross-clique item") {
    val (userF, itemF) = Als.implicitAls(cliqueRatings, rounds = 3)
    // user 1 is the only user with an UNSEEN within-clique item (the
    // others saturate their clique, so their candidates are all
    // cross-clique by construction) — its list is the quality pin
    val recs = Als.recommend(userF, itemF, cliqueRatings.select("user", "item"),
      userF.filter(col("id") === 1L).select(col("id")), k = 11)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    assert(recs.head._3 === 3L, s"user 1 got ${recs.toSeq}")
    val heldOutScore = recs.head._4
    recs.tail.foreach { case (_, _, item, score) =>
      assert(item >= 11L && score < heldOutScore,
        s"cross-clique item $item scored $score ≥ held-out $heldOutScore")
    }
  }

  test("factors stay on the fixed-point grid, clamped, and replay identically") {
    val (_, itemF1) = Als.implicitAls(cliqueRatings, rounds = 3)
    val (_, itemF2) = Als.implicitAls(cliqueRatings, rounds = 3)
    // bit-identical across runs (integer sums are associative — the
    // distributed fold order cannot matter)
    assert(itemF1.exceptAll(itemF2).isEmpty && itemF2.exceptAll(itemF1).isEmpty)
    val bad = itemF1.filter(abs(col("f0")) > 8 * Als.S || abs(col("f1")) > 8 * Als.S)
    assert(bad.isEmpty, "factor escaped the clamp")
  }

  test("end-to-end: offline ALS lists land in the KV store and fill the U1 rerank tail") {
    val (userF, itemF) = Als.implicitAls(cliqueRatings, rounds = 3)
    val recs = Als.recommend(userF, itemF, cliqueRatings.select("user", "item"),
      userF.filter(col("id") === 1L).select(col("id")), k = 10)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    // the reference's offline seam: LPUSH newest-first under
    // recommend:offline:{id} — push in REVERSE rank order so the list
    // reads rank-1 first, exactly how streaming_flow.py consumes it
    Events.InMemoryKV.clear()
    recs.reverse.foreach { case (u, _, item, _) =>
      Events.InMemoryKV.push(s"recommend:offline:$u", item.toString, keep = 10)
    }
    val offline = Events.InMemoryKV.get("recommend:offline:1")
    assert(offline.head === recs.head._3.toString)
    // U1 rerank: cart > views > offline, order-preserving dedup, top-10.
    // With one cart and one view item, the remaining 8 slots come from
    // the offline ALS list in rank order.
    val out = Events.rerank(offline = offline, views = Seq("14"), cart = Seq("11"))
    assert(out.take(2) === Seq("11", "14"))
    assert(out.size === 10)
    assert(out.drop(2) === offline.filterNot(Seq("11", "14").contains).take(8))
  }
}
