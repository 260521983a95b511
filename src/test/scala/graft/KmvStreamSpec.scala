package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Kmv
import graft.pipeline.AtomicTable
import graft.streaming.Events

/** Per-group KMV sketch invariants behind q208 and the streaming
  * sketch maintenance: the salted two-phase bottom-k is identical to
  * the brute per-group definition, bottom-k is mergeable (standing ∪
  * arriving re-sketch ≡ one-shot — the property that makes
  * [[Events.kmvSketchMaintainBatch]] an incremental update), and the
  * committed sketch table is idempotent under foreachBatch replay. */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  // crafted hash table: group a has 40 distinct values (saturates any
  // small k, exercises both salt buckets), b has 3 (stays unsaturated),
  // plus literal duplicate rows the distinct must fold
  private val rows: Seq[(String, Long)] =
    (1 to 40).map(i => ("a", (i * 37 % 100).toLong)) ++
      Seq(("a", 37L), ("a", 74L)) ++
      (1 to 3).map(i => ("b", i * 5L))

  private def brute(k: Int): Set[(String, Long)] =
    rows.distinct.groupBy(_._1).iterator.flatMap { case (g, vs) =>
      vs.map(_._2).distinct.sorted.take(k).map(g -> _)
    }.toSet

  test("groupSketch: salted two-phase ≡ brute per-group bottom-k; unsaturated group = whole set") {
    val df = rows.toDF("g", "h")
    for (k <- Seq(1, 4, 64); salts <- Seq(1, 2, 7)) {
      val got = Kmv.groupSketch(df, "g", "h", k, salts)
        .as[(String, Long)].collect().toSet
      assert(got === brute(k), s"k=$k salts=$salts")
    }
  }

  test("groupSketch: mergeable — re-sketch of (sketch(part1) ∪ part2) ≡ one-shot sketch") {
    val (p1, p2) = rows.splitAt(20)
    val k = 4
    val standing = Kmv.groupSketch(p1.toDF("g", "h"), "g", "h", k)
    val merged = Kmv.groupSketch(
      standing.unionByName(p2.toDF("g", "h")), "g", "h", k)
      .as[(String, Long)].collect().toSet
    val oneShot = Kmv.groupSketch(rows.toDF("g", "h"), "g", "h", k)
      .as[(String, Long)].collect().toSet
    assert(merged === oneShot)
  }

  test("streaming sketch maintenance: per-batch fold ≡ one-shot, replay idempotent, versioned") {
    val dir = Files.createTempDirectory("graft_kmv_stream_").toString
    val k = 2
    val b0 = Seq(("view", 1L), ("view", 2L), ("buy", 9L)).toDF("etype", "user")
    val b1 = Seq(("view", 3L), ("buy", 9L)).toDF("etype", "user")
    Events.kmvSketchMaintainBatch(dir, "etype", "user", k)(b0, 0L)
    Events.kmvSketchMaintainBatch(dir, "etype", "user", k)(b1, 1L)
    def current: Set[(String, Long)] =
      AtomicTable.read(spark, dir).as[(String, Long)].collect().toSet
    val oneShot = Kmv.groupSketch(
      b0.unionAll(b1).select(col("etype"),
        Kmv.h40(col("user").cast("string")).as("g_h40")),
      "etype", "g_h40", k).as[(String, Long)].collect().toSet
    assert(current === oneShot)
    // checkpoint-recovery replay of the last batch: a fixed point, no
    // marker needed — the committed membership is unchanged
    Events.kmvSketchMaintainBatch(dir, "etype", "user", k)(b1, 1L)
    assert(current === oneShot)
    // one committed version per applied batch: estimate-as-of time travel
    assert(AtomicTable.versions(spark, dir).size >= 3)
    // estimates served from the standing table: 'buy' is unsaturated
    // (1 distinct user < k) so its estimate IS the exact count
    val est = Kmv.groupEstimates(AtomicTable.read(spark, dir),
      "etype", "g_h40", k)
      .as[(String, Long)].collect().toMap
    assert(est("buy") === 1L)
    assert(est.contains("view"))
  }
}
