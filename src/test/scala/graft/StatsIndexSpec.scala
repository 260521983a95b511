package graft

import org.apache.spark.sql.functions._

import graft.functions.{Kmv, StatsIndex}
import graft.pipeline.AtomicTable

/** [[StatsIndex]] — the persisted ANALYZE tier. The q224 oracle gates
  * served-vs-recompute end to end at sf0.01; this spec pins the
  * maintenance invariants on the standard fixture: lossless sketch
  * merge, exact counters, replay idempotence, version history. */
class StatsIndexSpec extends SparkSpec {

  test("build+addBatch ≡ one-shot build (lossless merge), counters exact, replay guarded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statsidx_").toString
    val o = Tables.orders(spark, sf)
    val k = 64
    StatsIndex.build(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 5 =!= 0)), dir, k)
    StatsIndex.addBatch(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 5 === 0)), dir, k,
      batchId = 0L)
    // the committed sketch is byte-identical to a from-scratch build
    // over the full table: bottom-k is lossless under merge
    val oneShot = Kmv.groupSketch(
      StatsIndex.stackedOrders(o).filter(col("v").isNotNull)
        .select(col("c"), Kmv.h40(col("v")).as("g_h40")), "c", "g_h40", k)
    val standing = AtomicTable.read(spark, s"$dir/sketches")
    assert(standing.exceptAll(oneShot).isEmpty && oneShot.exceptAll(standing).isEmpty)
    // counters: exact row/null totals for the whole table
    val served = StatsIndex.serve(spark, dir, k)
    val total = o.count()
    assert(served.select("n_rows").distinct().collect().map(_.getLong(0)).toSet
      === Set(total), "every profiled column counts every order row")
    // re-delivering the same batch id is a no-op for the counters
    // (and a fixed point for the sketch) — versions don't double-add
    StatsIndex.addBatch(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 5 === 0)), dir, k,
      batchId = 0L)
    val served2 = StatsIndex.serve(spark, dir, k)
    assert(served2.exceptAll(served).isEmpty && served.exceptAll(served2).isEmpty)
    // the artifact carries history: base version + 1 arrival per table
    assert(AtomicTable.versions(spark, s"$dir/sketches").size === 2)
    assert(AtomicTable.versions(spark, s"$dir/counters").size === 2)
  }

  test("a SECOND arrival keeps folding (batch watermark advances); estimates saturate sanely") {
    val dir = java.nio.file.Files.createTempDirectory("graft_statsidx2_").toString
    val o = Tables.orders(spark, sf)
    val k = 64
    StatsIndex.build(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 3 === 0)), dir, k)
    StatsIndex.addBatch(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 3 === 1)), dir, k, 0L)
    StatsIndex.addBatch(
      StatsIndex.stackedOrders(o.filter(col("o_orderkey") % 3 === 2)), dir, k, 1L)
    val served = StatsIndex.serve(spark, dir, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // o_orderstatus has < k distinct values -> the sketch is the set
    // and the "estimate" is exact
    val exactStatus = o.select(countDistinct(col("o_orderstatus"))).first().getLong(0)
    assert(served("o_orderstatus") === exactStatus)
    // o_custkey saturates the sketch -> Beyer estimate within 2x
    val exactCust = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    assert(served("o_custkey") > exactCust / 2 && served("o_custkey") < exactCust * 2,
      s"ndv_est ${served("o_custkey")} vs exact $exactCust")
  }
}
