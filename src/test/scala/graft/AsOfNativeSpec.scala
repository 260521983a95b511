package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinNative
import graft.operators.Relational

/** The native AsOfJoinExec (LogicalPlan + Strategy + SparkPlan through
  * SparkSessionExtensions) against the composed union+window form —
  * which is itself oracled against DuckDB's native ASOF JOIN in q48. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native exec semantics on handcrafted edges (ties, equal-t, no-match)") {
    val quotes = Seq(("A", 10L, 100L), ("A", 20L, 200L), ("A", 30L, 300L), ("B", 15L, 150L))
      .toDF("k", "t", "px")
    val trades = Seq(("A", 25L, 1L), ("A", 20L, 2L), ("A", 5L, 3L), ("B", 99L, 4L), ("C", 50L, 5L))
      .toDF("k", "t", "id")
    val got = AsOfJoinNative(trades, "t", quotes, "t", "k", Seq("px"))
      .select("id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 200L, 2L -> 200L, 3L -> -1L, 4L -> 150L, 5L -> -1L))
  }

  test("self-join shape: both sides from one base plan (shared exprIds) bind and match") {
    val base = Seq(("A", 10L, 100L, "dim"), ("A", 25L, 1L, "fact"),
      ("A", 20L, 200L, "dim"), ("B", 5L, 2L, "fact"))
      .toDF("k", "t", "v", "side")
    val facts = base.filter(col("side") === "fact").select("k", "t", "v")
    val dims = base.filter(col("side") === "dim")
      .select(col("k"), col("t"), col("v").as("px"))
    val got = AsOfJoinNative(facts, "t", dims, "t", "k", Seq("px"))
      .select("v", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 200L, 2L -> -1L))
  }

  test("null keys/times/payloads: no crash, native ≡ composed, nulls never match") {
    def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val quotes = Seq[(String, java.lang.Long, java.lang.Long)](
      ("A", L(10), L(100)), ("A", L(20), null), // genuinely-null payload row
      (null, L(5), L(999)),                     // null key: never a match
      ("B", null, L(888)),                      // null time: never a match
      ("B", L(15), L(150)))
      .toDF("k", "t", "px")
    val trades = Seq[(String, java.lang.Long, Long)](
      ("A", L(25), 1L),   // matches the t=20 quote whose px IS null
      ("A", L(12), 2L),   // matches t=10 -> 100
      (null, L(50), 3L),  // null key left: null payload
      ("B", null, 4L),    // null time left: null payload
      ("B", L(99), 5L))   // matches t=15 -> 150 (never the null-t 888)
      .toDF("k", "t", "id")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "px").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val want = Map(1L -> -1L, 2L -> 100L, 3L -> -1L, 4L -> -1L, 5L -> 150L)
    assert(collect(AsOfJoinNative(trades, "t", quotes, "t", "k", Seq("px"))) === want)
    assert(collect(Relational.asOfJoin(trades, "t", quotes, "t", "k", Seq("px"))) === want)
  }

  test("native exec ≡ composed form on the full events/orders tables") {
    val d = "/root/testdata/sf0.01"
    val l = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t"))
    val r = Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t"))
      .agg(max(col("o_orderkey")).as("matched_orderkey"))
    val native = AsOfJoinNative(l, "t", r, "t", "user_id", Seq("matched_orderkey"))
      .select("event_id", "user_id", "matched_orderkey")
    val composed = Relational.asOfJoin(l, "t", r, "t", "user_id", Seq("matched_orderkey"))
      .select("event_id", "user_id", "matched_orderkey")
    assert(native.count() === 10000)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    // and the physical plan really is the custom operator (string check:
    // plan.exists does not traverse into the AQE wrapper)
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }
}
