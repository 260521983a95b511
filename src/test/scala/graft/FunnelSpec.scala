package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Funnel

/** Pins for the ordered funnel operator (q150): strict ordering,
  * greedy-earliest frontier, non-increasing stage counts. */
class FunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  private def events(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "ord", "t")
  }

  private def counts(df: DataFrame): Map[Long, Long] =
    Funnel.stageCounts(df, Seq("k"), "ord", "t", stages)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("in-order chain completes; out-of-order stops at the last ordered prefix") {
    val df = events(
      // key 1: full ordered chain
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // key 2: purchase BEFORE click — reaches stage 2 only
      (2L, 1L, "view"), (2L, 2L, "purchase"), (2L, 3L, "click"),
      // key 3: no view at all — reaches nothing
      (3L, 1L, "click"), (3L, 2L, "purchase"))
    assert(counts(df) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("strictly-after: a stage event tied-or-before the frontier does not advance") {
    // click precedes the only view — no stage-2
    val df = events((1L, 5L, "click"), (1L, 9L, "view"))
    assert(counts(df) == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("greedy-earliest frontier: a later re-view cannot orphan an existing chain") {
    // view@1 click@2 view@3 purchase@4 — the chain through the FIRST
    // view completes; the second view must not reset anything
    val df = events((1L, 1L, "view"), (1L, 2L, "click"),
      (1L, 3L, "view"), (1L, 4L, "purchase"))
    assert(counts(df) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val frontiers = Funnel.stageFrontiers(df, Seq("k"), "ord", "t", stages)
    assert(frontiers.head.head().getLong(1) == 1L, "stage-1 frontier is the earliest view")
  }

  test("retention cohorts: staggered joins, churn and re-activation land in the right cells") {
    import spark.implicits._
    // u1 joins wk0, active 0/1/3 (skips 2 — re-activation);
    // u2 joins wk0, active 0 only (churned); u3 joins wk1, active 1/2
    val activity = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 0L),
      (3L, 1L), (3L, 2L)).toDF("user_id", "wk")
    val got = graft.operators.Retention.cohortMatrix(activity)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0) -> 2L, (0L, 1) -> 1L, (0L, 3) -> 1L, // cohort wk0: both at 0, u1 at 1 and 3
      (1L, 0) -> 1L, (1L, 1) -> 1L))               // cohort wk1: u3 alone (u1 belongs to wk0)
    // no cell for (0,2): u1 skipped week 2 and u2 churned — gaps stay gaps
    assert(!got.contains((0L, 2)))
  }

  test("counts are non-increasing across stages on the sf fixture") {
    val out = graft.queries.WindowQueries.q150.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) >= out(2L) && out(2L) >= out(3L))
    assert(out(1L) > 0L, "fixture must exercise the funnel")
  }
}
