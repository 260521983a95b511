package graft

import graft.operators.Sessionize

/** Edge semantics of gap sessionization (q29's operator): exact-boundary
  * gaps, single-event keys, and the first-row null lag. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def sessions(gap: Long, rows: (Long, Long, Long)*): Map[Long, Long] = {
    val df = rows.toSeq.toDF("user_id", "event_id", "ts")
    Sessionize.assignSessions(df, "user_id", "event_id", "ts", gap)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
  }

  test("gap at exactly the threshold does NOT break the session (strict >)") {
    val got = sessions(100L,
      (1L, 1L, 1000L),  // first event: null lag opens session 0
      (1L, 2L, 1100L),  // gap == 100 exactly → same session
      (1L, 3L, 1201L),  // gap 101 > 100 → new session
      (1L, 4L, 1301L))  // gap == 100 exactly → stays in session 1
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("single-event users get session 0; keys never bleed into each other") {
    val got = sessions(100L,
      (1L, 1L, 1000L), (1L, 2L, 5000L),
      (2L, 3L, 1000L),            // lone event
      (3L, 4L, 1050L), (3L, 5L, 1060L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("order column (not timestamp) drives the sequence: out-of-order ts still sessions by event_id") {
    // ts regresses at event 3: negative gap is never > gap, so no break
    val got = sessions(100L,
      (1L, 1L, 1000L), (1L, 2L, 2000L), (1L, 3L, 1500L))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }
}
