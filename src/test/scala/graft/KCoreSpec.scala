package graft

import org.apache.spark.sql.functions._
import graft.operators.KCore

/** Bounded k-core peeling semantics on crafted graphs where the true
  * fixed point is known: cascade removal (a vertex that WAS degree-k
  * loses a neighbor and must fall in a later round), a clique that
  * must survive untouched, and the round budget binding early. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("x", "y")

  test("cascade: pendant chain peels over successive rounds; the triangle core survives") {
    // triangle 1-2-3 (the 2-core) with a chain 3-4-5 hanging off it
    val e = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    // round 1 drops 5 (deg 1) and 4? no: 4 has deg 2 until 5 goes -> cascade
    val got = KCore.peel(e, "x", "y", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("round budget binds: one round keeps the not-yet-cascaded vertex") {
    val e = undirected((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val oneRound = KCore.peel(e, "x", "y", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // only the degree filter has run once: 4 still shows its pre-peel degree
    assert(oneRound === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
  }

  test("k above max degree empties; k=1 keeps every non-isolated vertex") {
    val e = undirected((1L, 2L), (2L, 3L))
    assert(KCore.peel(e, "x", "y", k = 5, rounds = 2).isEmpty)
    val all1 = KCore.peel(e, "x", "y", k = 1, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(all1 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
