package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit wall-time budget gate: pure JSON-comparison logic, no
  * Spark session needed. */
class PlanBudgetSpec extends AnyFunSuite {

  private def write(json: String): String = {
    val f = Files.createTempFile("bench", ".json")
    Files.writeString(f, json)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("flags >2x regressions above the 1 s floor, ignores noise below it") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0,"qb":0.1,"qc":3.0}}""")
    val last = write("""{"sf":"/d/sf0.1","queries":{"qa":4.5,"qb":0.9,"qc":3.2}}""")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(skip.isEmpty && r.size == 1 && r.head.startsWith("qa:"), (skip, r).toString)
  }

  test("newly-erroring query is flagged even though -1 is below the floor") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write("""{"sf":"/d/sf0.1","queries":{"qa":-1}}""")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(skip.isEmpty && r.size == 1 && r.head.contains("ERRORED"), (skip, r).toString)
  }

  test("mismatched scale factors skip the gate, with the reason surfaced") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write("""{"sf":"/d/sf0.001","queries":{"qa":9.0}}""")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(r.isEmpty && skip.exists(_.contains("scale-factor mismatch")), (skip, r).toString)
  }

  test("missing files skip the gate visibly (first round has no baseline)") {
    val (skip, r) =
      PlanAudit.benchBudgetRegressions("/nonexistent/a.json", "/nonexistent/b.json")
    assert(r.isEmpty && skip.exists(_.contains("no committed baseline")), (skip, r).toString)
  }

  test("a SPARK_GRAFT_BENCH_ONLY subset record never gates") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write("""{"sf":"/d/sf0.1","bench_only":"qa|qb","queries":{"qa":9.0}}""")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(r.isEmpty && skip.exists(_.contains("subset run")), (skip, r).toString)
  }

  test("a record stamped with a foreign git HEAD is stale and skips") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write(
      """{"sf":"/d/sf0.1","git_head":"0000000000000000000000000000000000000000","queries":{"qa":9.0}}""")
    val head = PlanAudit.gitHead()
    assume(head.nonEmpty, "not in a resolvable git checkout")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(r.isEmpty && skip.exists(_.contains("stale record")), (skip, r).toString)
  }

  test("a record stamped with the CURRENT HEAD gates normally") {
    val head = PlanAudit.gitHead()
    assume(head.nonEmpty, "not in a resolvable git checkout")
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write(s"""{"sf":"/d/sf0.1","git_head":"$head","queries":{"qa":9.0}}""")
    val (skip, r) = PlanAudit.benchBudgetRegressions(base, last)
    assert(skip.isEmpty && r.size == 1, (skip, r).toString)
  }

  test("gitHead resolves a 40-hex commit for this checkout") {
    val head = PlanAudit.gitHead()
    assert(head.isEmpty || head.matches("[0-9a-f]{40}"), head)
  }
}
