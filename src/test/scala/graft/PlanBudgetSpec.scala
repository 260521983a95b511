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
    val r = PlanAudit.benchBudgetRegressions(base, last)
    assert(r.size == 1 && r.head.startsWith("qa:"), r.toString)
  }

  test("newly-erroring query is flagged even though -1 is below the floor") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write("""{"sf":"/d/sf0.1","queries":{"qa":-1}}""")
    val r = PlanAudit.benchBudgetRegressions(base, last)
    assert(r.size == 1 && r.head.contains("ERRORED"), r.toString)
  }

  test("mismatched scale factors are never compared") {
    val base = write("""{"sf":"/d/sf0.1","queries":{"qa":2.0}}""")
    val last = write("""{"sf":"/d/sf0.001","queries":{"qa":9.0}}""")
    assert(PlanAudit.benchBudgetRegressions(base, last).isEmpty)
  }

  test("missing files mean no gate (first round has no baseline)") {
    assert(PlanAudit.benchBudgetRegressions("/nonexistent/a.json", "/nonexistent/b.json").isEmpty)
  }
}
