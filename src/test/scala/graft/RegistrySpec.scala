package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry contract checks — the cheap tripwire for the failure
  * class round 8 hit (a driver testdata regeneration changed a column's
  * physical type and six queries failed ANALYSIS, discovered only at
  * verify time). Forcing every registered query's plan through analysis
  * against the live fixture schemas surfaces that in `sbt test`.
  */
class RegistrySpec extends SparkSpec {

  test("every registered query resolves and analyzes against the current fixture schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try { fn(spark, sf).schema; None }
      catch { case e: Throwable =>
        Some(s"$n: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next().take(160)}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("oracle registry is consistent with the query registry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: $orphans")
  }

  test("the driver smoke contract holds: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
