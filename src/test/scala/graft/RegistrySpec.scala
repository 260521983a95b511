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

  test("every registered query's output schema is driver-canonicalizable (atomic columns only)") {
    // r10 failure class #2: the driver's pandas canonicalizer sorts all
    // columns to hash the result, and an array/map/struct column crashes
    // sort_values ("unhashable type") before even a rows-only
    // disposition is recorded (q122_pca_project, round 10). Explode or
    // concat such outputs in the REGISTERED entry; keep rich types in
    // the operator API.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      try fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$n.${f.name}: ${f.dataType.simpleString}"
      } catch { case _: Throwable => Nil } // analysis failures are the first test's business
    }
    assert(offenders.isEmpty,
      s"\nnon-atomic output columns (driver canonicalizer would crash):\n${offenders.mkString("\n")}")
  }

  test("no registered query leaves a persisted RDD behind (the r11 SuffixDedup leak class)") {
    // r11 failure class: an operator persisted its final frame and
    // returned it to a registered query, which has no unpersist hook —
    // the cache block squats executor memory for the rest of a
    // 160-query Verify session (round 10 measured 1.7× bench inflation
    // from exactly this accretion). `persist()` registers in
    // `getPersistentRDDs` at MARK time, before any action, so plan
    // construction alone (which also runs any operator-internal eager
    // stages, e.g. the prefix-doubling loop) is enough to surface it.
    // `Dataset.persist` registers in getPersistentRDDs only once an
    // ACTION materializes the cache, so each query is materialized
    // (noop write — the Bench action) before probing, or lazy cache
    // marks (e.g. an LSH index persisted inside a returned plan) slip
    // through and accrete in the real 164-query Verify session.
    val sc = spark.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // negative control: the probe itself must see a deliberate leak
    val leak = spark.range(3).toDF("x").persist()
    leak.count()
    assert(sc.getPersistentRDDs.nonEmpty,
      "fixture: a persisted frame must register in getPersistentRDDs")
    leak.unpersist(blocking = true)
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.isEmpty, "fixture: unpersist must deregister")
    val leakers = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (n, fn) =>
      val hit =
        try {
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          if (sc.getPersistentRDDs.nonEmpty) Some(n) else None
        }
        catch { case _: Throwable => None } // analysis failures are the first test's business
      if (hit.isDefined) { // reset so one leaker doesn't get blamed on the rest
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
      hit
    }
    assert(leakers.isEmpty,
      s"\nqueries leaving persisted RDDs behind (no unpersist hook exists downstream):\n${leakers.mkString("\n")}")
  }

  test("oracle SQL lint: no uncast SUM reaches a final SELECT (DuckDB HUGEINT seam)") {
    val violations = OracleLint.checkRegistry()
    assert(violations.isEmpty, s"\n${violations.mkString("\n")}")
  }

  test("oracle SQL lint catches the r10 q126 shape (deliberately-uncast fixtures)") {
    // direct: uncast windowed SUM emitted by the final SELECT
    assert(OracleLint.check("fix1",
      "SELECT a, SUM(n) OVER (PARTITION BY a ORDER BY b) AS c FROM t").nonEmpty)
    // alias: uncast SUM in a CTE, alias emitted bare by the final SELECT
    assert(OracleLint.check("fix2",
      """WITH c AS (SELECT a, SUM(n) OVER (PARTITION BY a ORDER BY b) AS cum FROM t)
        |SELECT a, cum FROM c WHERE cum <= 10""".stripMargin).nonEmpty)
    // plain GROUP BY SUM, same seam
    assert(OracleLint.check("fix3",
      "SELECT a, SUM(n) AS s FROM t GROUP BY 1").nonEmpty)
    // and the repo convention passes: cast at site...
    assert(OracleLint.check("ok1",
      "SELECT a, CAST(SUM(n) AS BIGINT) AS s FROM t GROUP BY 1").isEmpty)
    // ...or cast at emission (the r11 q126 fix)
    assert(OracleLint.check("ok2",
      """WITH c AS (SELECT a, SUM(n) OVER (ORDER BY b) AS cum FROM t)
        |SELECT a, CAST(cum AS BIGINT) AS cum FROM c WHERE cum <= 10""".stripMargin).isEmpty)
    // internal-only SUM (comparison operand, never emitted) stays legal
    assert(OracleLint.check("ok3",
      """WITH c AS (SELECT a, SUM(n) AS s FROM t GROUP BY 1)
        |SELECT a FROM c WHERE s > 5""".stripMargin).isEmpty)
  }

  test("oracle registry is consistent with the query registry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: $orphans")
  }

  test("the driver smoke contract holds: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
