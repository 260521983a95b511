package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall-clock seconds.
  *
  * The action is a `noop`-format write: every output column is fully
  * computed and serialized into the sink's row iterator, but nothing
  * hits disk. A bare `count()` would let Catalyst's ColumnPruning drop
  * every deterministic projection — for map-only queries that "bench"
  * would time a parquet row count, not the expressions under test.
  *
  * A query that throws is recorded as -1 (a timing can never be
  * negative, so failures are unmistakable in the emitted JSON) and
  * listed in an `errors` field.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    // warm-up: trigger codegen + parquet footer reads once, unmeasured
    try SparkEntry.queries.get("q02_monthly_sales")
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nErrors = results.count(_._2 < 0)
    // n_errors travels next to the total so a round-over-round total
    // comparison can't silently absorb a newly failing (excluded) query
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"n_errors":$nErrors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
