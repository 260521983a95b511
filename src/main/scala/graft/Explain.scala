package graft

/** Plan-inspection main: dumps the formatted physical plan of each
  * registered query (or the ones named in args) so pushdown, pruning,
  * join strategy and codegen spans can be reviewed — the per-operator
  * scale checklist from the build contract.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  * Set GRAFT_EXPLAIN_OUT=<file> to write plans to a file instead of
  * stdout (sbt's shell does no redirection).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sb = new StringBuilder
    names.foreach { n =>
      sb.append(s"\n======== $n ========\n")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)).append("\n")
      } catch { case e: Throwable => sb.append(s"explain failed: ${e.getMessage}\n") }
    }
    sys.env.get("GRAFT_EXPLAIN_OUT") match {
      case Some(f) => java.nio.file.Files.writeString(java.nio.file.Paths.get(f), sb.toString)
      case None => println(sb.toString)
    }
    spark.stop()
  }
}
