package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins._

/** Scale-checklist audit: one line per registered query summarizing the
  * physical-plan properties that matter at 100 TB —
  *
  *   shuffles   #ShuffleExchange nodes (each is a full network pass)
  *   bhj/smj    broadcast vs sort-merge join counts (small dims should
  *              broadcast; an SMJ against a 25-row dim is a lost plan)
  *   nlj        BroadcastNestedLoop/Cartesian count (quadratic — only
  *              acceptable when one side is provably tiny, e.g. a
  *              scalar subquery or a ≤100-row pair block)
  *   scan cols  per-scan ReadSchema width (pruning check: a 2-column
  *              projection reading 16 columns is a failed prune)
  *   nofilter   scans with a Filter parent but zero pushed filters
  *   wsc        WholeStageCodegen span count (fewer, wider spans = more
  *              of the query runs fused)
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sb = new StringBuilder
    sb.append(f"${"query"}%-28s shuffles bhj smj nlj wsc  scans (cols, pushed)\n")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // Audit the POST-AQE plan: finalPhysicalPlan materializes the
        // query stages, so the walk sees the exchanges, runtime join
        // demotions and per-stage codegen that actually ran (the AQE
        // inputPlan has no exchanges yet — EnsureRequirements runs at
        // stage creation — and would report 0 shuffles for everything).
        def walk(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.finalPhysicalPlan)
          case q: adaptive.QueryStageExec => q +: walk(q.plan)
          case r: ReusedSubqueryExec => r +: walk(r.child)
          case other => other +: (other.children ++ other.subqueries).flatMap(walk)
        }
        val nodes = walk(df.queryExecution.executedPlan)
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
        val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
        val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
        val nlj = nodes.count(p => p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
          p.isInstanceOf[CartesianProductExec])
        val wsc = nodes.count(_.isInstanceOf[WholeStageCodegenExec])
        val scans = nodes.collect { case s: FileSourceScanExec =>
          val pushed = s.metadata.get("PushedFilters").exists(_ != "[]")
          s"${s.requiredSchema.size}c${if (pushed) "+f" else ""}"
        }
        sb.append(f"$n%-28s $shuffles%8d $bhj%3d $smj%3d $nlj%3d $wsc%3d  ${scans.mkString(" ")}\n")
      } catch { case e: Throwable => sb.append(f"$n%-28s FAILED: ${e.getMessage.take(80)}\n") }
    }
    sys.env.get("GRAFT_EXPLAIN_OUT") match {
      case Some(f) => java.nio.file.Files.writeString(java.nio.file.Paths.get(f), sb.toString)
      case None => println(sb.toString)
    }
    spark.stop()
  }
}
