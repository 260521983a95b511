package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the final stage of a dedup pipeline: near-dup PAIRS (from LSH /
  * SimHash / exact Jaccard) become CLUSTERS, and each cluster keeps one
  * canonical document (the minimum id, which is exactly the component
  * label this algorithm converges to).
  *
  * Shape per iteration: one equi-join (labels ⋈ edges on the source
  * vertex) + one min-aggregate over the destination vertex — both plain
  * shuffles on vertex ids, partial-aggregated map-side. No collect of
  * edges or labels to the driver; the only driver-side values are one
  * scalar sum per iteration (the convergence probe).
  *
  * Iteration count is bounded by the graph's diameter (each pass moves
  * the component minimum one hop). Near-dup clusters are shallow —
  * template families, mirrors, boilerplate — so a few passes converge.
  * For adversarial long-chain graphs at 100 TB the right upgrade is
  * star-contraction (large-star/small-star, Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14), which converges in
  * O(log n) rounds at the cost of rewriting edges each round; label
  * propagation is the better trade for the shallow graphs dedup emits.
  *
  * `localCheckpoint` after each pass truncates the lineage (the loop
  * would otherwise stack 2·iters shuffle stages into one plan and
  * re-execute prior rounds on every action); on a real cluster with a
  * checkpoint dir configured, reliable `checkpoint` is the durable
  * equivalent.
  */
object Components {

  /** Connected components of the undirected graph (`edges`, `vertices`).
    *
    * @param edges    two-column DataFrame of undirected edges (a, b)
    * @param vertices one-column DataFrame of ALL vertex ids (isolated
    *                 vertices label themselves)
    * @return (v, component) — component = min vertex id reachable
    */
  /** Free the storage blocks of a `localCheckpoint`'ed DataFrame.
    * `Dataset.unpersist` only drops CacheManager entries; localCheckpoint
    * persists the underlying RDD directly, so without this each
    * iteration's MEMORY_AND_DISK blocks would accumulate until the
    * ContextCleaner got around to them — a leak proportional to
    * iteration count on large graphs. The checkpointed plan is a single
    * `LogicalRDD` holding exactly that RDD. */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  def connectedComponents(edges: DataFrame, vertices: DataFrame,
                          maxIters: Int = 100): DataFrame = {
    val Seq(ea, eb) = edges.columns.toSeq.map(col)
    val v = col(vertices.columns.head)
    val sym = edges.select(ea.as("s"), eb.as("d"))
      .union(edges.select(eb.as("s"), ea.as("d")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(v.as("v"), v.cast("long").as("label"))
      .localCheckpoint()
    // sum(label) is strictly decreasing until the fixpoint: cheap,
    // deterministic convergence probe (decimal: no long overflow on
    // wide id spaces, no double rounding)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(DecimalType(38, 0)))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val neighborMin = sym
        .join(labels.select(col("v").as("s"), col("label")), Seq("s"))
        .groupBy(col("d").as("v")).agg(min("label").as("nlabel"))
      val next = labels.join(neighborMin, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      dropCheckpoint(labels)
      labels = next
      it += 1
    }
    sym.unpersist()
    labels.select(col("v"), col("label").as("component"))
  }
}
