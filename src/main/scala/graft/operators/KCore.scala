package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TempDirs.spillParquet

/** Bounded k-core peeling (Seidman 1983; the distributed round shape of
  * Montresor et al. 2013): repeatedly drop vertices of degree < k, with
  * a FIXED round budget instead of running to the fixed point — the
  * same staged, replayable discipline as [[Sssp]] (the oracle unrolls
  * the identical rounds; an unbounded loop would make the answer
  * depend on convergence detection, which is exactly the part two
  * engines disagree about first). Each round is one degree aggregate
  * (map-side combined on the vertex key) plus two semi-joins that keep
  * only edges whose BOTH endpoints survive; every round's edge set is
  * staged to parquet so the plan stays round-deep, not
  * round-exponential. At 100 TB the k-core is the standard densest-
  * region prefilter before anything quadratic (clique-ish mining,
  * embedding training on graph neighborhoods): each round strictly
  * shrinks the edge set, so the expensive rounds are the first ones
  * and the tail rounds run on the dense remnant only. Callers that
  * need the true fixed point raise `rounds` until a round removes
  * nothing — the returned degrees make that check one aggregate.
  */
object KCore {

  /** Surviving (vertex, deg) after `rounds` peels at threshold `k`.
    * `edges` must carry BOTH directions of every undirected edge (the
    * [[Sssp]]/[[Bfs]] convention); the returned `deg` is the vertex's
    * degree within the final peeled edge set, ≥ k for every row. */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core threshold must be >= 1, got $k")
    require(rounds >= 1, s"round budget must be >= 1, got $rounds")
    var e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
    var deg: DataFrame = null
    for (r <- 1 to rounds) {
      deg = e.groupBy(col("x").as("v")).agg(count(lit(1)).as("deg"))
      if (r < rounds) {
        val alive = deg.filter(col("deg") >= k).select("v")
        e = spillParquet(
          e.join(alive.withColumnRenamed("v", "x"), Seq("x"), "left_semi")
            .join(alive.withColumnRenamed("v", "y"), Seq("y"), "left_semi")
            .select("x", "y"),
          s"graft_kcore_r${r}_")
      }
    }
    deg.filter(col("deg") >= k)
  }
}
