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
           k: Int, rounds: Int,
           localMaxRows: Long = LocalGraph.MaxRows): DataFrame = {
    require(k >= 1, s"k-core threshold must be >= 1, got $k")
    require(rounds >= 1, s"round budget must be >= 1, got $rounds")
    var e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
    // SMALL-GRAPH FAST PATH (measured, capped — see [[LocalGraph]]):
    // the same bounded peel over collected rows — per round, degree =
    // out-edge count per source (the symmetric-input convention makes
    // that the vertex degree), then edges keep both-endpoints-alive;
    // the FINAL round only recounts (the distributed loop's r == rounds
    // shape), so the round budget binds identically.
    LocalGraph.collectUnder(e, localMaxRows).foreach { eRows =>
      var es: Seq[(Any, Any)] = eRows.toSeq.map(r => (r.get(0), r.get(1)))
      var deg: Map[Any, Long] = Map.empty
      for (r <- 1 to rounds) {
        deg = es.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
        if (r < rounds) {
          val alive = deg.collect { case (v, d) if d >= k => v }.toSet
          es = es.filter(t => alive(t._1) && alive(t._2))
        }
      }
      val spark = edges.sparkSession
      val schema = e.groupBy(col("x").as("v"))
        .agg(count(lit(1)).as("deg")).schema
      return spillParquet(spark.createDataFrame(
        spark.sparkContext.parallelize(
          deg.toSeq.collect { case (v, d) if d >= k =>
            org.apache.spark.sql.Row(v, d) }, 1),
        schema), "graft_kcore_local_")
    }
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
