package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Shared gate for the DRIVER-LOCAL fast paths of the iterative graph
  * operators ([[Bfs]], [[Sssp]], [[KCore]], [[PageRank]]) — the r16
  * [[Components]] union-find treatment generalized. Each distributed
  * round of these loops is a join + aggregate (+ lineage-truncating
  * spill) JOB: several hundred ms of fixed driver/scheduling cost even
  * when the graph is a few thousand rows, so `rounds` iterations over
  * a small graph are almost pure overhead. A graph whose MEASURED size
  * fits under the cap is instead solved on the driver in one bounded
  * collect plus one scratch-parquet spill; anything larger takes the
  * operator's unchanged distributed loop. Each operator's local loop
  * replays the same min/count/integer-div arithmetic over the same
  * rows as its distributed rounds — bit-equality is pinned per
  * operator by spec (fixed + randomized graphs, local vs cap-0).
  *
  * The gate is a bounded take(cap + 1): ONE incremental pass that
  * decides AND fetches — never count-then-collect, which would execute
  * an expensive edge-generation plan once for the gate and again for
  * the collect. An over-cap graph pays one discarded partial scan and
  * falls through. Cap default 1 M rows (vertices + edges — tens of MB
  * of collected rows, a bounded driver-memory load on any cluster),
  * env `SPARK_GRAFT_GRAPH_LOCAL_MAX` (0 disables) for cluster
  * retuning — the same measured-not-estimated discipline as the
  * broadcast caps and `SPARK_GRAFT_CC_LOCAL_MAX`.
  */
private[graft] object LocalGraph {

  val MaxRows: Long =
    sys.env.get("SPARK_GRAFT_GRAPH_LOCAL_MAX").map(_.toLong)
      .getOrElse(1000000L)

  /** Some(all rows) iff `df` has at most `cap` rows — one incremental
    * take both decides the gate and fetches the data. None for a
    * non-positive cap (fast path disabled) or an over-cap relation.
    * Right when `df` is EXPENSIVE to execute (the PageRank edge plan —
    * a rare-gram self-join): the single pass never runs it twice. The
    * flip side is that an over-cap relation ships cap rows to the
    * driver before discarding them (measured: +3.5 s on q190's 2.4 M
    * staged edges) — use [[collectUnder]] when re-executing `df` is
    * known cheap. */
  def takeUnder(df: DataFrame, cap: Long): Option[Array[Row]] =
    if (cap <= 0 || cap >= Int.MaxValue) None
    else {
      val rows = df.take(cap.toInt + 1)
      if (rows.length <= cap) Some(rows) else None
    }

  /** [[takeUnder]] for relations that are CHEAP to execute twice (the
    * Bfs/Sssp/KCore call sites — their edge relations arrive staged to
    * scratch parquet by the callers' spillParquet contract): the gate
    * is a plain COUNT, which scans zero columns and ships zero rows
    * (an over-cap graph pays ~a parquet-footer pass, not a cap-row
    * driver collect — and NOT a limit(cap).count(), whose global-limit
    * shape funnels up to cap rows through one partition), and only an
    * under-cap relation is collected. */
  def collectUnder(df: DataFrame, cap: Long): Option[Array[Row]] =
    if (cap <= 0 || cap >= Int.MaxValue) None
    else if (df.count() > cap) None
    else Some(df.collect())
}
