package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval OVERLAP join — the temporal θ-join
  * (l.start ≤ r.end ∧ l.end ≥ r.start) that Spark would otherwise plan
  * as a broadcast-nested-loop over the full cross space.
  *
  * Scale shape (the standard chunked decomposition — the same
  * bucket-then-verify discipline as the range join q63 and the LSH
  * tier): every interval explodes to the fixed-width time CHUNKS it
  * spans, candidates equi-join on the chunk key, and the exact overlap
  * predicate verifies. Cost is Σ span/chunk per row (bounded fan-out,
  * map-only) plus one hash join on a key whose selectivity the chunk
  * width tunes — never |L|·|R|.
  *
  * Duplicate elimination is ARITHMETIC, not a distinct shuffle: a pair
  * sharing k chunks would match k times, so the join keeps only the
  * match in the pair's FIRST shared chunk — max of the two start
  * chunks — which each side can compute locally. (An overlapping pair
  * always shares that chunk: both intervals cover
  * max(⌊ls/c⌋, ⌊rs/c⌋) when they overlap at all.)
  *
  * Inputs must have disjoint column names; bounds are int64 (the
  * engine's epoch-nanos contract) and non-negative, where floor and
  * truncating division agree.
  */
object IntervalJoin {

  def overlapJoin(left: DataFrame, ls: String, le: String,
                  right: DataFrame, rs: String, re: String,
                  chunk: Long): DataFrame = {
    require(chunk > 0, s"chunk width must be positive, got $chunk")
    def chunked(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("g_chunk",
        explode(sequence(expr(s"$s div $chunk"), expr(s"$e div $chunk"))))
    chunked(left, ls, le)
      .join(chunked(right, rs, re), Seq("g_chunk"))
      .filter(col("g_chunk") ===
        greatest(expr(s"$ls div $chunk"), expr(s"$rs div $chunk")))
      .filter(col(ls) <= col(re) && col(le) >= col(rs))
      .drop("g_chunk")
  }
}
