package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a TABLE — the approximate-frequency tier next to
  * HLL (q30) and the exact vocabulary (q69).
  *
  * Instead of a custom binary Aggregator buffer, the sketch is kept
  * relational: cell (r, hash_r(x) mod w) with its count. The build is
  * one explode (d rows per token) + one groupBy — map-side combine
  * collapses each partition to ≤ d·w cells before the shuffle, so the
  * exchange carries at most d·w rows per partition REGARDLESS of input
  * size; that bound is the whole point of a sketch at 100 TB. Estimates
  * are the classic min over the d hashed cells, computed by joining
  * candidates against the sketch — no driver collect, no UDF, every
  * stage codegen'd.
  *
  * Guarantee (standard CMS): est ≥ true, and est ≤ true + εN with
  * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Heavy hitters are then
  * candidates ranked by estimate. Candidates come from a cheap source
  * (a sample, a prior vocabulary, trending keys) — the sketch answers
  * WITHOUT a full exact count, which is what makes it cheaper than the
  * exact q69 pass when only the head of the distribution matters.
  */
object CountMin {

  /** The d (row, cell) coordinates of one token — seed r is prepended
    * to the hash input so the d rows are independent hash functions. */
  private def cellCoords(token: Column, w: Int, d: Int): Column =
    array((0 until d).map(r =>
      struct(lit(r).as("r"), pmod(xxhash64(lit(r), token), lit(w)).as("cell"))): _*)

  /** Build the sketch table (r, cell, n) from a token column. */
  def sketch(toks: DataFrame, tokenCol: String, w: Int = 1024, d: Int = 4): DataFrame =
    toks.select(explode(cellCoords(col(tokenCol), w, d)).as("u"))
      .groupBy(col("u.r").as("r"), col("u.cell").as("cell"))
      .agg(count(lit(1)).as("n"))

  /** Merge two sketch tables: element-wise cell sum. THE property that
    * makes the sketch distributable — partitions (or micro-batches, or
    * days) sketch independently and merge losslessly:
    * merge(sketch(A), sketch(B)) == sketch(A ∪ B), spec-pinned. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "cell").agg(sum("n").as("n"))

  /** Estimate each candidate's frequency: min over its d cells (absent
    * cell ⇒ 0). `candidates` is one token per row, deduplicated here. */
  def estimate(sketchDf: DataFrame, candidates: DataFrame, tokenCol: String,
               w: Int = 1024, d: Int = 4): DataFrame =
    candidates.select(col(tokenCol)).distinct()
      .select(col(tokenCol), explode(cellCoords(col(tokenCol), w, d)).as("u"))
      .select(col(tokenCol), col("u.r").as("r"), col("u.cell").as("cell"))
      .join(sketchDf, Seq("r", "cell"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))

  /** Heavy hitters: candidates ranked by estimate, deterministic
    * tiebreak, top k. The rank window input is |candidates| — agg-first
    * like every other top-N in this engine. */
  def heavyHitters(toks: DataFrame, tokenCol: String, candidates: DataFrame,
                   k: Int, w: Int = 1024, d: Int = 4): DataFrame = {
    val est = estimate(sketch(toks, tokenCol, w, d), candidates, tokenCol, w, d)
    est.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est").desc, col(tokenCol))))
      .filter(col("rank") <= k)
  }
}
