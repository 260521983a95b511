package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed per-group quantiles over an integer-valued column,
  * via the value-histogram + cumulative-count construction — the
  * length-filter primitive every corpus-curation recipe starts with
  * ("drop docs below the per-language 5th / above the 95th length
  * percentile", Gopher §A.1-style, cf. the reference's quality cuts in
  * silver_transfrom.py:37-41 where rows outside sane value ranges are
  * dropped).
  *
  * Why not `percentile_approx` / `approxQuantile`: their rank error is
  * engine-specific (a GK/KLL sketch), so the result cannot sit under a
  * cross-engine hash gate — and for a column with BOUNDED DISTINCT
  * VALUES (lengths, token counts, scores), exactness costs almost
  * nothing at any corpus size:
  *
  *   - the ONLY corpus-wide move is `groupBy(group, value).count` —
  *     map-side combined, shuffling at most |groups|·|distinct values|
  *     rows (lengths: thousands) regardless of row count (100 TB of
  *     docs still collapses to the same histogram);
  *   - the rank arithmetic (window cumsum, threshold pick) runs over
  *     that compact histogram, partitioned by group — never over docs;
  *   - the thresholds table is ONE ROW PER GROUP; joining it back to
  *     the corpus is planner-broadcastable (no explicit hint — the q75
  *     rule: a hint would be honored unconditionally, and a
  *     pathological high-cardinality group column must be allowed to
  *     fall back to a shuffle join on the group key).
  *
  * Quantile convention: `q(p) = min{ v : count(≤ v) · den ≥ p·n }` with
  * `p = num/den` — the inf-CDF (`quantile_disc`) definition, evaluated
  * in EXACT int64 arithmetic (`cc·den ≥ num·n` — no float rank, no
  * rounding-mode seam between engines).
  */
object Quantiles {

  /** Per-group thresholds (`lo`, `hi`) at rational quantiles
    * loNum/loDen and hiNum/hiDen. Output: (groupCol, lo, hi, n). */
  def groupThresholds(df: DataFrame, groupCol: String, valueCol: String,
                      loNum: Int, loDen: Int,
                      hiNum: Int, hiDen: Int): DataFrame = {
    require(loNum >= 0 && loNum <= loDen && loDen > 0, s"bad lo quantile $loNum/$loDen")
    require(hiNum >= 0 && hiNum <= hiDen && hiDen > 0, s"bad hi quantile $hiNum/$hiDen")
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cc", sum(col("c")).over(
        Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(groupCol)))
    // BOTH thresholds in ONE conditional aggregation over the cumulative
    // histogram: separate filter+groupBy picks would be independent
    // DataFrame subtrees Catalyst does not CSE, re-deriving the corpus
    // histogram once per threshold (the Funnel plan-reuse lesson)
    cum.groupBy(col(groupCol)).agg(
      min(when(col("cc") * loDen >= col("n") * loNum, col(valueCol))).as("lo"),
      min(when(col("cc") * hiDen >= col("n") * hiNum, col(valueCol))).as("hi"),
      max(col("n")).as("n"))
  }

  /** GLOBAL k-quantile CUT points of an integer-valued column under
    * the same inf-CDF convention — a (k−1)-element array in one row
    * (`cuts(i) = q((i+1)/k)`). Same scale shape as
    * [[groupThresholds]]: the corpus collapses to a value histogram
    * first (map-side combined), and the window cumsum runs over the
    * compact histogram only, never over rows. Segment assignment is
    * then `1 + Σᵢ [v > cuts(i)]` — a map-only comparison against the
    * broadcast one-row table; equal values always land in the same
    * segment (value-based, not row-based — the property `ntile` does
    * NOT have, and the reason this is hash-gateable without a
    * row-order tiebreak). */
  def cutPoints(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k-quantile cuts need k >= 2, got $k")
    val hist = df.groupBy(col(valueCol)).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cc", sum(col("c")).over(Window.orderBy(valueCol)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
    cum.agg(array((1 until k).map(q =>
      min(when(col("cc") * k >= col("n") * q, col(valueCol)))): _*).as("cuts"))
  }

  /** Rows of `df` whose `valueCol` lies inside the group's
    * [q(lo), q(hi)] band — the per-group quantile trim. The input
    * passes through unchanged except the filter (no reorder, no
    * projection), so the op composes like a `filter`. */
  def trimToRange(df: DataFrame, groupCol: String, valueCol: String,
                  loNum: Int, loDen: Int,
                  hiNum: Int, hiDen: Int): DataFrame = {
    val th = groupThresholds(df, groupCol, valueCol, loNum, loDen, hiNum, hiDen)
      .select(col(groupCol), col("lo"), col("hi"))
    df.join(th, Seq(groupCol))
      .filter(col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .drop("lo", "hi")
  }
}
