package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — Börzsönyi et al., ICDE'01's
  * "skyline operator", for the bigger-better × smaller-better case.
  *
  * A row survives iff NO other row is at least as good on both
  * dimensions and strictly better on one:
  * dominated(p) ⇔ ∃q: q.x ≥ p.x ∧ q.y ≤ p.y ∧ (q.x > p.x ∨ q.y < p.y).
  * Rows whose (x, y) pair is exactly tied survive together (neither
  * dominates — no strict inequality), matching the NOT EXISTS
  * definition the oracle runs.
  *
  * Scale shape — the reason this is an operator and not the quadratic
  * anti-join the definition suggests: for 2 dimensions, dominance
  * collapses to a SORTED-PREFIX property. Aggregate y to its min per
  * distinct x (one map-side-combined shuffle over the data), then on
  * the DISTINCT-x relation compute the running min of y over all
  * strictly-greater x. A row survives iff its y equals its x-group min
  * AND beats that strict-prefix running min. The only sequential step
  * runs on the distinct-x domain — after aggregation, a relation
  * bounded by the number of distinct x values, orders of magnitude
  * smaller than the input (for count-valued x it is at most the max
  * count) — so the single-partition window is a deliberate, bounded
  * choice, the same justification as the distinct-x frames in the
  * quantile tier. The input relation itself never self-joins: the
  * oracle's O(n²) NOT EXISTS is exactly what this shape avoids at
  * 100 TB.
  */
object Skyline {

  /** @param df    input with one row per entity
    * @param xCol  bigger-is-better dimension (numeric/decimal)
    * @param yCol  smaller-is-better dimension (numeric/decimal)
    * @return the surviving rows of `df`, all columns preserved */
  def frontier2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val grpMin = df.groupBy(col(xCol))
      .agg(min(col(yCol)).as("g_grp_min"))
    // distinct-x domain: running min of the group minima over all
    // STRICTLY greater x (rowsBetween ending at -1 — on the distinct
    // frame, "previous rows" are exactly the strictly-greater x's).
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = grpMin.withColumn("g_strict_min", min(col("g_grp_min")).over(w))
    df.join(prefix, Seq(xCol))
      .filter(col(yCol) === col("g_grp_min") &&
        (col("g_strict_min").isNull || col(yCol) < col("g_strict_min")))
      .drop("g_grp_min", "g_strict_min")
  }
}
