package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sums over a totally-ordered column.
  *
  * Spark's own `Window.orderBy` WITHOUT a partitionBy collapses the
  * entire relation into one task — acceptable for a day domain (the
  * q197/q200 discipline), a skew wall for a customer- or value-domain
  * relation at 100 TB. This is the classic two-level scan instead:
  * intra-bucket running sums inside (bucket) window partitions run in
  * parallel, bucket TOTALS (one row per bucket) are prefixed on the
  * tiny bucket domain and broadcast back as offsets. Exact for any
  * associative sum type; every row's result is identical to the
  * single-window answer by associativity.
  *
  * Determinism contract: `orderCol` values must be UNIQUE (callers
  * pre-aggregate duplicates — the histogram shape q209 uses); a
  * running sum over tied order values has no well-defined per-row
  * value in either engine. `bucketExpr` must be a monotone
  * non-decreasing function of `orderCol` (e.g. `col div width`) so
  * bucket boundaries respect the global order — violating either is a
  * silent-corruption bug, so both are cheap to keep structural:
  * derive the bucket FROM the order column and scan a distinct
  * relation.
  */
object PrefixScan {

  /** Adds `outCol` = Σ `valCol` over all rows STRICTLY before this row
    * in `orderCol` order (exclusive scan; the first row gets 0). */
  def exclusiveRunningSum(df: DataFrame, orderCol: String, valCol: String,
                          outCol: String, bucketExpr: Column): DataFrame = {
    val withB = df.withColumn("g_psb", bucketExpr)
    val wIn = Window.partitionBy("g_psb").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = withB.withColumn("g_psi",
      coalesce(sum(col(valCol)).over(wIn), lit(0L)))
    // bucket-domain relation: one row per bucket — the only unpartitioned
    // window in the plan runs over it, never over the input
    val wB = Window.orderBy("g_psb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy("g_psb")
      .agg(sum(col(valCol)).as("g_pst"))
      .withColumn("g_pso", coalesce(sum(col("g_pst")).over(wB), lit(0L)))
      .select("g_psb", "g_pso")
    intra.join(broadcast(offsets), Seq("g_psb"))
      .withColumn(outCol, col("g_psi") + col("g_pso"))
      .drop("g_psb", "g_psi", "g_pso")
  }
}
