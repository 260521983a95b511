package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming-pipeline observability: flag hours whose event volume
  * deviates from the per-type trailing baseline — the monitor a
  * large-scale ingest runs to catch upstream outages (count collapse)
  * and bot floods / replay storms (count spikes) before they poison a
  * training snapshot.
  *
  * The test is the classic z-score over a trailing window, in EXACT
  * INTEGER algebra: with n prior counts (sum s, sum-of-squares q) and
  * the current count c,
  *
  *   z² > T²  ⟺  (c·n − s)² > T²·(n·q − s²)
  *
  * — both sides exact int64, so the operator sits fully under the
  * DuckDB value gate (the q131 rational-comparison discipline; a float
  * mean/std would put an order-sensitive SUM(double) in the flag).
  * Hours with fewer than `window` observed predecessors are withheld
  * (no baseline yet), and the frame is ROWS (the n most recent
  * OBSERVED hours), so silent gaps don't shrink the sample.
  *
  * Scale shape: one hash aggregate (map-side combined) to hourly
  * counts, then a window over |types|·|hours| rows — the aggregated
  * series, never the raw events. At 100 TB the window input is still
  * only thousands of rows per type per year.
  */
object Anomaly {

  def hourlyCountAnomalies(events: DataFrame, typeCol: String,
                           tsNanosCol: String, window: Int = 24,
                           zThreshold: Int = 3): DataFrame = {
    require(window >= 2, s"window $window too small for a variance")
    val nanosPerHour = 3600L * 1000000000L
    // FLOOR division, not Spark's truncate-toward-zero `div`: DuckDB's
    // `//` floors, so a pre-1970 (negative) epoch-nano timestamp would
    // bucket into a different hour under `div`. (a − pmod(a,b)) is
    // exactly divisible by b, so the remaining `div` is exact for any
    // sign — all-integer, no double rounding.
    val counts = events
      .select(col(typeCol),
        expr(s"($tsNanosCol - pmod($tsNanosCol, $nanosPerHour)) div $nanosPerHour")
          .as("hour"))
      .groupBy(col(typeCol), col("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("hour"))
      .rowsBetween(-window, -1)
    val c = col("n_events"); val s = col("s"); val q = col("q")
    val lhs = (c * window - s) * (c * window - s)
    val rhs = lit(zThreshold.toLong * zThreshold) * (q * window - s * s)
    counts
      .withColumn("s", sum(c).over(w).cast(LongType))
      .withColumn("q", sum(c * c).over(w).cast(LongType))
      .withColumn("n_prior", count(lit(1)).over(w))
      .filter(col("n_prior") === window)
      .select(col(typeCol), col("hour"), c,
        (lhs > rhs).as("anomaly"))
  }
}
