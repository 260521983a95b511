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

  /** Distribution-DRIFT monitor between two corpus snapshots: for each
    * (group, cell) — e.g. (source, language) — flag cells whose SHARE
    * of the group changed significantly between snapshot A and B. This
    * is the datasheet-level check a recurring ingest runs before a
    * training snapshot ships ("did the language mix of source X move?"
    * — a crawler config change or an upstream filter regression shows
    * up here before it shows up in model metrics).
    *
    * The test is the pooled two-proportion z-test, in EXACT INTEGER
    * algebra (the [[hourlyCountAnomalies]] / q131 discipline): with
    * cell counts c₁,c₂ out of group totals n₁,n₂ (N = n₁+n₂,
    * c = c₁+c₂),
    *
    *   z² > T²  ⟺  (c₁n₂ − c₂n₁)²·N > T²·c·(N−c)·n₁·n₂
    *
    * — both sides int64-exact, so flags sit fully under the value
    * gate. Envelope: products stay inside int64 for group totals up to
    * ~50k rows per snapshot (the (c₁n₂)² term); beyond that a
    * production caller casts both sides to DOUBLE (fixed-shape, still
    * engine-deterministic — the q102 constant discipline). Cells with
    * c = 0 or c = N never flag (both sides 0 — no evidence of drift in
    * a cell absent from, or constant across, both snapshots).
    *
    * Scale shape: one hash aggregate to (group, cell, per-snapshot
    * counts) — map-side combined over the raw rows — then a broadcast
    * join of the per-group totals (|groups| rows). The raw corpus is
    * touched once. */
  def proportionDriftFlags(df: DataFrame, groupCol: String, cellCol: String,
                           inSnapshotA: org.apache.spark.sql.Column,
                           zThreshold: Int = 3): DataFrame = {
    val cells = df
      .groupBy(col(groupCol), col(cellCol))
      .agg(sum(when(inSnapshotA, 1L).otherwise(0L)).as("c_a"),
        sum(when(inSnapshotA, 0L).otherwise(1L)).as("c_b"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    val n = col("n_a") + col("n_b")
    val c = col("c_a") + col("c_b")
    val diff = col("c_a") * col("n_b") - col("c_b") * col("n_a")
    // no broadcast hint: the totals side is structurally a corpus
    // aggregate (the PlanAudit-unbounded shape) though domain-bounded
    // at |groups| rows — AQE broadcasts it from runtime stats instead
    // (the q131 precedent)
    cells.join(totals, Seq(groupCol))
      .select(col(groupCol), col(cellCol),
        col("c_a"), col("n_a"), col("c_b"), col("n_b"),
        (diff * diff * n >
          lit(zThreshold.toLong * zThreshold) * c * (n - c) * col("n_a") * col("n_b"))
          .as("drift"))
  }
}
