package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retention-cohort matrix — the companion table to [[Funnel]] on
  * every e-commerce dashboard: cohort = each key's first active
  * period, cell (cohort, offset) = how many of that cohort's keys
  * were active `offset` periods later. Input is the already-distinct
  * (key, period) activity relation; periods are integers (epoch-weeks
  * here — exact int64 arithmetic, no calendar/TZ seam).
  *
  * Scale shape: one min-aggregate for the cohorts (map-side
  * combined), one equi-join back on the key, one count — every step
  * shuffles key-period rows, never raw events; the caller's
  * `distinct()` is the only pass that sees the event log. */
object Retention {

  /** (cohort_week, week_offset, n_users) from a DISTINCT
    * (user_id, wk) activity relation. */
  def cohortMatrix(activity: DataFrame): DataFrame = {
    val cohorts = activity.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    activity.join(cohorts, Seq("user_id"))
      .select(col("cohort").as("cohort_week"),
        (col("wk") - col("cohort")).cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
