package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (q29's operator, reusable): a new session
  * starts when the gap to the previous row (per key, in `orderCol`
  * order) STRICTLY exceeds `gap` — a row at exactly the gap boundary
  * stays in the running session, and a key's first row (null lag) opens
  * session 0.
  *
  * Plan shape: one shuffle on the key, then two window passes over the
  * same (key, order) sort — lag flag + running sum — which Spark
  * executes in a single Window operator chain without re-sorting.
  * Session ids are per-key dense longs starting at 0.
  */
object Sessionize {

  def assignSessions(df: DataFrame, keyCol: String, orderCol: String,
                     tsCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    df.withColumn("__is_new",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__is_new")
  }
}
