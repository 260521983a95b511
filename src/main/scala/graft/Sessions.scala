package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so Verify / Bench / tests share one
  * config surface.
  *
  * Scale-relevant settings:
  *  - `shuffle.partitions` = cores locally (the 200 default is wrong for
  *    local mode; on a real cluster this is sized to data volume);
  *  - AQE on (runtime coalescing, skew-join splitting, dynamic
  *    broadcast) — the 100 TB safety net;
  *  - `legacy.parquet.nanosAsLong` — the events table carries
  *    nanosecond timestamps, which Spark 4 otherwise rejects
  *    (PARQUET_TYPE_ILLEGAL); reading them as int64-nanos also keeps
  *    recency arithmetic exact and oracle-comparable;
  *  - UTC session timezone for oracle parity.
  */
object Sessions {
  def local(cores: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
