package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layer: the storage-layout change that removes the J1
  * fact-join shuffle at scale (SCALE.md "Fact join J1").
  *
  * Writing both join sides bucketed by the join key into the session
  * catalog lets Catalyst plan a co-located sort-merge join with NO
  * Exchange on either side — at 100 TB that converts the single biggest
  * network cost of the gold pipeline into local disk reads. Bucket
  * count is a layout-time decision: pick ~(table size / 256 MB),
  * identical on both sides.
  *
  * Parquet bucketing requires a catalog table (`saveAsTable`), not a
  * path write — the bucket spec lives in catalog metadata.
  */
object Lakehouse {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // the in-memory catalog forgets managed tables across sessions but
    // their warehouse directories remain; an unregistered leftover dir
    // fails saveAsTable with LOCATION_ALREADY_EXISTS — drop both
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(w.sortBy(_)).saveAsTable(table)
  }

  /** Co-located inner equi-join of two tables bucketed on `key` with
    * the same bucket count: planner emits zero shuffles. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), "inner")

  /** Shuffle-exchange count of the EXECUTED plan (runs the query) —
    * 0 is the property the bucketed layout buys. Traverses through
    * AQE wrappers and materialized query stages, which `plan.exists`
    * does not. */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    df.count()
    def walk(p: SparkPlan): Int = {
      val self = if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  def isShuffleFree(df: DataFrame): Boolean = shuffleCount(df) == 0

  /** Range-clustered write — the CLUSTER BY / (single-key) Z-ORDER
    * table service: `repartitionByRange` gives each output file a
    * disjoint slice of the key space, `sortWithinPartitions` orders
    * rows inside each file, so every parquet ROW GROUP carries narrow,
    * non-overlapping min/max stats. A pushed range predicate then
    * prunes all but the matching row groups at scan time — data
    * skipping with no index structure, which is how a 100 TB table
    * answers a point-range query without reading 100 TB. (True
    * multi-column Z-ORDER interleaves key bits; for the single-key
    * locality the reference's date/key-range queries need, range
    * clustering is the same skipping with a cheaper sort.)
    * `ScaleOpsSpec` proves the effect directly from the footers. */
  def clusteredWrite(df: DataFrame, dir: String, sortCols: Seq[String],
                     numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Delta-style `ZORDER BY (cols…)`: lay the files out along the
    * n-dimensional Morton curve WITHOUT storing the synthetic key —
    * the interleave drives `repartitionByRange` + the in-file sort and
    * is then projected away (a narrow projection after the sort, so
    * file order is preserved). Readers see only the original schema;
    * the layout survives in every column's row-group min/max stats,
    * which is where the skipping lives. `bits` sizes the grid per
    * [[graft.functions.ZOrder.zOrderN]] (n·bits ≤ 63). */
  def zorderWrite(df: DataFrame, dir: String, zCols: Seq[String],
                  numFiles: Int, bits: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(!df.columns.contains("__zkey"),
      "column name __zkey is reserved by zorderWrite")
    df.withColumn("__zkey", graft.functions.ZOrder.zOrderN(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }
}
