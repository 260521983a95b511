package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixScan

/** The two-level exclusive scan must equal the single-window global
  * running sum on any input — including empty buckets between occupied
  * ones, a bucket holding everything, negative addends, and the first
  * row of every bucket (whose intra-bucket sum is the empty sum). */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) =>
      val out = k -> acc; acc += v; out
    }.toMap
  }

  test("exclusive running sum ≡ single-window scan across bucket shapes") {
    // keys straddle buckets 0,1,3 (bucket 2 empty); values include negatives
    val rows = Seq((1L, 5L), (7L, -2L), (12L, 10L), (19L, 4L), (31L, 1L), (35L, 7L))
    for (width <- Seq(1L, 10L, 1000L)) {
      val got = PrefixScan.exclusiveRunningSum(
        rows.toDF("k", "v"), "k", "v", "run", expr(s"k div $width"))
        .select("k", "run").as[(Long, Long)].collect().toMap
      assert(got === reference(rows), s"width=$width")
    }
  }

  test("plan shape: the only unpartitioned window runs on the bucket-domain side") {
    val df = PrefixScan.exclusiveRunningSum(
      (1L to 100L).map(i => (i, i)).toDF("k", "v"),
      "k", "v", "run", expr("k div 10"))
    // the main-relation window must carry the bucket partition key;
    // a bare global window over the input would be the skew wall
    val plan = df.queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    // both window specs partition or run over g_psb (the bucket), so
    // no spec orders the raw input globally
    assert(windows.forall(_.contains("g_psb")), plan)
  }
}
