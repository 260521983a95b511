package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join ≡ naive inequality join, boundaries included. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned ≡ naive on handcrafted boundaries and bin edges") {
    // bin width 2^4 = 16: ranges deliberately straddle bin boundaries,
    // points sit exactly on lo/hi and on bin edges
    val points = Seq(0L, 5L, 15L, 16L, 17L, 31L, 32L, 100L, 101L, 119L, 120L, 121L)
      .toDF("p")
    val ranges = Seq((1L, 5L, 16L), (2L, 16L, 31L), (3L, 100L, 120L), (4L, 200L, 300L))
      .toDF("r_id", "lo", "hi")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("p", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pairs(RangeJoin.naive(points, "p", ranges, "lo", "hi"))
    val binned = pairs(RangeJoin.binned(points, "p", ranges, "lo", "hi", binShift = 4))
    assert(binned === naive)
    // sanity on content: inclusive boundaries, empty range r_id=4
    assert(naive.contains((5L, 1L)) && naive.contains((16L, 1L)) && naive.contains((16L, 2L)))
    assert(!naive.exists(_._2 == 4L))
  }

  test("binned ≡ naive on the events table against derived windows") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts")).limit(2000)
    val ranges = ev.agg(min("ts").as("tmin"), max("ts").as("tmax"))
      .select(explode(sequence(lit(0), lit(9))).as("r_id"), col("tmin"), col("tmax"))
      .select(col("r_id"),
        (col("tmin") + col("r_id") * expr("(tmax - tmin) div 10")).as("lo"),
        (col("tmin") + (col("r_id") + 2) * expr("(tmax - tmin) div 10")).as("hi"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pairs(RangeJoin.binned(ev, "ts", ranges, "lo", "hi", binShift = 44)) ===
      pairs(RangeJoin.naive(ev, "ts", ranges, "lo", "hi")))
  }
}
