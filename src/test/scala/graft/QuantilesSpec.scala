package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles
import graft.functions.Text

/** Pins for the exact per-group quantile operator (q146) and the
  * hashed linear classifier (q147). */
class QuantilesSpec extends SparkSpec {

  private def fixture() = {
    import spark.implicits._
    // two groups with known, skewed value multisets (dup values included
    // so the histogram path — not a row sort — is what's exercised)
    val a = Seq(1, 1, 2, 3, 4, 5, 6, 7, 8, 100).map(("a", _))
    val b = Seq(10, 20, 20, 20, 30).map(("b", _))
    (a ++ b).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v.toLong) }
      .toDF("id", "g", "v")
  }

  /** Reference inf-CDF quantile over a sorted in-memory multiset. */
  private def bruteQ(vs: Seq[Long], num: Int, den: Int): Long = {
    val sorted = vs.sorted
    val n = sorted.size
    sorted.find(v => sorted.count(_ <= v).toLong * den >= num.toLong * n).get
  }

  test("groupThresholds matches the brute-force inf-CDF quantile per group") {
    val df = fixture()
    val th = Quantiles.groupThresholds(df, "g", "v", 1, 20, 19, 20)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byG = fixture().collect().map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for ((g, vs) <- byG) {
      val (lo, hi, n) = th(g)
      assert(lo == bruteQ(vs, 1, 20), s"lo for $g")
      assert(hi == bruteQ(vs, 19, 20), s"hi for $g")
      assert(n == vs.size)
    }
  }

  test("trimToRange keeps exactly the in-band rows and passes columns through") {
    val df = fixture()
    val out = Quantiles.trimToRange(df, "g", "v", 1, 4, 3, 4)
    assert(out.columns.sorted.toSeq == Seq("g", "id", "v"))
    val kept = out.collect().map(r => r.getAs[Long]("id")).toSet
    val byG = df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("g"), r.getAs[Long]("v")))
      .groupBy(_._2)
    val expected = byG.toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(_._3).toSeq
      val lo = bruteQ(vs, 1, 4); val hi = bruteQ(vs, 3, 4)
      rows.filter(r => r._3 >= lo && r._3 <= hi).map(_._1).toSeq
    }.toSet
    assert(kept == expected)
  }

  test("degenerate quantiles: 0/1..1/1 keeps everything; equal bounds keep the median value") {
    val df = fixture()
    assert(Quantiles.trimToRange(df, "g", "v", 0, 1, 1, 1).count() == df.count())
    val med = Quantiles.groupThresholds(df, "g", "v", 1, 2, 1, 2)
      .filter(col("g") === "b").select("lo", "hi").head()
    assert(med.getLong(0) == 20L && med.getLong(1) == 20L)
  }

  test("hashedLinearScore is tf-weighted and int64-deterministic") {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "alpha alpha"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.hashedLinearScore(col("text")).as("s"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) == 2 * m(1L), "repeated token contributes once per occurrence")
    assert(m(3L) != m(1L), "distinct tokens get distinct hashed weights (whp)")
    // weights bounded by construction: |w| <= half per token
    assert(math.abs(m(1L)) <= 500)
    assert(math.abs(m(3L)) <= 1000)
  }
}
