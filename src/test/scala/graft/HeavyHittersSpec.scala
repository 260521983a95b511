package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** [[HeavyHitters]] — exact MG-candidates-then-recount frequent items.
  * The q235 registration is oracle-gated at sf0.01; these pin the
  * operator on crafted distributions the fixture can't guarantee:
  * decrement-heavy adversarial streams, merge across many partitions,
  * the strict-> threshold edge, and the empty-result path. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[String], m: Int): Map[String, Long] = {
    val n = vals.size.toLong
    vals.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * m > n }.toMap
  }

  private def run(vals: Seq[String], m: Int, parts: Int): Map[String, Long] =
    HeavyHitters.exactOverThreshold(
      vals.toDF("x").repartition(parts), "x", m)
      .as[(String, Long)].collect().toMap

  test("zipf-ish stream: exact equality with brute force across partitionings") {
    // value i appears 200/i times, i = 1..40: heavy head, long tail
    val vals = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"v$i"))
    for (m <- Seq(5, 12, 30); parts <- Seq(1, 7, 32)) {
      assert(run(vals, m, parts) === brute(vals, m),
        s"mismatch at m=$m parts=$parts")
    }
  }

  test("adversarial decrement stream: k distinct fillers between each hot item") {
    // classic MG stressor — every hot occurrence is followed by enough
    // distinct one-off values to force a full buffer and decrements;
    // the hot value must still survive (its true share is > 1/m)
    val hotEvery = (0 until 300).flatMap(i =>
      "hot" +: (0 until 3).map(j => s"junk_${i}_$j"))
    val m = 5 // hot share = 300/1200 = 1/4 > 1/5
    for (parts <- Seq(1, 13)) {
      val got = run(hotEvery, m, parts)
      assert(got === Map("hot" -> 300L))
    }
  }

  test("strict > threshold: a value at EXACTLY n/m is excluded") {
    // 4 values × 25 each, n = 100, m = 4: share = exactly 1/4, not >
    val vals = (1 to 4).flatMap(i => Seq.fill(25)(s"v$i"))
    assert(run(vals, 4, 8) === Map.empty)
    // tip one value over by one occurrence: only it qualifies
    val tipped = vals :+ "v1"
    val got = run(tipped, 4, 8)
    assert(got === Map("v1" -> 26L))
  }

  test("uniform data above any candidate: empty result, empty-schema path") {
    val vals = (1 to 50).flatMap(i => Seq.fill(4)(s"u$i"))
    val df = HeavyHitters.exactOverThreshold(vals.toDF("x"), "x", 10)
    assert(df.columns.toSeq === Seq("x", "cnt"))
    assert(df.count() === 0L)
  }

  test("streaming maintenance: cross-batch fold keeps the MG guarantee; replay no-op") {
    val dir = graft.pipeline.TempDirs.scoped("graft_mgmaint_") + "/mg"
    val m = 4
    // three batches; lifetime: hot=90/180 (> 1/4), warm=40/180 (< 1/4 at
    // 0.22), tail = 50 one-offs
    val batches = Seq(
      (0 until 30).map(_ => "hot") ++ (0 until 20).map(i => s"t1_$i"),
      (0 until 30).map(_ => "hot") ++ (0 until 40).map(_ => "warm"),
      (0 until 30).map(_ => "hot") ++ (0 until 30).map(i => s"t3_$i"))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.Events.mgSummaryMaintainBatch(dir, "x", m)(
        b.toDF("x"), i.toLong)
    }
    val st = graft.streaming.Events.mgCandidates(spark, dir)
      .as[(String, Long, Long)].collect()
    val n = st.head._3
    assert(n === 180L)
    val counters = st.map(t => t._1 -> t._2).toMap
    // completeness: lifetime share > 1/m ⇒ present
    assert(counters.contains("hot"))
    // counters never overestimate, and underestimate by ≤ n/(m+1)
    val truth = batches.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    counters.foreach { case (v, c) =>
      assert(c <= truth(v), s"$v overestimated")
      assert(c >= truth(v) - n / (m + 1), s"$v underestimated past the bound")
    }
    // replay of the last batch short-circuits: artifact version unchanged
    val before = graft.pipeline.AtomicTable.currentVersion(spark, dir)
    graft.streaming.Events.mgSummaryMaintainBatch(dir, "x", m)(
      batches.last.toDF("x"), 2L)
    assert(graft.pipeline.AtomicTable.currentVersion(spark, dir) === before)
  }

  test("nulls are ignored in both the count base and the candidates") {
    val vals = (Seq.fill(30)(Some("a")) ++ Seq.fill(20)(Option.empty[String])
      ++ Seq.fill(10)(Some("b"))).toDF("x")
    // n = 40 non-null; a: 30/40 > 1/2 qualifies, b: 10/40 = 1/4 does not
    val got = HeavyHitters.exactOverThreshold(vals, "x", 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 30L))
  }
}
