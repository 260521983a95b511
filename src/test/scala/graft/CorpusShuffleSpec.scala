package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** q97 reproducible corpus shuffle — the range-partitioned (zipWithIndex
  * two-job) form that replaced the single-partition global window.
  * Pins: exact equivalence with the window form, >1 post-shuffle
  * partition (the scale property the rewrite exists for), determinism
  * across runs, and seed sensitivity.
  */
class CorpusShuffleSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"
  private val sf1 = "/root/testdata/sf0.1"

  test("range-partitioned shuffle positions == global-window row_number (sf0.01)") {
    val docs = Tables.documents(spark, sf01)
    val got = queries.TrainingQueries.shuffledPositions(spark, docs, lit("shuf1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h = functions.Hashes
      .hex15(concat(lit("shuf1|"), col("doc_id").cast(StringType)))
    val want = docs.select(col("doc_id"),
        row_number().over(Window.orderBy(h, col("doc_id"))).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("no single-partition stage: >1 post-shuffle partition, >1 non-empty (sf0.1)") {
    val res = queries.TrainingQueries
      .shuffledPositions(spark, Tables.documents(spark, sf1), lit("shuf1"))
    assert(res.rdd.getNumPartitions > 1, "result collapsed to one partition")
    val nonEmpty = res.rdd
      .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
      .sum().toInt
    assert(nonEmpty > 1, s"only $nonEmpty non-empty partition(s) — not distributed")
  }

  test("deterministic across runs; positions are a 1..n permutation") {
    val docs = Tables.documents(spark, sf01)
    def run() = queries.TrainingQueries.shuffledPositions(spark, docs, lit("shuf1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val a = run()
    assert(a.sameElements(run()), "same seed must replay the same order")
    val n = docs.count()
    assert(a.map(_._2).sorted.sameElements(1L to n), "positions must be 1..n exactly once")
  }

  test("a different seed is a different permutation") {
    val docs = Tables.documents(spark, sf01)
    def posMap(seed: String) = queries.TrainingQueries
      .shuffledPositions(spark, docs, lit(seed))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(posMap("shuf1") !== posMap("shuf2"))
  }
}
