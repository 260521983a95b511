package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Quality

/** Constraint-gate semantics: SQL CHECK rules (FALSE violates, NULL
  * passes), exact violation attribution, and the partition property. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "positive" -> (col("v") > 0),
    "small" -> (col("v") < 100),
    "named" -> col("name").isNotNull)

  test("split partitions the input; violations name exactly the broken rules, in rule order") {
    val df = Seq(
      (1L, 5.0, "a"),    // clean
      (2L, -1.0, "b"),   // positive
      (3L, 500.0, null), // small + named
      (4L, -2.0, null)   // positive + named
    ).toDF("id", "v", "name")
    val (valid, quarantine) = Quality.split(df, rules)
    assert(valid.select("id").as[Long].collect().toSeq === Seq(1L))
    val q = quarantine.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("_violations")).toMap
    assert(q === Map(2L -> "positive", 3L -> "small,named", 4L -> "positive,named"))
    // partition: disjoint and exhaustive
    assert(valid.count() + quarantine.count() === df.count())
  }

  test("CHECK semantics: a NULL rule result passes (unknown is not a violation)") {
    val df = Seq((1L, Option.empty[java.lang.Double], "a")).toDF("id", "v", "name")
    // v IS NULL ⇒ `v > 0` and `v < 100` are UNKNOWN ⇒ both pass
    val (valid, quarantine) = Quality.split(df, rules)
    assert(valid.count() === 1 && quarantine.count() === 0)
  }
}
