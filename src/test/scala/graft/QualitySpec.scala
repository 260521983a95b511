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

  test("cluster-best-keep (q127): the kept doc maximizes quality within its cluster") {
    val out = graft.queries.ExtensionQueries.q127.fn(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    // re-derive every doc's score and its component independently
    val comp = graft.operators.Components.connectedComponents(
        graft.functions.Dedup.rareGramEdges(docs, "doc_id", "text", 3, 50L, 2L),
        docs.select(col("doc_id")))
      .select(col("v").as("doc_id"), col("component"))
    val scored = comp.join(docs.select(col("doc_id"),
      coalesce(graft.functions.Text.qualityScore(col("text")), lit(0.0)).as("score")), Seq("doc_id"))
    val best = scored.groupBy("component").agg(max(col("score")).as("max_score"),
      count(lit(1)).as("n"))
    val j = out.join(best, Seq("component")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Double]("best_score") === r.getAs[Double]("max_score"))
      assert(r.getAs[Long]("n_docs") === r.getAs[Long]("n"))
    }
    // one representative per component, and it is a member of the corpus
    assert(out.select("component").distinct().count() === out.count())
  }

  test("ccnet buckets (q128): terciles balanced within 1 per language, ordered by LM score") {
    val out = graft.queries.CorpusQueries.q128.fn(spark, sf).cache()
    val sizes = out.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = sizes.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val h = sizes.getOrElse((l, "head"), 0L)
      val m = sizes.getOrElse((l, "middle"), 0L)
      val t = sizes.getOrElse((l, "tail"), 0L)
      assert(h >= m && m >= t && h - t <= 1, s"$l: $h/$m/$t not ntile-balanced")
    }
    // ordering: every head doc scores >= every tail doc within the language
    val perLang = out.collect().groupBy(_.getString(1))
    perLang.foreach { case (l, rows) =>
      val head = rows.filter(_.getString(3) == "head").map(_.getLong(2))
      val tail = rows.filter(_.getString(3) == "tail").map(_.getLong(2))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"$l: head/tail overlap")
    }
  }
}
