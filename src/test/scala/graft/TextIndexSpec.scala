package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Retrieval, TextIndex}

/** Pins for the persisted incremental inverted text index (q148):
  * incremental ≡ full, re-crawl replacement (no stranded postings),
  * and version isolation on the artifact. */
class TextIndexSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tix_").toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("incremental addShard ≡ from-scratch build over the union") {
    val base = docs(1L -> "a b a", 2L -> "b c", 3L -> "c c c a")
    val shard = docs(4L -> "a d", 5L -> "d d b")
    val dir = tmpDir()
    TextIndex.build(base, "doc_id", "text", dir)
    TextIndex.addShard(shard, "doc_id", "text", dir)
    val incremental = TextIndex.indexView(spark, dir, topK = 16)
    val full = Retrieval.invertedIndex(base.unionByName(shard), "doc_id", "text", 16)
    assert(sortedRows(incremental) == sortedRows(full))
  }

  test("re-crawled doc replaces its postings — dropped tokens leave no strays") {
    val dir = tmpDir()
    TextIndex.build(docs(1L -> "x y z", 2L -> "y"), "doc_id", "text", dir)
    // doc 1 re-crawled: loses z, gains w; doc 2 untouched
    TextIndex.addShard(docs(1L -> "x w"), "doc_id", "text", dir)
    val p = TextIndex.postings(spark, dir)
    assert(p.filter(col("token") === "z").count() == 0, "stale posting survived")
    val expected = Retrieval.invertedIndex(
      docs(1L -> "x w", 2L -> "y"), "doc_id", "text", 16)
    assert(sortedRows(TextIndex.indexView(spark, dir)) == sortedRows(expected))
  }

  test("each arrival commits a version; prior versions stay readable (snapshot isolation)") {
    val dir = tmpDir()
    TextIndex.build(docs(1L -> "a"), "doc_id", "text", dir)
    val v1 = TextIndex.version(spark, dir).get
    val before = sortedRows(TextIndex.postings(spark, dir))
    TextIndex.addShard(docs(2L -> "b"), "doc_id", "text", dir)
    val v2 = TextIndex.version(spark, dir).get
    assert(v1 != v2)
    assert(sortedRows(
      graft.pipeline.AtomicTable.readVersion(spark, s"$dir/postings", v1)) == before)
  }

  test("streaming maintenance: live view ≡ full rebuild; replay idempotent; compaction folds in") {
    val dir = tmpDir()
    val streamDir = s"$dir/stream"
    val base = docs(1L -> "a b", 2L -> "b c")
    TextIndex.build(base, "doc_id", "text", dir)
    // batch 0: new doc 3; batch 1: re-crawl of doc 1 (loses b, gains d) + new doc 4
    val b0 = docs(3L -> "c a")
    val b1 = docs(1L -> "a d", 4L -> "d")
    graft.streaming.Events.textIndexMaintainBatch(streamDir)(b0, 0L)
    graft.streaming.Events.textIndexMaintainBatch(streamDir)(b1, 1L)
    val expected = Retrieval.invertedIndex(
      docs(1L -> "a d", 2L -> "b c", 3L -> "c a", 4L -> "d"), "doc_id", "text", 16)
    assert(sortedRows(TextIndex.liveIndexView(spark, dir, streamDir)) ==
      sortedRows(expected), "live view must equal the from-scratch build")
    // replay batch 1: its partition is overwritten, not duplicated
    graft.streaming.Events.textIndexMaintainBatch(streamDir)(b1, 1L)
    assert(sortedRows(TextIndex.liveIndexView(spark, dir, streamDir)) ==
      sortedRows(expected), "replay must be idempotent")
    // compaction: committed artifact alone now serves the same index
    TextIndex.compactStream(spark, dir, streamDir)
    assert(sortedRows(TextIndex.indexView(spark, dir)) == sortedRows(expected),
      "compaction must fold the stream tier into the artifact")
  }

  test("re-crawl to EMPTY text still deletes the doc's postings (batch and stream)") {
    import spark.implicits._
    // batch path: the delete set is the shard's doc ids, not its postings
    val dir = tmpDir()
    TextIndex.build(docs(1L -> "x y", 2L -> "y"), "doc_id", "text", dir)
    TextIndex.addShard(Seq((1L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    assert(sortedRows(TextIndex.indexView(spark, dir)) ==
      sortedRows(Retrieval.invertedIndex(docs(2L -> "y"), "doc_id", "text", 16)),
      "a null-text re-crawl must delete the doc's committed postings")
    // stream path: the tombstone row supersedes under latest-batch-wins
    val dir2 = tmpDir()
    val sd = s"$dir2/stream"
    TextIndex.build(docs(1L -> "x y", 2L -> "y"), "doc_id", "text", dir2)
    graft.streaming.Events.textIndexMaintainBatch(sd)(
      Seq((1L, null: String)).toDF("doc_id", "text"), 0L)
    val expected = Retrieval.invertedIndex(docs(2L -> "y"), "doc_id", "text", 16)
    assert(sortedRows(TextIndex.liveIndexView(spark, dir2, sd)) ==
      sortedRows(expected), "tombstone must supersede the committed postings")
    TextIndex.compactStream(spark, dir2, sd)
    assert(sortedRows(TextIndex.indexView(spark, dir2)) == sortedRows(expected),
      "compaction must apply the tombstone's delete")
  }

  test("live view and compaction with NO stream tier serve the committed artifact") {
    val dir = tmpDir()
    TextIndex.build(docs(1L -> "a b"), "doc_id", "text", dir)
    val committed = sortedRows(TextIndex.indexView(spark, dir))
    assert(sortedRows(TextIndex.liveIndexView(spark, dir, s"$dir/nope")) == committed,
      "post-rotation read must fall back to the artifact, not error")
    TextIndex.compactStream(spark, dir, s"$dir/nope") // must be a no-op
    assert(sortedRows(TextIndex.indexView(spark, dir)) == committed)
  }

  test("positional tier: incremental ≡ full; index-served phrase ≡ text-scanned phrase") {
    val base = docs(1L -> "a b c d", 2L -> "b c x")
    val shard = docs(3L -> "a b c", 4L -> "c d")
    val dir = tmpDir()
    TextIndex.buildPositional(base, "doc_id", "text", dir)
    TextIndex.addShardPositional(shard, "doc_id", "text", dir)
    val union = base.unionByName(shard)
    assert(sortedRows(TextIndex.positionalPostings(spark, dir)) ==
      sortedRows(Retrieval.positionalPostings(union, "doc_id", "text")),
      "incremental positional tier must equal the from-scratch explode")
    val phrase = Seq("b", "c")
    assert(sortedRows(TextIndex.phraseSearch(spark, dir, phrase)) ==
      sortedRows(Retrieval.phraseSearch(union, "doc_id", "text", phrase)),
      "index-served phrase hits must equal the text scan")
    // re-crawl through the positional tier: doc 1 loses the phrase
    TextIndex.addShardPositional(docs(1L -> "a d"), "doc_id", "text", dir)
    val hits = TextIndex.phraseSearch(spark, dir, phrase)
      .collect().map(_.getLong(0)).toSet
    assert(!hits.contains(1L), "stale positions must not serve old phrases")
  }

  test("empty shard is a no-op on the index contents") {
    val dir = tmpDir()
    TextIndex.build(docs(1L -> "a b"), "doc_id", "text", dir)
    val before = sortedRows(TextIndex.indexView(spark, dir))
    TextIndex.addShard(docs(1L -> "a b").limit(0), "doc_id", "text", dir)
    assert(sortedRows(TextIndex.indexView(spark, dir)) == before)
  }

  test("streaming forget gate: tombstone batches propagate through both tiers; replay idempotent") {
    val dir = tmpDir()
    val all = docs(1L -> "a b", 2L -> "b c", 3L -> "c a", 4L -> "a d")
    TextIndex.build(all, "doc_id", "text", dir)
    TextIndex.buildPositional(all, "doc_id", "text", dir)
    graft.streaming.Events.forgetGateBatch(dir)(docs(2L -> ""), 0L)
    graft.streaming.Events.forgetGateBatch(dir)(docs(4L -> ""), 1L)
    val survivors = docs(1L -> "a b", 3L -> "c a")
    val wantIdx = sortedRows(Retrieval.invertedIndex(survivors, "doc_id", "text", 16))
    val wantPos = sortedRows(Retrieval.positionalPostings(survivors, "doc_id", "text"))
    assert(sortedRows(TextIndex.indexView(spark, dir, topK = 16)) == wantIdx)
    assert(sortedRows(TextIndex.positionalPostings(spark, dir)) == wantPos)
    // checkpoint-recovery replay of batch 1 must be a no-op
    graft.streaming.Events.forgetGateBatch(dir)(docs(4L -> ""), 1L)
    assert(sortedRows(TextIndex.indexView(spark, dir, topK = 16)) == wantIdx)
  }

  test("forget: both tiers ≡ never-ingested; survivors untouched; idempotent") {
    val all = docs(1L -> "a b a", 2L -> "b c", 3L -> "c c a", 4L -> "a d b")
    val dir = tmpDir()
    TextIndex.build(all, "doc_id", "text", dir)
    TextIndex.buildPositional(all, "doc_id", "text", dir)
    TextIndex.forget(spark, docs(2L -> "", 3L -> "").select("doc_id"), dir)
    // post-forget serving == index built over the survivors only
    val survivors = all.filter(col("doc_id").isin(1L, 4L))
    assert(sortedRows(TextIndex.indexView(spark, dir, topK = 16)) ==
      sortedRows(Retrieval.invertedIndex(survivors, "doc_id", "text", 16)))
    assert(sortedRows(TextIndex.positionalPostings(spark, dir)) ==
      sortedRows(Retrieval.positionalPostings(survivors, "doc_id", "text")
        .withColumnRenamed("doc_id", "doc_id")))
    // idempotent, absent ids included
    val frozen = sortedRows(TextIndex.postings(spark, dir))
    TextIndex.forget(spark, docs(3L -> "", 99L -> "").select("doc_id"), dir)
    assert(sortedRows(TextIndex.postings(spark, dir)) == frozen)
  }
}
