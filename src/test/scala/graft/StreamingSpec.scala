package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Events

/** Streaming semantics pinned per SURVEY §2.9 using MemoryStream (the
  * same downstream plan a Kafka source would feed). */
class StreamingSpec extends SparkSpec {
  import Events._

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("parse chain: cast→from_json→flatten→tag→processing-time partitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(
      """{"user_id":"u1","timestamp":"2020-01-01T00:00:00","product_id":"p1"}""",
      """not json at all""")
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    runToMemory(parse(ms.toDF().withColumnRenamed("value", "value"), "page_view", clock),
      "parsed")
    val rows = spark.table("parsed").collect()
    assert(rows.length === 2)
    val good = rows.find(r => r.getAs[String]("user_id") == "u1").get
    assert(good.getAs[String]("product_id") === "p1")
    assert(good.getAs[String]("event_type") === "page_view")
    // late-data rule: the OLD event timestamp string does not matter —
    // partitions come from processing time
    assert(good.getAs[Int]("year") === 2026 && good.getAs[Int]("month") === 8)
    // malformed JSON -> permissive nulls, row retained
    val bad = rows.find(r => r.getAs[String]("user_id") == null).get
    assert(bad.getAs[String]("product_id") === null)
  }

  test("rerank: priority order, order-preserving dedup, cap at 10") {
    assert(rerank(Seq("o1", "o2"), Seq("v1", "o1"), Seq("c1", "v1"))
      === Seq("c1", "v1", "o1", "o2"))
    val many = rerank((1 to 20).map("o" + _), Seq("v1"), Seq("c1"))
    assert(many.length === 10 && many.head === "c1" && many(1) === "v1")
    // column form agrees with the pure function
    import spark.implicits._
    val df = Seq((Seq("o1", "o2"), Seq("v1", "o1"), Seq("c1", "v1")))
      .toDF("offline", "views", "cart")
    val got = df.select(rerankCol(col("offline"), col("views"), col("cart")))
      .head().getSeq[String](0)
    assert(got === Seq("c1", "v1", "o1", "o2"))
  }

  test("W2: flatMapGroupsWithState keeps a bounded most-recent list across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ItemEvent]
    val q = boundedRecentItems(ms.toDS(), keep = 3).writeStream
      .format("memory").queryName("state_out").outputMode("update").start()
    ms.addData(ItemEvent("u1", "a", "view"), ItemEvent("u1", "b", "view"))
    q.processAllAvailable()
    ms.addData(ItemEvent("u1", "c", "view"), ItemEvent("u1", "d", "view"),
      ItemEvent("u2", "z", "view"))
    q.processAllAvailable()
    val byBatch = spark.table("state_out").as[UserItems].collect()
    q.stop()
    // u1 after batch 2: newest-first [d, c, b] — 'a' trimmed at keep=3
    val u1Final = byBatch.filter(_.user_id == "u1").last
    assert(u1Final.items === Seq("d", "c", "b"))
    assert(byBatch.filter(_.user_id == "u2").last.items === Seq("z"))
  }

  test("W2 on transformWithState: bounded list across batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    try {
      val ms = MemoryStream[ItemEvent]
      val q = boundedRecentItemsV2(ms.toDS(), keep = 3).writeStream
        .format("memory").queryName("tws_out").outputMode("update").start()
      ms.addData(ItemEvent("u1", "a", "view"), ItemEvent("u1", "b", "view"))
      q.processAllAvailable()
      ms.addData(ItemEvent("u1", "c", "view"), ItemEvent("u1", "d", "view"))
      q.processAllAvailable(); q.stop()
      val u1 = spark.table("tws_out").as[UserItems].collect().filter(_.user_id == "u1")
      assert(u1.last.items === Seq("d", "c", "b")) // same semantics as the fMGWS form
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("K5: streaming parquet sink is exactly-once across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val ms = MemoryStream[String]
    ms.addData("""{"user_id":"u1","timestamp":"t","product_id":"p1"}""")
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    def start() = parquetSink(parse(ms.toDF(), "page_view", clock),
      s"$dir/data", s"$dir/chk").trigger(Trigger.AvailableNow()).start()
    val q1 = start(); q1.awaitTermination()
    // restart with NO new data: checkpoint must prevent re-writing batch 0
    val q2 = start(); q2.awaitTermination()
    assert(spark.read.parquet(s"$dir/data").count() === 1)
    // partition layout on disk (hive-style, processing date)
    assert(new java.io.File(s"$dir/data/year=2026/month=8/day=12").exists())
  }

  test("streaming near-dup gate: arriving dups quarantine, clean docs extend the LSH index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_lsh_gate_").toString
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(graft.streaming.Events.lshDedupGateBatch(
        s"$dir/index", s"$dir/clean", s"$dir/dup") _)
      .start()
    // batch 1: two novel docs seed the index
    ms.addData(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "spark engines shuffle data across partitioned executors efficiently"))
    q.processAllAvailable()
    // batch 2: a copy of doc 1 (vs-corpus dup), a novel doc, and an
    // identical pair arriving together (within-batch dup, keep-first)
    ms.addData(
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "novel content entirely unrelated to anything indexed before now"),
      (5L, "identical twin sentences arriving together in one single batch"),
      (6L, "identical twin sentences arriving together in one single batch"))
    q.processAllAvailable(); q.stop()
    def ids(p: String) = spark.read.parquet(p).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids(s"$dir/clean") === Set(1L, 2L, 4L, 5L))
    assert(ids(s"$dir/dup") === Set(3L, 6L))
    // the index holds exactly the clean docs' bands, partitioned by batch
    val index = spark.read.parquet(s"$dir/index")
    assert(index.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 4L, 5L))
    assert(index.count() === 4 * 8) // bands per doc
    assert(index.select("_gate_batch").distinct().count() === 2)
    // quarantined rows carry the batch id for audit
    assert(spark.read.parquet(s"$dir/dup").select("_batch_id")
      .distinct().collect().map(_.getLong(0)).toSet === Set(1L))
    // REPLAY: re-deliver batch 1 verbatim (crash-before-checkpoint) —
    // decisions re-derive, the dynamic partition overwrite rewrites only
    // _gate_batch=1, so the index does NOT grow; the plain-append sinks
    // double, the documented at-least-once caveat
    import spark.implicits._
    val replay = Seq(
      (3L, "the quick brown fox jumps over the lazy dog tonight"),
      (4L, "novel content entirely unrelated to anything indexed before now"),
      (5L, "identical twin sentences arriving together in one single batch"),
      (6L, "identical twin sentences arriving together in one single batch"))
      .toDF("doc_id", "text")
    graft.streaming.Events.lshDedupGateBatch(
      s"$dir/index", s"$dir/clean", s"$dir/dup")(replay, 1L)
    val after = spark.read.parquet(s"$dir/index")
    assert(after.count() === 4 * 8, "replayed batch must not grow the index")
    assert(after.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 4L, 5L))
  }

  test("streaming entity resolution: arrivals fold through foreachBatch, serving equals one-shot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_er_stream_").toString + "/er"
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("c_custkey", "c_name", "c_nationkey").writeStream
      .foreachBatch(graft.operators.IncrementalEr.maintainBatch(dir) _)
      .start()
    // trigger 1: seed records (cat/dog in nation 1)
    ms.addData((10L, "cat", 1L), (30L, "dog", 1L))
    q.processAllAvailable()
    // trigger 2: bat links to standing cat; dog exact twin; unrelated
    ms.addData((5L, "bat", 1L), (31L, "dog", 1L), (77L, "zebra", 2L))
    q.processAllAvailable(); q.stop()
    val got = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 5L, 5L -> 5L, 30L -> 30L, 31L -> 30L,
      77L -> 77L))
    // the stream committed one base partition + one label delta per
    // trigger (append-only), and the delta of trigger 2 is its
    // arrivals plus the one moved standing label (cat 10 -> 5)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(1L))
    val d1 = spark.read.parquet(s"$dir/labels")
      .filter($"_er_batch" === 1L).select("v").as[Long].collect().toSet
    assert(d1 === Set(5L, 31L, 77L, 10L))
  }

  test("streaming ER ops gate: mixed upsert/forget triggers, crash-replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_eropst_").toString + "/er"
    def ops(rows: Seq[(String, Long, String, Long)]) =
      rows.toDF("op", "c_custkey", "c_name", "c_nationkey")
    val gate = graft.streaming.Events.erOpsGateBatch(dir) _
    // trigger 0: three upserts — cat/bat link, dog alone
    gate(ops(Seq(("upsert", 10L, "cat", 1L), ("upsert", 5L, "bat", 1L),
      ("upsert", 30L, "dog", 1L))), 0L)
    // trigger 1: one upsert + forget of the cluster's canonical (5):
    // upsert folds first (rat joins cat/bat via cat), then the forget
    // splits nothing but moves the canonical to the min survivor
    gate(ops(Seq(("upsert", 3L, "rat", 1L), ("forget", 5L, null, 0L))), 1L)
    def served() = graft.operators.IncrementalEr.resolved(spark, dir)
      .select("c_custkey", "canonical_id")
      .as[(Long, Long)].collect().toMap
    val got = served()
    assert(got === Map(3L -> 3L, 10L -> 3L, 30L -> 30L))
    // ids 2b/2b+1: trigger 1 committed artifact ids 2 (maintain) and 3
    // (forget)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(3L))
    // crash-replay: the whole trigger re-runs — both halves no-op
    // through their markers, serving unchanged
    gate(ops(Seq(("upsert", 3L, "rat", 1L), ("forget", 5L, null, 0L))), 1L)
    assert(served() === got)
    assert(graft.operators.IncrementalEr.lastCommitted(spark, dir) === Some(3L))
    // and the gate keeps working after the replay
    gate(ops(Seq(("forget", 30L, null, 0L))), 2L)
    assert(served() === Map(3L -> 3L, 10L -> 3L))
  }

  test("K6: foreachBatch serving-state sink routes views vs cart, partition-local") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    InMemoryKV.clear()
    val ms = MemoryStream[String]
    ms.addData(
      """{"user_id":"u1","timestamp":"t","product_id":"p1"}""",
      """{"user_id":"u1","timestamp":"t","product_id":"p2"}""",
      """{"user_id":null,"timestamp":"t","product_id":"px"}""")
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    val q = parse(ms.toDF(), "page_view", clock).writeStream
      .foreachBatch(servingStateBatch(InMemoryKV, keep = 50) _)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(InMemoryKV.get("user:u1:views").toSet === Set("p1", "p2"))
    assert(InMemoryKV.get("user:u1:cart").isEmpty) // page views never land in cart
    assert(InMemoryKV.get("user:null:views").isEmpty) // null guard held
  }

  test("streaming constraint gate: conforming rows to silver, violators quarantined with attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_gate").toString
    val ms = MemoryStream[(Long, Double)]
    ms.addData((1L, 5.0), (2L, -3.0), (3L, 500.0))
    val rules = Seq(
      "positive" -> (col("v") > 0),
      "small" -> (col("v") < 100))
    val q = ms.toDF().toDF("id", "v").writeStream
      .foreachBatch(constraintGateBatch(s"$dir/silver", s"$dir/quarantine", rules) _)
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/silver").select("id").as[Long].collect().toSet === Set(1L))
    val bad = spark.read.parquet(s"$dir/quarantine").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("_violations")).toMap
    assert(bad === Map(2L -> "positive", 3L -> "small"))
  }

  test("dead-letter split: malformed rows quarantined with raw payload") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(
      """{"user_id":"u1","timestamp":"t","product_id":"p1"}""",
      """total garbage""",
      """{"product_id":"orphan","timestamp":"t"}""")
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    val (good, bad) = parseWithDeadLetter(ms.toDF(), "page_view", clock)
    runToMemory(good, "dl_good"); runToMemory(bad, "dl_bad")
    assert(spark.table("dl_good").count() === 1)
    val badRows = spark.table("dl_bad").collect().map(_.getAs[String]("raw")).toSet
    assert(badRows === Set("total garbage",
      """{"product_id":"orphan","timestamp":"t"}"""))
  }

  test("watermarked tumbling window: in-window counts, late row dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = windowedCounts(
      ms.toDF().toDF("ts", "event_type"), "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    ms.addData((t("2026-01-01 00:01:00"), "view"), (t("2026-01-01 00:02:00"), "view"))
    q.processAllAvailable()
    // advance the watermark far past the first window, then send a LATE row into it
    ms.addData((t("2026-01-01 01:00:00"), "view"))
    q.processAllAvailable()
    ms.addData((t("2026-01-01 00:03:00"), "view")) // late: before watermark
    q.processAllAvailable()
    ms.addData((t("2026-01-01 02:00:00"), "view")) // push watermark to close window 2
    q.processAllAvailable(); q.stop()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    // first window emitted with 2 (late 3rd row dropped by the watermark)
    assert(rows("2026-01-01 00:00:00.0") === 2L)
    assert(rows.contains("2026-01-01 01:00:00.0"))
  }

  test("stream-stream interval join: purchases within 1h of a view match, outside don't") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(java.sql.Timestamp, String)]
    val buys = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val joined = graft.streaming.Events.intervalJoin(
      views.toDF().toDF("vts", "v_user"), "vts", "v_user",
      buys.toDF().toDF("pts", "p_user"), "pts", "p_user",
      window = "1 hour", horizon = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    views.addData((t("2026-01-01 00:00:00"), "u1"), (t("2026-01-01 00:00:00"), "u2"))
    buys.addData(
      (t("2026-01-01 00:30:00"), "u1"),  // in window → match
      (t("2026-01-01 02:00:00"), "u1"),  // outside 1h → no match
      (t("2026-01-01 00:30:00"), "u3"))  // no matching view key
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_out").collect()
      .map(r => (r.getAs[String]("v_user"), r.getTimestamp(2).toString)).toSet
    assert(got === Set(("u1", "2026-01-01 00:30:00.0")))
  }

  test("session_window on a stream: a session emits once the watermark passes its gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = ms.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("session_window.start").as("start"), col("n"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    ms.addData((t("2026-01-01 00:01:00"), "u1"), (t("2026-01-01 00:10:00"), "u1"))
    q.processAllAvailable()
    ms.addData((t("2026-01-01 02:00:00"), "u1")) // watermark passes session 1 → it emits
    q.processAllAvailable()
    ms.addData((t("2026-01-01 05:00:00"), "u1")) // and closes session 2
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess_out").collect()
      .map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
    assert(rows("2026-01-01 00:01:00.0") === 2L) // merged: 00:01 + 00:10 in one session
    assert(rows("2026-01-01 02:00:00.0") === 1L)
  }

  test("dropDuplicatesWithinWatermark: in-horizon dupes collapse, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val q = graft.streaming.Events.dedupWithinWatermark(
        ms.toDF().toDF("ts", "event_id"), "event_id", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    // duplicate within the horizon: second copy dropped
    ms.addData((t("2026-01-01 00:01:00"), "a"), (t("2026-01-01 00:02:00"), "a"),
      (t("2026-01-01 00:02:00"), "b"))
    q.processAllAvailable()
    // advance event time far past the horizon, then REPLAY key "a":
    // its dedup state has been evicted, so the replay passes through —
    // bounded state, at the price of not catching far-apart duplicates
    ms.addData((t("2026-01-01 05:00:00"), "c"))
    q.processAllAvailable()
    ms.addData((t("2026-01-01 05:01:00"), "a"))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getAs[String]("event_id")).toSeq
    assert(ids.count(_ == "a") === 2, s"got $ids") // once per horizon, not thrice
    assert(ids.count(_ == "b") === 1 && ids.count(_ == "c") === 1)
  }

  test("to_json payload round-trips through the from_json parse chain") {
    import spark.implicits._
    val recs = Seq(("u1", "2020-01-01T00:00:00", "p9"))
      .toDF("user_id", "timestamp", "product_id")
    val payload = toKafkaPayload(recs, "user_id")
    assert(payload.columns.toSeq === Seq("key", "value")) // the Kafka contract
    val row = payload.head()
    assert(row.getString(0) === "u1")
    // the serialized value parses back through the SAME event schema
    val back = spark.createDataFrame(java.util.List.of(row),
        payload.schema)
      .select(from_json(col("value"), eventSchemas("page_view")).as("d"))
      .select("d.*").head()
    assert(back.getAs[String]("user_id") === "u1" && back.getAs[String]("product_id") === "p9")
  }

  test("rerank end-to-end: state lists feed the rerank column") {
    import spark.implicits._
    val df = Seq(("u1", Seq("off1", "v1"), Seq("v1", "v2"), Seq("c1")))
      .toDF("user_id", "offline", "views", "cart")
    val out = df.select(col("user_id"),
      rerankCol(col("offline"), col("views"), col("cart")).as("recs"))
      .head().getSeq[String](1)
    assert(out === Seq("c1", "v1", "v2", "off1"))
  }

  test("streaming MERGE into AtomicTable: per-batch atomic upserts, last write per key wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.AtomicTable
    val dir = Files.createTempDirectory("graft_stream_merge_").toString
    val ms = MemoryStream[ItemEvent]
    val latest = ms.toDS().groupByKey(_.user_id)
      .mapGroups((u, evs) => { val e = evs.toSeq.last; (u, e.product_id) })
      .toDF("user_id", "latest_product")
    val q = latest.writeStream
      .foreachBatch(Events.atomicUpsertBatch(dir, "user_id") _)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      ms.addData(ItemEvent("u1", "a", "view"), ItemEvent("u2", "b", "view"))
      q.processAllAvailable()
      ms.addData(ItemEvent("u1", "c", "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = AtomicTable.read(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("u1" -> "c", "u2" -> "b"))
    // each batch was one atomic version; the pre-merge snapshot survives
    assert(AtomicTable.versions(spark, dir).size >= 2)
  }

  test("streaming SCD2 maintenance: per-batch merge ≡ one-shot build, versioned") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Scd2
    import graft.pipeline.AtomicTable
    val dir = Files.createTempDirectory("graft_scd2_stream_").toString
    val b1 = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (2L, 15L, 3L, "X"))
    val b2 = Seq((1L, 30L, 4L, "B"), (3L, 33L, 5L, "N"))
    val b3 = Seq((1L, 50L, 6L, "B"), (2L, 55L, 7L, "Y"))
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = ms.toDF().toDF("user_id", "ts", "event_id", "event_type")
      .writeStream
      .foreachBatch(Events.scd2MaintainBatch(
        dir, "user_id", "ts", "event_id", "event_type") _)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      ms.addData(b1: _*); q.processAllAvailable()
      ms.addData(b2: _*); q.processAllAvailable()
      ms.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "run", "state", "valid_from", "valid_to")
        .orderBy("user_id", "run").collect().toSeq
    val oneShot = Scd2.build((b1 ++ b2 ++ b3)
      .toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
    assert(canon(AtomicTable.read(spark, dir)) === canon(oneShot))
    // one committed version per non-empty batch: dimension-as-of time travel
    assert(AtomicTable.versions(spark, dir).size === 3)
  }

  test("stream-static enrich: micro-batches broadcast-join the static dim; unmatched keys survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(
      """{"user_id":"u1","timestamp":"t","product_id":"p1"}""",
      """{"user_id":"u2","timestamp":"t","product_id":"p_unknown"}""")
    val dim = Seq(("p1", "Widget", 9.99)).toDF("product_id", "name", "price")
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    runToMemory(
      Events.enrichStream(parse(ms.toDF(), "page_view", clock), dim, "product_id")
        .select("user_id", "product_id", "name", "price"),
      "enriched")
    val rows = spark.table("enriched").collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(rows === Map("u1" -> Some("Widget"), "u2" -> None))
  }

  test("4-topic topology: per-topic checkpoints are independent — kill one, others progress, it resumes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_topo_").toString
    val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
    def pv(i: Int) = s"""{"user_id":"u$i","timestamp":"t","product_id":"p$i"}"""
    def cart(i: Int) = s"""{"user_id":"u$i","timestamp":"t","product_id":"p$i","quantity":1}"""

    val streams = EventTypes.map(_ -> MemoryStream[String]).toMap
    streams("page_view").addData(pv(1)); streams("add_to_cart").addData(cart(1))
    streams("purchase").addData(
      """{"user_id":"u1","timestamp":"t","order_id":"o1","product_id":"p1","quantity":1,"price":1.0}""")
    streams("review").addData(
      """{"user_id":"u1","timestamp":"t","product_id":"p1","rating":5}""")
    val queries = Events.multiTopicFlow(
      streams.map { case (t, ms) => t -> ms.toDF() }, dir, InMemoryKV, clock,
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    try {
      // the reference's topology: 4 bronze + 2 kv + 2 rerank queries
      assert(queries.length === 8)
      queries.foreach(_.processAllAvailable())
      def bronzeCount(t: String): Long =
        spark.read.parquet(s"$dir/bronze/brz_${t}_event").count()
      assert(EventTypes.forall(bronzeCount(_) === 1L))

      // kill ONLY the page_view bronze query; every other query keeps
      // consuming — independent checkpoints, independent progress
      val pvBronze = queries.find(_.name == "bronze_page_view").get
      pvBronze.stop(); pvBronze.awaitTermination()
      streams("page_view").addData(pv(2), pv(3))
      streams("add_to_cart").addData(cart(2))
      queries.filter(_.isActive).foreach(_.processAllAvailable())
      assert(bronzeCount("add_to_cart") === 2L, "live topic must progress")
      assert(bronzeCount("page_view") === 1L, "stopped query must not")
      // the realtime sinks of page_view are separate queries — still live
      assert(spark.read.parquet(s"$dir/rerank/page_view").count() === 3L)

      // restart the killed query from ITS checkpoint: it catches up on
      // exactly the rows it missed, nothing reprocessed (file-sink log)
      val restarted = Events.parse(streams("page_view").toDF(), "page_view", clock)
        .writeStream.format("parquet")
        .option("path", s"$dir/bronze/brz_page_view_event")
        .option("checkpointLocation", s"$dir/chk/page_view")
        .partitionBy("year", "month", "day")
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
      restarted.processAllAvailable()
      assert(bronzeCount("page_view") === 3L, "resumed query must catch up exactly")
      restarted.stop()
    } finally queries.filter(_.isActive).foreach(_.stop())
  }

  test("streaming session_window: watermark closes sessions in append mode; late event merges pre-watermark sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)] // (user, epoch seconds)
    val sessions = ms.toDF().toDF("user_id", "sec")
      .withColumn("ts_t", timestamp_seconds(col("sec")))
      .withWatermark("ts_t", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts_t"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("s0"),
        unix_timestamp(col("session_window.end")).as("s1"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // two events 10 min apart extend ONE session; a third arrives in
      // a later batch still inside the gap, so the session must merge
      // across micro-batches, not emit per-batch fragments
      ms.addData(("u1", 1000L), ("u1", 1600L))
      q.processAllAvailable()
      ms.addData(("u1", 2800L))
      q.processAllAvailable()
      // nothing may be emitted yet: the watermark hasn't passed the
      // open session's end, append mode holds it as state
      assert(spark.table("sess_stream").isEmpty)
      // an event far in the future advances the watermark past the
      // session end -> the closed session finally emits, merged
      ms.addData(("u2", 100000L))
      q.processAllAvailable()
      ms.addData(("u2", 200000L)) // push watermark again to flush u2's first
      q.processAllAvailable()
      val rows = spark.table("sess_stream")
        .select("user_id", "s0", "s1", "n_events")
        .as[(String, Long, Long, Long)].collect().toSet
      // one merged u1 session: [1000, 2800 + 1800), 3 events
      assert(rows.contains(("u1", 1000L, 4600L, 3L)), rows)
    } finally q.stop()
  }

  test("streaming CUSUM: per-batch fold ≡ one-shot recursion, replay-guarded, monotone-enforced") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cusum_stream_").toString
    val stateDir = s"$root/state"
    val outDir = s"$root/out"
    val run = Events.cusumMonitorBatch(stateDir, outDir, "t", "v",
      mu = 100L, slack = 5L, threshold = 50L) _
    val b0 = Seq((1L, 130L), (2L, 90L)).toDF("t", "v")
    val b1 = Seq((3L, 200L), (4L, 10L)).toDF("t", "v")
    run(b0, 0L)
    run(b1, 1L)
    def out: Seq[(Long, Long, Long, Int)] =
      spark.read.parquet(outDir).select("t", "v", "cusum", "alarm")
        .as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    // the q197 recursion folded across the batch boundary:
    // s=max(0,0+130−105)=25, max(0,25+90−105)=10,
    // max(0,10+200−105)=105 (alarm: >50), max(0,105+10−105)=10
    assert(out === Seq((1L, 130L, 25L, 0), (2L, 90L, 10L, 0),
      (3L, 200L, 105L, 1), (4L, 10L, 10L, 0)))
    // foreachBatch re-delivery of the applied batch: short-circuits on
    // the recorded batch id — no duplicate out rows, state unchanged
    run(b1, 1L)
    assert(out.size === 4)
    val st = graft.pipeline.AtomicTable.read(spark, stateDir).collect().head
    assert(st.getAs[Long]("s") === 10L && st.getAs[Long]("last_t") === 4L
      && st.getAs[Long]("last_batch") === 1L)
    // a NEW batch id carrying an already-folded t is corruption, not
    // replay — it must fail loudly, not silently re-fold
    intercept[IllegalArgumentException] { run(Seq((4L, 1L)).toDF("t", "v"), 2L) }
    // tied t WITHIN one batch is the same corruption (the head-vs-
    // last_t check alone can't see it; both rows would silently fold)
    intercept[IllegalArgumentException] {
      run(Seq((7L, 1L), (7L, 2L)).toDF("t", "v"), 2L)
    }
    // and the failed batches must not have advanced the state
    val st2 = graft.pipeline.AtomicTable.read(spark, stateDir).collect().head
    assert(st2.getAs[Long]("last_batch") === 1L)
  }
}
