package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.sources.Sources

/** S5 CSV / S6 JSONL (batch + file-stream) source semantics. */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("price", DoubleType)))

  test("S5: CSV with header + explicit schema (the COPY-FROM-CSV twin)") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("seed.csv"),
      "id,name,price\n1,widget,9.99\n2,gadget,19.50\n")
    val df = Sources.csv(spark, dir.toString, schema)
    assert(df.schema === schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 2 && rows(0).getString(1) === "widget"
      && rows(1).getDouble(2) === 19.50)
  }

  test("S6 batch: JSONL with explicit schema; malformed line -> permissive nulls") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("events.jsonl"),
      """{"id":1,"name":"a","price":1.5}""" + "\n" + "}{bad" + "\n")
    val df = Sources.jsonl(spark, dir.toString, schema)
    assert(df.count() === 2)
    assert(df.filter(col("id").isNotNull).count() === 1)
  }

  test("S6 stream: JSONL drop-dir feeds the same parse-chain plan") {
    val dir = Files.createTempDirectory("graft_jstream")
    Files.writeString(dir.resolve("b1.jsonl"),
      """{"id":1,"name":"a","price":1.5}""" + "\n" + """{"id":2,"name":"b","price":2.5}""" + "\n")
    val q = Sources.jsonlStream(spark, dir.toString, schema)
      .withColumn("total", col("price") * 2)
      .writeStream.format("memory").queryName("jsonl_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("jsonl_out").count() === 2)
    assert(spark.table("jsonl_out").agg(sum("total")).head().getDouble(0) === 8.0)
  }

  test("nanosToTimestamp: event ts longs convert to calendar time") {
    val r = Tables.events(spark, sf)
      .select(Cols.nanosToTimestamp(col("ts")).as("t"))
      .agg(min(year(col("t"))), max(year(col("t")))).head()
    assert(r.getInt(0) === 2024 && r.getInt(1) === 2024)
  }

  test("DSv2 connector: partition planning, deterministic rows, idempotent re-read") {
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", "10000").option("parts", "8").load()
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)
    // rows are a pure function of id → re-reading any slice is identical
    val a = df.filter(col("id") < 100).collect().map(_.toSeq).toSet
    val b = df.filter(col("id") < 100).collect().map(_.toSeq).toSet
    assert(a === b && a.size === 100)
    val row = df.filter(col("id") === 7).head()
    assert(row.getLong(1) === 7L && row.getString(2) === "cart" &&
      row.getDouble(3) === 0.07)
  }

  test("DSv2 connector: column pruning reaches the reader") {
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", "100").option("parts", "2").load()
      .select("user_id")
    // the BatchScan leaf's output IS the pruned schema — the reader
    // materializes only this column
    val leafCols = df.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(leafCols === Seq("user_id"))
    assert(df.distinct().count() === 100)
  }

  test("DSv2 connector: id-range filters push into partition planning (JDBC-WHERE shape)") {
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", "10000").option("parts", "8").load()
    val sliced = df.filter(col("id") >= 9990 && col("id") < 10000)
    // the readers generate ONLY the filtered range: 10 rows at <=1250
    // rows/partition means far fewer than the unfiltered 8 partitions
    assert(sliced.rdd.getNumPartitions < 8,
      "pushed range must narrow partition planning, not just post-filter")
    assert(sliced.collect().map(_.getLong(0)).sorted.toSeq === (9990L until 10000L))
    // a non-id predicate is rejected back to Spark and still correct
    val mixed = df.filter(col("id") < 10 && col("event_type") === "view")
    assert(mixed.collect().map(_.getLong(0)).toSet === Set(0L, 5L))
  }

  test("DSv2 connector: Long.MaxValue boundary literals don't wrap the pushed range") {
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", "100").option("parts", "2").load()
    // x + 1 on the exclusive-bound conversion would wrap MaxValue to
    // MinValue: `<=` returned an empty scan, `>` returned all rows.
    // Overflowing bounds must be rejected back to Spark, which then
    // evaluates them correctly post-scan.
    assert(df.filter(col("id") <= Long.MaxValue).count() === 100)
    assert(df.filter(col("id") > Long.MaxValue).count() === 0)
    assert(df.filter(col("id") === Long.MaxValue).count() === 0)
    // non-boundary pushdown still narrows as before
    assert(df.filter(col("id") <= 9).count() === 10)
  }

  test("DSv2 randomized pushdown equivalence: accepted ranges return exactly the model rows") {
    val rows = 500L
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("parts", "4").load()
    val rnd = new scala.util.Random(7)
    // random bounds straddling the table edges, all five comparison ops —
    // an accepted DSv2 filter is never re-checked by Spark, so the scan
    // must agree with the reference model on every case
    (1 to 40).foreach { _ =>
      val b = rnd.nextLong(rows + 200) - 100
      val (pred, model) = rnd.nextInt(5) match {
        case 0 => (col("id") < b, (i: Long) => i < b)
        case 1 => (col("id") <= b, (i: Long) => i <= b)
        case 2 => (col("id") > b, (i: Long) => i > b)
        case 3 => (col("id") >= b, (i: Long) => i >= b)
        case 4 => (col("id") === b, (i: Long) => i == b)
      }
      val got = df.filter(pred).select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = (0L until rows).filter(model)
      assert(got === want, s"bound=$b pred=$pred")
    }
  }

  test("DSv2 streaming: AvailableNow drains the range in admission-controlled micro-batches through the Events parse chain") {
    val stream = spark.readStream.format("graft.sources.SynthSource")
      .option("rows", "1000").option("parts", "4").option("batchrows", "250").load()
    // shape the synthetic events like a Kafka payload and run the REAL
    // parse chain over them — the wiring a production Kafka source gets
    val kafkaShaped = stream.select(to_json(struct(
      concat(lit("anonymous_"), col("user_id").cast("string")).as("user_id"),
      col("ts").cast("string").as("timestamp"),
      concat(lit("P"), (col("id") % 100).cast("string")).as("product_id")))
      .cast("binary").as("value"))
    val parsed = graft.streaming.Events.parse(kafkaShaped, "page_view")
    val q = parsed.writeStream.format("memory").queryName("synth_stream_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("synth_stream_out")
    assert(out.count() === 1000)
    assert(out.columns.toSet === Set("user_id", "timestamp", "product_id",
      "event_type", "year", "month", "day"))
    assert(out.select("user_id").distinct().count() === 1000)
    assert(out.filter(col("event_type") =!= "page_view").count() === 0)
    // admission control: 1000 ids / 250 per trigger = 4 micro-batches
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches === 4, s"expected 4 admission-controlled batches, saw $batches")
  }

  test("DSv2 streaming: restart resumes from the checkpointed offset, no replay") {
    val dir = Files.createTempDirectory("graft_synth_stream_").toString
    def run(rows: String): Unit = {
      val s = spark.readStream.format("graft.sources.SynthSource")
        .option("rows", rows).option("parts", "2").option("batchrows", "100").load()
      val q = s.select("id").writeStream.format("parquet")
        .option("path", s"$dir/data").option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run("300")
    assert(spark.read.parquet(s"$dir/data").count() === 300)
    // "more data arrived": the same source now has 800 ids; the restart
    // must pick up at offset 300 — 800 total, zero duplicates
    run("800")
    val ids = spark.read.parquet(s"$dir/data")
    assert(ids.count() === 800)
    assert(ids.distinct().count() === 800)
  }

  test("DSv2 streaming write: one manifest per epoch; all epochs visible; end-to-end connector loop") {
    import graft.sources.CommitSink
    val dir = Files.createTempDirectory("graft_commit_stream_").toString
    // full DSv2 loop: streaming READ (SynthSource micro-batches) into
    // streaming WRITE (CommitSink epochs) — 500 ids at 200/trigger = 3 epochs
    val stream = spark.readStream.format("graft.sources.SynthSource")
      .option("rows", "500").option("parts", "2").option("batchrows", "200").load()
    val q = stream.select(col("id"), col("event_type"))
      .writeStream.format("graft.sources.CommitSink")
      .option("path", s"$dir/data").option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("event_type", StringType)))
    val got = CommitSink.read(spark, s"$dir/data", schema)
    assert(got.count() === 500)
    assert(got.select("id").distinct().count() === 500)
    val manifests = new java.io.File(s"$dir/data").listFiles
      .filter(_.getName.startsWith("manifest-"))
    assert(manifests.length === 3,
      s"expected one manifest per epoch (3), saw ${manifests.length}")
  }

  test("DSv2 streaming write: failed epoch publishes nothing; prior epochs stay visible") {
    import graft.sources.CommitSink
    val dir = Files.createTempDirectory("graft_commit_fail_").toString
    // epoch 0 commits cleanly (one 100-id batch); then the poisoned
    // writer (failpartition) kills epoch 1 mid-flight
    def run(rows: String, failPartition: Option[Int]): Either[Throwable, Unit] = {
      val s = spark.readStream.format("graft.sources.SynthSource")
        .option("rows", rows).option("parts", "2").option("batchrows", "100").load()
      val w = s.select(col("id"), col("event_type"))
        .writeStream.format("graft.sources.CommitSink")
        .option("path", s"$dir/data").option("checkpointLocation", s"$dir/chk")
      val q = failPartition.fold(w)(p => w.option("failpartition", p.toString))
        .trigger(Trigger.AvailableNow()).start()
      try { q.awaitTermination(120000); Right(()) }
      catch { case e: Throwable => Left(e) }
    }
    assert(run("100", None).isRight)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("event_type", StringType)))
    assert(CommitSink.read(spark, s"$dir/data", schema).count() === 100)
    // second run sees 100 more ids; its single epoch fails in partition 1
    assert(run("200", Some(1)).isLeft, "poisoned epoch must fail the query")
    val after = CommitSink.read(spark, s"$dir/data", schema)
    assert(after.count() === 100, "failed epoch must be invisible to readers")
    // nothing half-published: every surviving manifest belongs to run 1
    val files = new java.io.File(s"$dir/data").listFiles.map(_.getName)
    assert(files.count(_.startsWith("manifest-")) === 1)
  }

  test("DSv2 streaming write: epoch re-commit is idempotent (replay after restart)") {
    import graft.sources.CommitSink
    val dir = Files.createTempDirectory("graft_commit_epoch_").toString
    def taskFile(name: String, rows: Seq[String]): String = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val original = taskFile("task-q1-7-0-1.tsv", Seq("1\tview", "2\tcart"))
    assert(CommitSink.publishEpoch(dir, "q1", 7L, Seq(original)))
    // replayed epoch: fresh task files, same (queryId, epoch) — the
    // publish must lose and the sink then deletes its duplicates
    val replay = taskFile("task-q1-7-0-9.tsv", Seq("1\tview", "2\tcart"))
    assert(!CommitSink.publishEpoch(dir, "q1", 7L, Seq(replay)))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(replay))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("event_type", StringType)))
    val got = CommitSink.read(spark, dir, schema)
    assert(got.count() === 2, "replayed epoch must not duplicate rows")
    // the standing manifest still names the ORIGINAL task file
    val manifest = java.nio.file.Paths.get(dir, "manifest-q1-7")
    assert(new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8") === original)
  }

  test("ORC tier: round-trip preserves values; filters push into the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    val src = Tables.customer(spark, sf).select("c_custkey", "c_name", "c_acctbal")
    Sources.writeOrc(src, dir)
    val back = Sources.orc(spark, dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    val filtered = back.filter(col("c_custkey") <= 10).select("c_custkey")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), LessThanOrEqual(c_custkey,10)]"),
      s"ORC scan must carry the pushed filter:\n$plan")
    assert(filtered.count() ===
      src.filter(col("c_custkey") <= 10).count())
    // value-level parity with the parquet original
    val a = src.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("CACHE tier: a cached table reads from InMemoryTableScan and uncaches cleanly") {
    val df = Tables.nation(spark, sf)
    df.createOrReplaceTempView("nation_cache_probe")
    spark.catalog.cacheTable("nation_cache_probe")
    try {
      val q = spark.table("nation_cache_probe").filter(col("n_regionkey") === 0)
      q.count() // materialize the cache
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryRelation"),
        s"expected the cached relation in the plan:\n$plan")
      assert(spark.catalog.isCached("nation_cache_probe"))
    } finally {
      spark.catalog.uncacheTable("nation_cache_probe")
      assert(!spark.catalog.isCached("nation_cache_probe"))
    }
  }

  test("DSv2 write: two-phase commit round-trips; appends are isolated jobs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val df = spark.range(1000).repartition(8)
      .selectExpr("id", "concat('n', id) AS name")
    df.write.format("graft.sources.CommitSink").option("path", dir).mode("append").save()
    val back = graft.sources.CommitSink.read(spark, dir, schema)
    assert(back.count() === 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) === 499500L)
    // a second job appends its own manifest; both stay visible
    spark.range(5).selectExpr("id + 1000 AS id", "'x' AS name")
      .write.format("graft.sources.CommitSink").option("path", dir).mode("append").save()
    assert(graft.sources.CommitSink.read(spark, dir, schema).count() === 1005)
    assert(new java.io.File(dir).listFiles.count(_.getName.startsWith("manifest-")) === 2)
  }

  test("DSv2 write: a failing task aborts the whole job — nothing becomes visible") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_fail_").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    intercept[Exception] {
      spark.range(1000).repartition(8).toDF("id")
        .write.format("graft.sources.CommitSink")
        .option("path", dir).option("failpartition", "3").mode("append").save()
    }
    // no manifest published ⇒ zero rows observed, task temp files aborted
    assert(graft.sources.CommitSink.read(spark, dir, schema).isEmpty)
    assert(new java.io.File(dir).listFiles.count(_.getName.startsWith("manifest-")) === 0)
  }
}
