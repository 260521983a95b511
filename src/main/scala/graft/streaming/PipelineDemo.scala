package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Sessions

/** Runnable end-to-end wiring of the streaming layer — the
  * MemoryStream-driven twin of the reference's Kafka flow
  * (/root/reference/scripts/spark_jobs/streaming_flow.py:170-238):
  * source → parse chain → (a) partitioned parquet bronze sink with
  * checkpoint, (b) foreachBatch serving-state sink, (c) stateful
  * bounded per-user lists → rerank. Swap MemoryStream for
  * `readStream.format("kafka")` and InMemoryKV for a Redis-backed
  * KVStore and this is the production job.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft_stream_demo").toString
    val clock = lit(java.sql.Date.valueOf(java.time.LocalDate.now().toString)).cast("timestamp")

    // ---- source (Kafka-shaped: a `value` column) --------------------
    val ms = MemoryStream[String]
    ms.addData(
      """{"user_id":"u1","timestamp":"2020-01-01T00:00:00","product_id":"p1"}""",
      """{"user_id":"u1","timestamp":"2020-01-01T00:01:00","product_id":"p2"}""",
      """{"user_id":"u2","timestamp":"2020-01-01T00:02:00","product_id":"p9"}""",
      """garbage that is not json""")
    val parsed = Events.parse(ms.toDF(), "page_view", clock)

    // ---- sink K5: bronze parquet, processing-time partitions --------
    val q1 = Events.parquetSink(parsed, s"$dir/bronze", s"$dir/chk_bronze")
      .trigger(Trigger.AvailableNow()).start()
    // ---- sink K6: serving state, partition-local --------------------
    val q2 = parsed.writeStream
      .foreachBatch(Events.servingStateBatch(Events.InMemoryKV, keep = 50) _)
      .option("checkpointLocation", s"$dir/chk_kv")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(); q2.awaitTermination()

    println(s"[demo] bronze rows: ${spark.read.parquet(s"$dir/bronze").count()}")
    println(s"[demo] bronze partitions: " +
      new java.io.File(s"$dir/bronze").listFiles().map(_.getName).filter(_.startsWith("year=")).mkString(","))
    println(s"[demo] u1 views: ${Events.InMemoryKV.get("user:u1:views")}")

    // ---- the FULL 4-topic topology (streaming_flow.py:170-238) ------
    // 4 event types × (bronze sink + realtime sinks for page_view and
    // add_to_cart) = 8 concurrent queries, each with its own checkpoint,
    // driven to completion under the reference's awaitAnyTermination.
    Events.InMemoryKV.clear()
    val topicStreams = Events.EventTypes.map(_ -> MemoryStream[String]).toMap
    topicStreams("page_view").addData(
      """{"user_id":"u7","timestamp":"t","product_id":"p1"}""")
    topicStreams("add_to_cart").addData(
      """{"user_id":"u7","timestamp":"t","product_id":"p2","quantity":2}""")
    topicStreams("purchase").addData(
      """{"user_id":"u8","timestamp":"t","order_id":"o1","product_id":"p2","quantity":1,"price":9.5}""")
    topicStreams("review").addData(
      """{"user_id":"u9","timestamp":"t","product_id":"p1","rating":4}""")
    spark.streams.resetTerminated() // q1/q2 above already finished
    val flow = Events.multiTopicFlow(
      topicStreams.map { case (t, ms) => t -> ms.toDF() }, s"$dir/topo",
      Events.InMemoryKV, clock)
    spark.streams.awaitAnyTermination() // the reference's driver call
    flow.foreach(_.awaitTermination())  // AvailableNow: all drain
    Events.EventTypes.foreach { t =>
      val n = spark.read.parquet(s"$dir/topo/bronze/brz_${t}_event").count()
      println(s"[demo] topo bronze[$t]: $n rows")
    }
    println(s"[demo] topo rerank payloads: " +
      spark.read.parquet(s"$dir/topo/rerank/page_view").count() + " + " +
      spark.read.parquet(s"$dir/topo/rerank/add_to_cart").count())
    println(s"[demo] topo u7 views/cart: ${Events.InMemoryKV.get("user:u7:views")} / " +
      s"${Events.InMemoryKV.get("user:u7:cart")}")

    // ---- W2 stateful bounded lists + U1 rerank ----------------------
    val items = MemoryStream[Events.ItemEvent]
    items.addData(Events.ItemEvent("u1", "a", "view"), Events.ItemEvent("u1", "b", "view"))
    val q3 = Events.boundedRecentItems(items.toDS(), keep = 3).writeStream
      .format("memory").queryName("demo_state").outputMode("update").start()
    q3.processAllAvailable()
    items.addData(Events.ItemEvent("u1", "c", "view"), Events.ItemEvent("u1", "d", "view"))
    q3.processAllAvailable(); q3.stop()
    val state = spark.table("demo_state").as[Events.UserItems].collect()
      .filter(_.user_id == "u1").last
    println(s"[demo] u1 bounded state (keep=3): ${state.items}")
    println(s"[demo] u1 rerank: " +
      Events.rerank(offline = Seq("off1", "a"), views = state.items, cart = Seq("c1")))

    // ---- W2 TTL (Redis EXPIRE twin): idle state evicts ---------------
    // 1s TTL; u1's list from batch 1 must be GONE by batch 3, so the
    // re-appearing u1 starts fresh instead of accumulating. NOTE: a
    // ProcessingTimeTimeout query with the default 0ms trigger busy-
    // loops on empty timeout batches and processAllAvailable never
    // settles — give it a real trigger interval and poll the sink.
    val tItems = MemoryStream[Events.ItemEvent]
    val q4 = Events.boundedRecentItems(tItems.toDS(), keep = 5, ttl = Some("1 second"))
      .writeStream.format("memory").queryName("demo_ttl").outputMode("update")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    def u1Lists() = spark.table("demo_ttl").as[Events.UserItems].collect()
      .filter(_.user_id == "u1").map(_.items).toList
    def awaitU1(n: Int): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (u1Lists().size < n && System.nanoTime() < deadline) Thread.sleep(100)
    }
    tItems.addData(Events.ItemEvent("u1", "old1", "view"))
    awaitU1(1)
    Thread.sleep(2500) // let the TTL lapse (timeout batches fire on the trigger)
    tItems.addData(Events.ItemEvent("u1", "new1", "view"))
    awaitU1(2); q4.stop()
    println(s"[demo] u1 lists across TTL lapse: ${u1Lists()} (expect List(old1) then List(new1))")

    // ---- dead-letter split: quarantine malformed payloads ------------
    val dlms = MemoryStream[String]
    dlms.addData(
      """{"user_id":"u1","timestamp":"t","product_id":"p1"}""",
      "junk{{",
      """{"timestamp":"t","product_id":"orphan"}""")
    val (goodS, badS) = Events.parseWithDeadLetter(dlms.toDF(), "page_view", clock)
    val q5 = goodS.writeStream.format("memory").queryName("demo_dl_good")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q6 = badS.writeStream.format("memory").queryName("demo_dl_bad")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q5.awaitTermination(); q6.awaitTermination()
    println(s"[demo] dead-letter: good=${spark.table("demo_dl_good").count()} " +
      s"bad=${spark.table("demo_dl_bad").select("raw").as[String].collect().toList}")

    // ---- W2 on the Spark 4 transformWithState API (RocksDB store) ----
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", Events.RocksDbProvider)
    val twsItems = MemoryStream[Events.ItemEvent]
    val q7 = Events.boundedRecentItemsV2(twsItems.toDS(), keep = 3).writeStream
      .format("memory").queryName("demo_tws").outputMode("update").start()
    twsItems.addData(Events.ItemEvent("u1", "a", "view"), Events.ItemEvent("u1", "b", "view"))
    q7.processAllAvailable()
    twsItems.addData(Events.ItemEvent("u1", "c", "view"), Events.ItemEvent("u1", "d", "view"))
    q7.processAllAvailable(); q7.stop()
    println(s"[demo] transformWithState u1 (keep=3): " +
      spark.table("demo_tws").as[Events.UserItems].collect()
        .filter(_.user_id == "u1").last.items)

    // ---- K7 payload shape: rerank result -> Kafka key/value ----------
    val recs = Seq(("u1", Seq("c1", "v1", "off1"))).toDF("user_id", "recommendations")
    val payload = Events.toKafkaPayload(recs, "user_id").head()
    println(s"[demo] kafka payload: key=${payload.getString(0)} value=${payload.getString(1)}")

    // ---- monitoring tier: KMV sketch + CUSUM maintained per batch ----
    val kmvStream = MemoryStream[(String, Long)]
    val q8 = kmvStream.toDF().toDF("etype", "user").writeStream
      .foreachBatch(Events.kmvSketchMaintainBatch(s"$dir/kmv", "etype", "user", 64) _)
      .outputMode("update").start()
    kmvStream.addData(("view", 1L), ("view", 2L), ("buy", 1L))
    q8.processAllAvailable()
    kmvStream.addData(("view", 3L), ("buy", 1L))
    q8.processAllAvailable(); q8.stop()
    val ests = graft.functions.Kmv.groupEstimates(
      graft.pipeline.AtomicTable.read(spark, s"$dir/kmv"), "etype", "g_h40", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[demo] kmv distinct-user estimates after 2 batches: $ests")

    val cusumStream = MemoryStream[(Long, Long)]
    val q9 = cusumStream.toDF().toDF("t", "v").writeStream
      .foreachBatch(Events.cusumMonitorBatch(
        s"$dir/cusum_state", s"$dir/cusum_out", "t", "v",
        mu = 100L, slack = 5L, threshold = 50L) _)
      .outputMode("update").start()
    cusumStream.addData((1L, 130L), (2L, 90L))
    q9.processAllAvailable()
    cusumStream.addData((3L, 200L), (4L, 10L))
    q9.processAllAvailable(); q9.stop()
    val alarms = spark.read.parquet(s"$dir/cusum_out")
      .orderBy("t").select("t", "cusum", "alarm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    println(s"[demo] cusum (t, s, alarm) stream: $alarms")
    spark.stop()
  }
}
