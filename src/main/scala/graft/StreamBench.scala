package graft

import org.apache.spark.sql.functions._

import graft.streaming.Events

/** Streaming-throughput bench (r12 verdict item 6: "the streaming tier
  * is spec-green but never measured"): drive the reference's FULL
  * 4-topic topology ([[Events.multiTopicFlow]] — 4 bronze parquet
  * sinks + 2 serving-state foreachBatch sinks + 2 rerank payload
  * sinks, 8 concurrent queries with independent checkpoints) over a
  * generated N-event fixture with `Trigger.AvailableNow`, and report
  * events/second end-to-end (JSON parse → flatten → partition-derive →
  * all sinks committed).
  *
  * Method: events are generated FIRST (unmeasured) as text files —
  * the file source presents the same one-`value`-column contract as
  * the Kafka source, so the measured path is byte-identical to
  * production minus the broker. The clock stops when every query's
  * AvailableNow terminates, i.e. all 8 checkpoints committed. The mix
  * is the reference's shape: 60% page_view / 20% add_to_cart /
  * 15% purchase / 5% review — realtime types pass 3 sinks each, so
  * ~80% of events are written three times.
  *
  * Prints ONE JSON line and writes target/stream_bench.json.
  * Env: SPARK_GRAFT_STREAM_EVENTS (default 400000),
  * SPARK_GRAFT_CPUS (default 32).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "400000").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val root = graft.pipeline.TempDirs.scoped("graft_streambench_")
    val mix = Seq("page_view" -> 60, "add_to_cart" -> 20,
      "purchase" -> 15, "review" -> 5)
    // fixture generation (unmeasured): JSON rows per type, 32 files
    // each so the file source parallelizes the way a partitioned topic
    // would
    mix.foreach { case (etype, pct) =>
      val rows = n.toLong * pct / 100
      val base = spark.range(rows).select(
        concat(lit("u"), pmod(col("id"), lit(5000L))).as("user_id"),
        lit("2026-08-15T12:00:00").as("timestamp"),
        concat(lit("p"), pmod(col("id") * 7L, lit(20000L))).as("product_id"),
        (pmod(col("id"), lit(5L)) + 1L).cast("int").as("quantity"),
        concat(lit("o"), col("id")).as("order_id"),
        (pmod(col("id"), lit(995L)).cast("double") / 10.0).as("price"),
        (pmod(col("id"), lit(5L)) + 1L).cast("int").as("rating"))
      val payload = etype match {
        case "page_view" => base.select(to_json(struct(
          col("user_id"), col("timestamp"), col("product_id"))).as("value"))
        case "add_to_cart" => base.select(to_json(struct(
          col("user_id"), col("timestamp"), col("product_id"),
          col("quantity"))).as("value"))
        case "purchase" => base.select(to_json(struct(
          col("user_id"), col("timestamp"), col("order_id"),
          col("product_id"), col("quantity"), col("price"))).as("value"))
        case "review" => base.select(to_json(struct(
          col("user_id"), col("timestamp"), col("product_id"),
          col("rating"))).as("value"))
      }
      payload.repartition(32).write.mode("overwrite")
        .text(s"$root/in/$etype")
    }
    val sources = mix.map { case (etype, _) =>
      etype -> spark.readStream.format("text")
        .option("maxFilesPerTrigger", "32")
        .load(s"$root/in/$etype")
    }.toMap
    val clock = lit(java.sql.Date.valueOf("2026-08-15")).cast("timestamp")
    Events.InMemoryKV.clear()
    // per-sink-family attribution (r13 advice item 8): the topology
    // gate is total events/s; when it trips, these localize WHICH
    // sink family regressed. Accumulated through a
    // StreamingQueryListener DURING the run — `recentProgress` is a
    // bounded ring buffer (numRecentProgressUpdates, default 100), so
    // summing it after the fact silently undercounts any query with
    // more than 100 triggers (r14 advice item 2). Busy time is the
    // sum of triggerExecution durations across batches (concurrent
    // queries overlap, so busy sums exceed wall — that's utilization,
    // not double-counting), rolled up by the queryName prefix
    // (bronze_/kv_/rerank_).
    val acc = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    // monotone event counter for the drain probe below: a queued
    // progress event with ZERO input rows but nonzero triggerExecution
    // would not move the row total, so draining on rows alone could
    // stop while busy-time events are still in flight (r15 advice)
    val nEvents = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        acc.merge(Option(p.name).getOrElse("unnamed"), (d, p.numInputRows),
          (a, b) => (a._1 + b._1, a._2 + b._2))
        nEvents.incrementAndGet()
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val queries = Events.multiTopicFlow(sources, s"$root/out",
      Events.InMemoryKV, clock)
    queries.foreach(_.awaitTermination())
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events post asynchronously — drain until the MONOTONE
    // event count goes quiet (bounded) before reading the accumulator
    var drained = -1L
    var spins = 0
    while (spins < 50 && {
      val now = nEvents.get()
      val changed = now != drained; drained = now; changed
    }) { Thread.sleep(100); spins += 1 }
    spark.streams.removeListener(listener)
    val perQuery = queries.map { q =>
      val name = Option(q.name).getOrElse("unnamed")
      val (busy, rows) = acc.getOrDefault(name, (0L, 0L))
      (name, busy, rows)
    }
    val families = perQuery.groupBy(_._1.takeWhile(_ != '_')).toSeq.sortBy(_._1)
      .map { case (fam, qs) =>
        s""""$fam":{"busy_sec":${BigDecimal(qs.map(_._2).sum / 1e3)
          .setScale(1, BigDecimal.RoundingMode.HALF_UP)},"input_rows":${qs.map(_._3).sum}}"""
      }
    val sinksJson = families.mkString("{", ",", "}")
    val total = mix.map { case (_, pct) => n.toLong * pct / 100 }.sum
    // sanity: every event landed in its bronze sink exactly once
    val bronze = mix.map { case (etype, _) =>
      spark.read.parquet(s"$root/out/bronze/brz_${etype}_event").count()
    }.sum
    require(bronze == total, s"bronze rows $bronze != generated $total")
    val eps = total / wall
    def r1(x: Double) = BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    // Throughput gate (the bench_baseline.json discipline for the
    // streaming tier): stream_baseline.json holds the committed
    // min-of-N quiet-box events/s; a run below half of it fails the
    // main, so a topology regression cannot hide behind "spec-green".
    // 0.5 mirrors the batch tier's 2× wall-time budget.
    val basePath = java.nio.file.Paths.get("stream_baseline.json")
    val baseline = if (java.nio.file.Files.exists(basePath)) {
      val txt = java.nio.file.Files.readString(basePath)
      val m = """"value"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
      m.map(_.group(1).toDouble)
    } else None
    val vsBase = baseline.map(b => s""","baseline":${r1(b)},"vs_baseline":${
      BigDecimal(eps / b).setScale(3, BigDecimal.RoundingMode.HALF_UP)}""")
      .getOrElse("")
    val json = s"""{"metric":"stream_events_per_sec","value":${r1(eps)},""" +
      s""""unit":"events/sec","events":$total,"wall_sec":${r1(wall)},""" +
      s""""n_queries":${queries.size},"topology":"4 bronze + 2 kv + 2 rerank",""" +
      s""""sinks":$sinksJson,""" +
      s""""trigger":"AvailableNow"$vsBase,"git_head":"${PlanAudit.gitHead()}"}"""
    println(s"STREAMBENCH $json")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/stream_bench.json"), json)
    spark.stop()
    baseline.foreach { b =>
      if (eps < 0.5 * b) {
        System.err.println(f"STREAMBENCH GATE FAILED: $eps%.0f events/s < " +
          f"half the committed baseline $b%.0f (stream_baseline.json)")
        sys.exit(1)
      }
    }
  }
}
