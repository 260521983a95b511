package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Events, KafkaWire}

/** Wire-level verification of the Kafka v0 protocol adapter against an
  * in-process loopback broker — the RespSpec/JdbcSpec treatment applied
  * to the reference's event bus (streaming_flow.py:180-185 consume,
  * :228-235 produce). Covers the binary contract (framing, CRC'd
  * message sets, dense offsets, high-watermark), the S4 ingest →
  * parse-chain path, the K7 streaming egress via foreachBatch, the
  * offset-tracked resume loop, and a broker kill/restart. */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String): Array[Byte] = if (s == null) null else s.getBytes(UTF_8)
  private def str(a: Array[Byte]): String = if (a == null) null else new String(a, UTF_8)

  private val bothWires = Seq(KafkaWire.LegacyWire, KafkaWire.RecordBatchWire)

  for (wire <- bothWires)
  test(s"produce/fetch round-trip [$wire]: dense offsets, verified values, null keys, high-watermark") {
    val log = new KafkaWire.Log
    val srv = new KafkaWire.Server(log)
    try {
      val base1 = KafkaWire.produce("127.0.0.1", srv.port, "t", 0,
        Seq((b("k1"), b("v1")), (null, b("v2"))), wire)
      val base2 = KafkaWire.produce("127.0.0.1", srv.port, "t", 0,
        Seq((b("k3"), b("v3"))), wire)
      assert(base1 === 0L && base2 === 2L)

      val (recs, hw) = KafkaWire.fetch("127.0.0.1", srv.port, "t", 0, offset = 0L, wire = wire)
      assert(hw === 3L)
      assert(recs.map(_.offset) === Seq(0L, 1L, 2L))
      assert(recs.map(r => str(r.value)) === Seq("v1", "v2", "v3"))
      assert(recs.map(r => str(r.key)) === Seq("k1", null, "k3"))

      // mid-offset fetch returns only the suffix; head fetch is legally empty
      val (tail, _) = KafkaWire.fetch("127.0.0.1", srv.port, "t", 0, offset = 2L, wire = wire)
      assert(tail.map(r => str(r.value)) === Seq("v3"))
      val (empty, hw2) = KafkaWire.fetch("127.0.0.1", srv.port, "t", 0, offset = 3L, wire = wire)
      assert(empty.isEmpty && hw2 === 3L)
      // past the watermark is OFFSET_OUT_OF_RANGE, loudly
      intercept[java.io.IOException] {
        KafkaWire.fetch("127.0.0.1", srv.port, "t", 0, offset = 4L, wire = wire)
      }

      val meta = KafkaWire.metadata("127.0.0.1", srv.port)
      assert(meta("t") === Seq(0))
    } finally { srv.close(); KafkaWire.resetPool() }
  }

  test("codec interop: one log serves both wire generations (the broker-upgrade seam)") {
    val log = new KafkaWire.Log
    val srv = new KafkaWire.Server(log)
    try {
      // legacy producer, then a v2 producer, appending to the SAME partition
      KafkaWire.produce("127.0.0.1", srv.port, "t", 0,
        Seq((b("k0"), b("legacy-0"))), KafkaWire.LegacyWire)
      KafkaWire.produce("127.0.0.1", srv.port, "t", 0,
        Seq((b("k1"), b("batch-1")), (b("k2"), b("batch-2"))), KafkaWire.RecordBatchWire)
      // each consumer generation sees the full log with dense offsets
      for (wire <- bothWires) {
        val (recs, hw) = KafkaWire.fetch("127.0.0.1", srv.port, "t", 0, 0L, wire = wire)
        assert(hw === 3L, s"$wire")
        assert(recs.map(r => (r.offset, str(r.value))) ===
          Seq((0L, "legacy-0"), (1L, "batch-1"), (2L, "batch-2")), s"$wire")
      }
    } finally { srv.close(); KafkaWire.resetPool() }
  }

  test("v2 record batch codec: round-trip, CRC32C rejection, trailing-partial drop, varint edges") {
    // round-trip incl. null key, empty value, a multi-byte-varint value
    val big = ("x" * 300).getBytes(UTF_8) // length needs 2 varint bytes
    val batch = KafkaWire.encodeRecordBatchV2(
      Seq((5L, b("k"), b("v")), (6L, null, b("")), (7L, b("kk"), big)))
    val recs = KafkaWire.decodeRecordBatchesV2(batch)
    assert(recs.map(_.offset) === Seq(5L, 6L, 7L))
    assert(str(recs(0).value) === "v" && recs(1).key === null && str(recs(1).value) === "")
    assert(recs(2).value.toSeq === big.toSeq)
    // one flipped payload bit must fail the BATCH CRC32C
    val bad = batch.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte
    intercept[java.io.IOException] { KafkaWire.decodeRecordBatchesV2(bad) }
    // a fetch cut mid-batch drops the partial trailing batch, keeps whole ones
    val two = KafkaWire.encodeRecordBatchV2(Seq((0L, b("a"), b("first")))) ++
      KafkaWire.encodeRecordBatchV2(Seq((1L, b("b"), b("second"))))
    val cut = two.take(two.length - 3)
    assert(KafkaWire.decodeRecordBatchesV2(cut).map(r => str(r.value)) === Seq("first"))
    // magic sniffing picks the right codec for either format
    assert(KafkaWire.decodeAnyRecordSet(batch).size === 3)
    assert(KafkaWire.decodeAnyRecordSet(
      KafkaWire.encodeMessageSet(Seq((0L, b("k"), b("v"))))).size === 1)
  }

  test("varint/varlong zigzag: sign-symmetric round-trip across widths") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
    val ints = Seq(0, 1, -1, 63, -64, 64, 127, -128, 300, -300, Int.MaxValue, Int.MinValue)
    val longs = Seq(0L, 1L, -1L, 1L << 34, -(1L << 34), Long.MaxValue, Long.MinValue)
    val out = new ByteArrayOutputStream(); val o = new DataOutputStream(out)
    ints.foreach(KafkaWire.writeVarint(o, _))
    longs.foreach(KafkaWire.writeVarlong(o, _))
    val i = new DataInputStream(new ByteArrayInputStream(out.toByteArray))
    assert(ints.map(_ => KafkaWire.readVarint(i)) === ints)
    assert(longs.map(_ => KafkaWire.readVarlong(i)) === longs)
  }

  test("CRC integrity: a corrupted message set is rejected, not silently decoded") {
    val set = KafkaWire.encodeMessageSet(Seq((0L, b("k"), b("corrupt-me"))))
    assert(KafkaWire.decodeMessageSet(set).map(r => str(r.value)) === Seq("corrupt-me"))
    val bad = set.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x01).toByte // flip one value bit
    intercept[java.io.IOException] { KafkaWire.decodeMessageSet(bad) }
    // max_bytes cutting a message mid-frame drops the partial, keeps the whole ones
    val two = KafkaWire.encodeMessageSet(Seq((0L, b("a"), b("first")), (1L, b("b"), b("second"))))
    val cut = two.take(two.length - 3)
    assert(KafkaWire.decodeMessageSet(cut).map(r => str(r.value)) === Seq("first"))
  }

  for (wire <- bothWires)
  test(s"S4 over the wire [$wire]: produced events land in the parse chain byte-identical to the kafkaSource contract") {
    val log = new KafkaWire.Log
    val srv = new KafkaWire.Server(log)
    try {
      val events = (1 to 8).map { i =>
        (s"u$i", s"""{"user_id":"u$i","product_id":"p${i % 3}","timestamp":"2024-01-0$i 00:00:00"}""")
      }
      KafkaWire.produce("127.0.0.1", srv.port, "user_events", 0,
        events.map { case (k, v) => (b(k), b(v)) }, wire)

      val (frame, hw) = Events.kafkaWireReplayBatch(spark, "127.0.0.1", srv.port, "user_events",
        wire = wire)
      assert(hw === 8L)
      // the connector's column contract, so parse() downstream is unchanged
      assert(frame.columns.toSeq === Seq("key", "value", "topic", "partition", "offset"))
      val parsed = Events.guarded(Events.parse(frame, "page_view"))
      val got = parsed.select("user_id", "product_id").as[(String, String)].collect().toSet
      assert(got === events.map { case (u, _) => (u, s"p${u.drop(1).toInt % 3}") }.toSet)

      // offset-tracked resume: commit hw, produce more, next replay sees ONLY the delta
      KafkaWire.produce("127.0.0.1", srv.port, "user_events", 0,
        Seq((b("u9"), b("""{"user_id":"u9","product_id":"p9","timestamp":"2024-01-09 00:00:00"}"""))),
        wire)
      val (delta, hw2) = Events.kafkaWireReplayBatch(spark, "127.0.0.1", srv.port,
        "user_events", fromOffset = hw, wire = wire)
      assert(hw2 === 9L)
      assert(delta.select("offset").as[Long].collect().toSeq === Seq(8L))
      assert(Events.parse(delta, "page_view").select("user_id").as[String].collect().toSeq === Seq("u9"))
    } finally { srv.close(); KafkaWire.resetPool() }
  }

  for (wire <- bothWires)
  test(s"K7 over the wire [$wire]: streaming rerank payloads arrive via foreachBatch produce; parity with toKafkaPayload") {
    val log = new KafkaWire.Log
    val srv = new KafkaWire.Server(log)
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Seq[String])]
      val recsDf = input.toDF().toDF("user_id", "recommendations")
      val q = Events.toKafkaPayload(recsDf, "user_id").writeStream
        .foreachBatch(Events.kafkaWireSinkBatch("127.0.0.1", srv.port, "recs", wire = wire) _)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_kw_ck_").toString)
        .start()
      try {
        input.addData(("alice", Seq("p1", "p2")), ("bob", Seq("p3")))
        q.processAllAvailable()
        input.addData(("carol", Seq("p4")))
        q.processAllAvailable()
      } finally q.stop()

      val (recs, hw) = KafkaWire.fetch("127.0.0.1", srv.port, "recs", 0, 0L, wire = wire)
      assert(hw === 3L)
      val got = recs.map(r => (str(r.key), str(r.value))).toSet
      // the exact payload the BATCH toKafkaPayload form emits — stream ≡ batch
      val expect = Events.toKafkaPayload(
          Seq(("alice", Seq("p1", "p2")), ("bob", Seq("p3")), ("carol", Seq("p4")))
            .toDF("user_id", "recommendations"), "user_id")
        .as[(String, String)].collect().toSet
      assert(got === expect)
    } finally { srv.close(); KafkaWire.resetPool() }
  }

  test("broker restart on the same log: client reconnects within one call, committed offsets survive") {
    val log = new KafkaWire.Log
    val srv1 = new KafkaWire.Server(log)
    val port = srv1.port
    KafkaWire.produce("127.0.0.1", port, "t", 0, Seq((b("k"), b("before"))))
    srv1.close()
    // rebinding a just-released ephemeral port can lose a race to another
    // allocation — retry with backoff (the RespSpec restart recipe)
    val srv2 = Iterator.range(0, 5).map { i =>
      try Some(new KafkaWire.Server(log, port)) // same log, same port
      catch { case _: java.net.BindException => Thread.sleep(100L << i); None }
    }.flatten.nextOption()
      .getOrElse(fail(s"could not rebind port $port after 5 attempts"))
    try {
      // the pooled connection is a corpse; withConn must evict + retry once
      val (recs, hw) = KafkaWire.fetch("127.0.0.1", port, "t", 0, 0L)
      assert(hw === 1L && recs.map(r => str(r.value)) === Seq("before"))
      // and the restarted broker keeps appending AFTER the committed offsets
      val base = KafkaWire.produce("127.0.0.1", port, "t", 0, Seq((b("k"), b("after"))))
      assert(base === 1L)
      val (all, _) = KafkaWire.fetch("127.0.0.1", port, "t", 0, 0L)
      assert(all.map(r => str(r.value)) === Seq("before", "after"))
    } finally { srv2.close(); KafkaWire.resetPool() }
  }
}
