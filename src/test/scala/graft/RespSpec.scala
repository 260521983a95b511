package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Events._
import graft.streaming.RespKV

/** Wire-level verification of the Redis-protocol KVStore adapter
  * against an in-process loopback RESP server (the embedded-Derby
  * treatment applied to the reference's Redis serving state,
  * streaming_flow.py:103-111). The server stores what a real Redis
  * would; assertions inspect its state directly. */
class RespSpec extends SparkSpec {

  /** Minimal RESP2 server: LPUSH / LTRIM / EXPIRE / LRANGE over a
    * concurrent map, one thread per connection, loopback only. */
  private final class MiniResp(port0: Int = 0) {
    private val server = new ServerSocket()
    server.setReuseAddress(true)
    server.bind(new java.net.InetSocketAddress(InetAddress.getLoopbackAddress, port0), 16)
    val port: Int = server.getLocalPort
    val lists = new java.util.concurrent.ConcurrentHashMap[String, List[String]]()
    val ttls = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    @volatile private var running = true
    private val accepted = new java.util.concurrent.ConcurrentLinkedQueue[Socket]()
    private val acceptor = new Thread(() => {
      while (running)
        try {
          val s = server.accept(); accepted.add(s)
          val t = new Thread(() => serve(s)); t.setDaemon(true); t.start()
        } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()

    private def serve(s: Socket): Unit = {
      val in = new BufferedInputStream(s.getInputStream)
      val out = new BufferedOutputStream(s.getOutputStream)
      def line(): String = {
        val b = new StringBuilder; var prev = -1
        while (true) {
          val c = in.read()
          if (c < 0) throw new EOFException
          if (c == '\n' && prev == '\r') return b.substring(0, b.length - 1)
          b.append(c.toChar); prev = c
        }
        throw new IllegalStateException
      }
      def bulk(): String = {
        val n = line().stripPrefix("$").toInt
        val b = new Array[Byte](n); var off = 0
        while (off < n) { val r = in.read(b, off, n - off); if (r < 0) throw new EOFException; off += r }
        line(); new String(b, UTF_8)
      }
      def reply(x: String): Unit = { out.write(x.getBytes(UTF_8)); out.flush() }
      try while (true) {
        val nArgs = line().stripPrefix("*").toInt
        val args = Vector.fill(nArgs)(bulk())
        args.head.toUpperCase match {
          case "LPUSH" if args(1).startsWith("badtype:") =>
            // simulate Redis WRONGTYPE (key holds a non-list value)
            reply("-WRONGTYPE Operation against a key holding the wrong kind of value\r\n")
          case "LPUSH" =>
            val n = lists.merge(args(1), List(args(2)), (old, nw) => nw ++ old).size
            reply(s":$n\r\n")
          case "LTRIM" =>
            val (from, to) = (args(2).toInt, args(3).toInt)
            lists.computeIfPresent(args(1), (_, l) =>
              if (to == -1) l.drop(from) else l.slice(from, to + 1))
            reply("+OK\r\n")
          case "EXPIRE" =>
            ttls.put(args(1), args(2).toLong); reply(":1\r\n")
          case "LRANGE" =>
            val l = Option(lists.get(args(1))).getOrElse(Nil)
            val sel = if (args(3).toInt == -1) l.drop(args(2).toInt)
                      else l.slice(args(2).toInt, args(3).toInt + 1)
            reply(s"*${sel.size}\r\n" + sel.map(v => s"$$${v.getBytes(UTF_8).length}\r\n$v\r\n").mkString)
          case other => reply(s"-ERR unknown command '$other'\r\n")
        }
      } catch { case _: Exception => () } finally s.close()
    }
    def close(): Unit = {
      running = false; server.close()
      // a real shutdown severs established connections too — without
      // this the old handler threads keep serving the "dead" server
      accepted.forEach(s => try s.close() catch { case _: Exception => () })
    }
  }

  test("RESP adapter: pipelined LPUSH+LTRIM+EXPIRE and LRANGE round-trip; parity with InMemoryKV") {
    val srv = new MiniResp
    try {
      val kv = new RespKV("127.0.0.1", srv.port, ttlSeconds = 86400L)
      InMemoryKV.clear()
      for (v <- Seq("p1", "p2", "p3")) { kv.push("user:u1:views", v, keep = 2); InMemoryKV.push("user:u1:views", v, keep = 2) }
      // LIFO order, trimmed to keep=2, identical to the in-memory twin
      assert(kv.get("user:u1:views") === Seq("p3", "p2"))
      assert(kv.get("user:u1:views") === InMemoryKV.get("user:u1:views"))
      assert(kv.get("user:absent").isEmpty)
      assert(srv.ttls.get("user:u1:views") === 86400L) // EXPIRE reached the wire
      assert(srv.lists.get("user:u1:views") === List("p3", "p2")) // server-side state bounded
    } finally srv.close()
  }

  test("an -ERR reply mid-pipeline surfaces as RespProtocolError WITHOUT desyncing the shared connection") {
    val srv = new MiniResp
    try {
      val kv = new RespKV("127.0.0.1", srv.port)
      // LPUSH fails but LTRIM/EXPIRE replies are still drained, so...
      intercept[RespKV.RespProtocolError] { kv.push("badtype:k", "v", keep = 2) }
      // ...the very next commands on the SAME pooled connection parse cleanly
      kv.push("user:u9:views", "p1", keep = 2)
      assert(kv.get("user:u9:views") === Seq("p1"))
      assert(kv.get("badtype:k").isEmpty)
    } finally srv.close()
  }

  test("a dead pooled connection is evicted and the command retried on a fresh socket (server restart)") {
    val srv1 = new MiniResp
    val port = srv1.port
    val kv = new RespKV("127.0.0.1", port)
    kv.push("user:r:views", "p1", keep = 5) // establishes the pooled conn
    assert(srv1.lists.get("user:r:views") === List("p1"))
    srv1.close()
    // "Redis restarted" on the same address; rebinding a just-released
    // ephemeral port can lose a race to another allocation, so retry
    val srv2 = Iterator.range(0, 5).map { i =>
      try Some(new MiniResp(port))
      catch { case _: java.net.BindException => Thread.sleep(100L << i); None }
    }.flatten.nextOption()
      .getOrElse(fail(s"could not rebind port $port after 5 attempts"))
    try {
      // the pooled conn is a corpse; withConn must evict it and land the
      // command on the new server within this same call
      kv.push("user:r:views", "p2", keep = 5)
      assert(srv2.lists.get("user:r:views") === List("p2"))
      assert(kv.get("user:r:views") === Seq("p2")) // reads follow the fresh conn
    } finally srv2.close()
  }

  test("K6 over the wire: foreachBatch serving-state sink lands in the RESP server, partition-local") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val srv = new MiniResp
    try {
      val kv = new RespKV("127.0.0.1", srv.port)
      val ms = MemoryStream[String]
      ms.addData(
        """{"user_id":"u1","timestamp":"t","product_id":"p1"}""",
        """{"user_id":"u2","timestamp":"t","product_id":"p2"}""",
        """{"user_id":null,"timestamp":"t","product_id":"px"}""")
      val clock = lit(java.sql.Date.valueOf("2026-08-12")).cast("timestamp")
      val q = parse(ms.toDF(), "add_to_cart", clock).writeStream
        .foreachBatch(servingStateBatch(kv, keep = 50) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(kv.get("user:u1:cart") === Seq("p1")) // cart routing (not views)
      assert(kv.get("user:u2:cart") === Seq("p2"))
      assert(kv.get("user:u1:views").isEmpty)
      assert(!srv.lists.containsKey("user:null:cart")) // null guard held executor-side
    } finally srv.close()
  }
}
