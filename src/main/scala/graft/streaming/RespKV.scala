package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Redis-protocol (RESP2) adapter for [[Events.KVStore]] — the wire
  * form of the reference's serving-state sink
  * (`streaming_flow.py:103-111`: `LPUSH` + `LTRIM 0 keep-1` +
  * `EXPIRE ttl` per event; `LRANGE 0 -1` reads at `:145-147`). The
  * bounded-list/TTL SEMANTICS are already spec-pinned against
  * `InMemoryKV` and `transformWithState`; this class closes the wire
  * seam by speaking the actual protocol, verified in `RespSpec`
  * against an in-process loopback RESP server — the embedded-Derby
  * treatment (JdbcSpec) applied to Redis.
  *
  * The three push commands are pipelined in ONE socket write and their
  * three replies read back together, so a push is one round trip, not
  * three (the reference pays three — `r.lpush; r.ltrim; r.expire`).
  *
  * Connection model: one lazily-opened socket per JVM per (host,port),
  * shared by every task and synchronized per command batch. Serving-
  * state pushes are tiny; if contention ever mattered, a pooled client
  * drops in behind the same KVStore trait without touching any
  * foreachBatch wiring. Instances are Serializable (closures capture
  * them); the socket lives in the JVM-scoped companion pool, never in
  * the serialized instance.
  */
final class RespKV(host: String, port: Int, ttlSeconds: Long = 86400L)
    extends Events.KVStore {

  def push(key: String, value: String, keep: Int): Unit =
    // keep <= 0 means "retain nothing": InMemoryKV's take(keep) yields
    // an empty list, but Redis `LTRIM key 0 -1` would retain the WHOLE
    // list (-1 is the end-of-list index) — so the wire form of "keep
    // nothing" is DEL, which reads back as the same empty list.
    if (keep <= 0)
      RespKV.withConn(host, port) { conn =>
        conn.send(Seq("DEL", key))
        conn.readReplies(1).collect { case e: RespKV.RespProtocolError => e }
          .headOption.foreach(e => throw e)
      }
    else RespKV.withConn(host, port) { conn =>
      conn.send(
        Seq("LPUSH", key, value),
        Seq("LTRIM", key, "0", (keep - 1).toString),
        Seq("EXPIRE", key, ttlSeconds.toString))
      // drain ALL three pipelined replies before surfacing any -ERR:
      // throwing on the first would leave the later replies unread and
      // desynchronize every subsequent command on the shared connection
      val errs = conn.readReplies(3).collect { case e: RespKV.RespProtocolError => e }
      errs.headOption.foreach(e => throw e)
    }

  def get(key: String): Seq[String] =
    RespKV.withConn(host, port) { conn =>
      conn.send(Seq("LRANGE", key, "0", "-1"))
      conn.readReply() match {
        case null          => Nil
        case xs: Vector[_] => xs.map(x => String.valueOf(x))
        case other         => throw new IOException(s"LRANGE: unexpected reply $other")
      }
    }
}

object RespKV {
  /** An application-level `-ERR …` reply: the connection itself is
    * still in protocol sync (the reply WAS consumed), so this must not
    * trigger eviction/reconnect — unlike stream-level IO failures. */
  final class RespProtocolError(msg: String) extends IOException(msg)

  private val conns =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Conn]()

  private[streaming] def connection(host: String, port: Int): Conn =
    conns.computeIfAbsent((host, port), { case (h, p) => new Conn(h, p) })

  private def evict(host: String, port: Int): Unit =
    Option(conns.remove((host, port))).foreach(_.closeQuietly())

  /** Run `f` against the pooled connection; on a stream-level IO
    * failure (EOF, socket reset, read timeout — the connection is
    * desynced or dead) evict the corpse and retry ONCE on a fresh
    * socket, so a Redis restart does not cost the life of the JVM.
    * RESP `-ERR` replies pass through untouched.
    *
    * Delivery is AT-LEAST-ONCE across connection failures: the retry
    * re-sends the whole pipelined batch, and if the server had already
    * applied a prefix (e.g. the LPUSH landed but the connection died
    * before its reply arrived) the retry duplicates that prefix. This
    * is the same at-least-once caveat the foreachBatch replay path
    * documents — serving-state lists are bounded by LTRIM, so a
    * duplicated push costs one repeated head entry, not unbounded
    * growth; exactly-once would need server-side dedup tokens. */
  private[streaming] def withConn[A](host: String, port: Int)(f: Conn => A): A = {
    def run(): A = { val c = connection(host, port); c.synchronized(f(c)) }
    try run()
    catch {
      case e: RespProtocolError => throw e
      case _: IOException =>
        evict(host, port)
        try run()
        catch { case e2: IOException => evict(host, port); throw e2 }
    }
  }

  /** One RESP connection: frame encoder + reply parser. Callers hold
    * the monitor across a send/read sequence (pipelining unit).
    * Bounded connect (10 s) and read (30 s) timeouts: a blackholed
    * host fails the command instead of wedging every task queued on
    * the monitor; the timeout surfaces as an IOException, which the
    * withConn wrapper treats as a dead connection. */
  private[streaming] final class Conn(host: String, port: Int) {
    private val socket = new Socket()
    socket.connect(new java.net.InetSocketAddress(host, port), 10000)
    socket.setSoTimeout(30000)
    socket.setTcpNoDelay(true)
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private val in = new BufferedInputStream(socket.getInputStream)

    def closeQuietly(): Unit =
      try socket.close() catch { case _: IOException => () }

    /** Read exactly `n` replies, capturing application `-ERR`s as
      * values so every pipelined reply is consumed even when an early
      * one failed (protocol stays in sync); stream-level failures
      * still throw immediately (the stream is unrecoverable anyway). */
    def readReplies(n: Int): Seq[Any] =
      Seq.fill(n)(try readReply() catch { case e: RespProtocolError => e })

    /** Encode each command as a RESP array of bulk strings; one write. */
    def send(cmds: Seq[String]*): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      cmds.foreach { args =>
        buf.write(s"*${args.size}\r\n".getBytes(UTF_8))
        args.foreach { a =>
          val b = a.getBytes(UTF_8)
          buf.write(s"$$${b.length}\r\n".getBytes(UTF_8))
          buf.write(b)
          buf.write("\r\n".getBytes(UTF_8))
        }
      }
      out.write(buf.toByteArray); out.flush()
    }

    private def readLine(): String = {
      val buf = new StringBuilder
      var prev = -1
      while (true) {
        val c = in.read()
        if (c < 0) throw new EOFException("RESP stream closed")
        if (c == '\n' && prev == '\r') return buf.substring(0, buf.length - 1)
        buf.append(c.toChar); prev = c
      }
      throw new IllegalStateException("unreachable")
    }

    /** Simple string → String, integer → Long, bulk → String (nil →
      * null), array → Vector (nil → null), error → IOException. */
    def readReply(): Any = readLine() match {
      case l if l.startsWith("+") => l.substring(1)
      case l if l.startsWith(":") => l.substring(1).toLong
      case l if l.startsWith("-") => throw new RespProtocolError(s"RESP error: ${l.substring(1)}")
      case l if l.startsWith("$") =>
        val n = l.substring(1).toInt
        if (n < 0) null
        else {
          val b = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(b, off, n - off)
            if (r < 0) throw new EOFException("RESP stream closed mid-bulk")
            off += r
          }
          readLine() // trailing CRLF
          new String(b, UTF_8)
        }
      case l if l.startsWith("*") =>
        val n = l.substring(1).toInt
        if (n < 0) null else Vector.fill(n)(readReply())
      case l => throw new IOException(s"RESP: unparseable line '$l'")
    }
  }
}
