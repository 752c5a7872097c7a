package graft.streaming

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9 — the reference's per-transaction WebSocket status feed
  * (`app.py:248-265`: clients connect to `/ws/{transaction_id}/`, the
  * backend pushes `{transaction_id, status, error_log}` JSON frames when a
  * transaction reaches FAILED/SUCCESS), as a REAL RFC 6455 server with no
  * dependencies beyond the JDK: HTTP upgrade handshake
  * (Sec-WebSocket-Accept = base64(sha1(key + GUID))), text frames with
  * 7/16/64-bit lengths, masked client frames unmasked per the RFC,
  * ping→pong, close handshake, and dead connections dropped on write
  * failure (the `WeakValueDictionary` analogue).
  *
  * This is CONTROL-PLANE push — one tiny JSON frame per transaction status
  * change, fanned to UI subscribers — so the Spark side is deliberately a
  * driver-side `foreachBatch` publisher ([[WebSocketFeed.publishUpdates]]):
  * the feed's volume is bounded by ledger write traffic, never data-sized,
  * and subscribers need ORDERED frames from one writer. Distributing this
  * would be wrong, not just unnecessary.
  */
object WebSocketFeed {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** The RFC 6455 §4.2.2 accept token for a client key. */
  def acceptKey(clientKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((clientKey + WsGuid).getBytes(UTF_8)))

  /** One FIN text frame, server→client (unmasked per the RFC). */
  private[streaming] def encodeTextFrame(payload: String): Array[Byte] = {
    val p = payload.getBytes(UTF_8)
    val header =
      if (p.length < 126) Array[Byte](0x81.toByte, p.length.toByte)
      else if (p.length < 65536)
        Array[Byte](0x81.toByte, 126.toByte,
          ((p.length >> 8) & 0xff).toByte, (p.length & 0xff).toByte)
      else Array[Byte](0x81.toByte, 127.toByte) ++
        (56 to 0 by -8).map(s => ((p.length.toLong >> s) & 0xff).toByte)
    header ++ p
  }

  /** A decoded client frame: opcode + unmasked payload. */
  private[streaming] final case class Frame(opcode: Int, payload: Array[Byte])

  /** Hard cap on a client frame payload. The feed is control-plane (clients
    * send pings/close, never data), so anything past 1 MiB is a protocol
    * error, and a hostile 64-bit length claim must never reach `new Array`.
    */
  private[streaming] val MaxFramePayload: Long = 1L << 20

  /** Read one client frame (clients MUST mask; unmask per §5.3). Returns
    * None on a cleanly closed stream, on EOF mid-header, and on protocol
    * violations (length over [[MaxFramePayload]], control frame over the
    * RFC's 125-byte cap) — the caller drops the connection either way.
    */
  private[streaming] def readFrame(in: InputStream): Option[Frame] = {
    // every header byte checks for EOF: a truncated header must not fold a
    // -1 into the length and misread the stream
    def byte(): Int = in.read()
    val b0 = byte(); if (b0 < 0) return None
    val b1 = byte(); if (b1 < 0) return None
    val opcode = b0 & 0x0f
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) {
      val h = byte(); val l = byte()
      if (h < 0 || l < 0) return None
      len = (h << 8 | l).toLong
    } else if (len == 127) {
      var acc = 0L; var i = 0
      while (i < 8) { val b = byte(); if (b < 0) return None; acc = acc << 8 | b; i += 1 }
      len = acc
    }
    if (len < 0 || len > MaxFramePayload) return None
    if ((opcode & 0x8) != 0 && len > 125) return None // RFC 6455 §5.5
    val mask = new Array[Byte](4)
    if (masked) {
      var i = 0
      while (i < 4) { val b = byte(); if (b < 0) return None; mask(i) = b.toByte; i += 1 }
    }
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < len) {
      val n = in.read(payload, off, len.toInt - off)
      if (n < 0) return None
      off += n
    }
    if (masked) payload.indices.foreach(i => payload(i) = (payload(i) ^ mask(i % 4)).toByte)
    Some(Frame(opcode, payload))
  }

  /** Push server: clients speak the RFC 6455 handshake at
    * `ws://host:port/ws/{transaction_id}/` (the reference's path shape;
    * `*` subscribes to everything) and receive a JSON frame per matching
    * [[publish]]. Port 0 binds an ephemeral port (see [[port]]).
    */
  final class Server(requestedPort: Int = 0) extends AutoCloseable {
    private val server = new ServerSocket(requestedPort)
    // transaction_id -> live subscriber sockets
    private val subs = TrieMap.empty[String, List[Socket]]
    @volatile private var running = true

    def port: Int = server.getLocalPort

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => handle(sock)).start()
        } catch { case _: Exception => () } // closed during accept
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(sock: Socket): Unit = {
      try {
        val in = sock.getInputStream
        // HTTP upgrade request: GET /ws/{id}/ + headers until the blank
        // line. Read lines off the RAW stream (no BufferedReader: its
        // read-ahead would swallow bytes of the client's first frame).
        def rawLine(): String = {
          val sb = new StringBuilder
          var b = in.read()
          while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
          if (b < 0 && sb.isEmpty) null else sb.toString
        }
        val requestLine = rawLine()
        var key: String = null
        var line = rawLine()
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          if (i > 0 && line.substring(0, i).equalsIgnoreCase("Sec-WebSocket-Key"))
            key = line.substring(i + 1).trim
          line = rawLine()
        }
        val path = requestLine.split(" ")(1)
        val id = path.stripPrefix("/ws/").stripSuffix("/")
        if (key == null || id.isEmpty) { sock.close(); return }
        val out = sock.getOutputStream
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
        out.flush()
        subs.updateWith(id)(cur => Some(sock :: cur.getOrElse(Nil)))
        // serve pings + the close handshake until the client goes away
        var open = true
        while (open && running) readFrame(in) match {
          case Some(Frame(0x9, p)) => // ping -> pong
            sock.synchronized { out.write(Array[Byte](0x8a.toByte, p.length.toByte) ++ p); out.flush() }
          case Some(Frame(0x8, _)) | None => open = false
          case _ => () // client text/continuation frames are ignored
        }
        drop(id, sock)
      } catch { case _: Exception => () } finally {
        try sock.close() catch { case _: Exception => () }
      }
    }

    private def drop(id: String, sock: Socket): Unit =
      subs.updateWith(id)(_.map(_.filterNot(_ eq sock)).filter(_.nonEmpty))

    /** Push `json` to every subscriber of `transactionId` (and of `*`).
      * Dead sockets drop silently — exactly the reference's weak-ref map.
      */
    def publish(transactionId: String, json: String): Unit = {
      val frame = encodeTextFrame(json)
      (subs.getOrElse(transactionId, Nil) ++ subs.getOrElse("*", Nil)).foreach { sock =>
        try sock.synchronized {
          val out: OutputStream = sock.getOutputStream
          out.write(frame); out.flush()
        } catch {
          case _: Exception =>
            drop(transactionId, sock); drop("*", sock)
            try sock.close() catch { case _: Exception => () }
        }
      }
    }

    override def close(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
      subs.values.flatten.foreach(s => try s.close() catch { case _: Exception => () })
      subs.clear()
    }
  }

  /** The Spark half: push a ledger-status micro-batch to subscribers — only
    * FAILED/SUCCESS rows, like the reference (`save_transaction` pushes only
    * terminal statuses). Wire as
    * `stream.writeStream.foreachBatch((df, _) => publishUpdates(server, df))`.
    * The collect is correct here, not a compromise: this is the
    * control-plane status feed (rows = ledger status changes), and
    * subscribers need ordered frames from one writer.
    */
  def publishUpdates(server: Server, batch: DataFrame): Unit =
    batch
      .filter(col("status").isin("FAILED", "SUCCESS"))
      .select(col("transaction_id"),
        to_json(struct(col("transaction_id"), col("status"), col("error_log"))).as("j"))
      .collect()
      .foreach(r => server.publish(r.getString(0), r.getString(1)))
}
