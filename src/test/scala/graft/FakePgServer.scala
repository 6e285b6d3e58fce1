package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** In-process fake Postgres speaking the v3 wire slice
  * [[graft.sources.PgSocketTransport]] negotiates: startup → (optional)
  * cleartext-password auth → ReadyForQuery → one COPY-out conversation.
  * The payload per accepted query comes from `copyPayload`; chunking into
  * multiple CopyData messages and an optional injected ErrorResponse
  * after `errorAfterChunks` chunks model the spawned-connection failure
  * modes the reference handles (pg_arrow_source.rs:211-218).
  */
final class FakePgServer(
    expectedUser: String,
    expectedDatabase: String,
    requiredPassword: Option[String],
    copyPayload: String => Option[Array[Byte]],
    chunkSize: Int = 4096,
    errorAfterChunks: Option[Int] = None) extends AutoCloseable {

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  @volatile private var closed = false
  @volatile var lastStartupParams: Map[String, String] = Map.empty
  @volatile var sawPassword: Option[String] = None

  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (!closed) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "fake-pg-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception if closed => () }
    }
  }, "fake-pg-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def msg(out: DataOutputStream, tag: Char, body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(4 + body.length)
    out.write(body)
  }

  private def errorResponse(out: DataOutputStream, code: String, message: String): Unit = {
    val b = new java.io.ByteArrayOutputStream()
    def field(t: Char, v: String): Unit = {
      b.write(t); b.write(v.getBytes(StandardCharsets.UTF_8)); b.write(0)
    }
    field('S', "ERROR"); field('V', "ERROR"); field('C', code); field('M', message)
    b.write(0)
    msg(out, 'E', b.toByteArray)
  }

  private def readyForQuery(out: DataOutputStream): Unit =
    msg(out, 'Z', Array('I'.toByte))

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      // StartupMessage (untagged): int32 len, int32 protocol, k\0v\0…\0
      val len = in.readInt()
      val proto = in.readInt()
      require(proto == 196608, s"unexpected protocol $proto")
      val pbytes = new Array[Byte](len - 8)
      in.readFully(pbytes)
      val kv = new String(pbytes, StandardCharsets.UTF_8)
        .split('\u0000').filter(_.nonEmpty).grouped(2)
        .collect { case Array(k, v) => k -> v }.toMap
      lastStartupParams = kv

      requiredPassword match {
        case Some(want) =>
          // AuthenticationCleartextPassword
          msg(out, 'R', java.nio.ByteBuffer.allocate(4).putInt(3).array())
          out.flush()
          val tag = in.readByte().toChar
          val plen = in.readInt() - 4
          val pb = new Array[Byte](plen)
          in.readFully(pb)
          val got = new String(pb, StandardCharsets.UTF_8).stripSuffix("\u0000")
          sawPassword = Some(got)
          if (tag != 'p' || got != want ||
              !kv.get("user").contains(expectedUser) ||
              !kv.get("database").contains(expectedDatabase)) {
            errorResponse(out, "28P01",
              s"password authentication failed for user \"${kv.getOrElse("user", "?")}\"")
            out.flush()
            return
          }
        case None => ()
      }
      msg(out, 'R', java.nio.ByteBuffer.allocate(4).putInt(0).array()) // AuthenticationOk
      readyForQuery(out)
      out.flush()

      // query loop
      while (true) {
        val tag = in.readByte().toChar
        val qlen = in.readInt() - 4
        val body = new Array[Byte](qlen)
        in.readFully(body)
        tag match {
          case 'Q' =>
            val sql = new String(body, StandardCharsets.UTF_8).stripSuffix("\u0000")
            copyPayload(sql) match {
              case Some(payload) =>
                // CopyOutResponse: binary format, 0 advertised columns (the
                // client takes the schema from its own colSpec)
                msg(out, 'H', Array[Byte](1, 0, 0))
                val chunks = payload.grouped(chunkSize).toSeq
                val sendN = errorAfterChunks.fold(chunks.size)(n => math.min(n, chunks.size))
                chunks.take(sendN).foreach(c => msg(out, 'd', c))
                if (errorAfterChunks.exists(_ <= chunks.size)) {
                  errorResponse(out, "57014", "injected mid-stream failure")
                  readyForQuery(out)
                } else {
                  msg(out, 'c', Array.emptyByteArray) // CopyDone
                  msg(out, 'C', "COPY\u0000".getBytes(StandardCharsets.UTF_8))
                  readyForQuery(out)
                }
                out.flush()
              case None =>
                errorResponse(out, "42601", s"unrecognized query: $sql")
                readyForQuery(out)
                out.flush()
            }
          case 'X' => return // Terminate
          case other =>
            errorResponse(out, "08P01", s"unexpected message '$other'")
            out.flush()
            return
        }
      }
    } catch { case _: Exception => () } // connection torn down — fine
    finally sock.close()
  }

  override def close(): Unit = { closed = true; server.close() }
}
