package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** In-process fake Postgres speaking the v3 wire slice
  * [[graft.sources.PgSocketTransport]] negotiates: the SSLRequest preamble
  * ('S' + TLS handshake when a [[tlsContext]] is configured, 'N'
  * otherwise), startup, then trust / cleartext / MD5 / SCRAM-SHA-256 auth
  * per [[authMode]], ReadyForQuery, and one COPY-out conversation. The
  * payload per accepted query comes from `copyPayload`; chunking into
  * multiple CopyData messages and an optional injected ErrorResponse
  * after `errorAfterChunks` chunks model the spawned-connection failure
  * modes the reference handles (pg_arrow_source.rs:211-218). The SCRAM
  * verifier is a REAL RFC 7677 server side (salted-password store,
  * client-proof verification, server signature) so the client's proof
  * math is checked end-to-end, not echoed.
  */
final class FakePgServer(
    expectedUser: String,
    expectedDatabase: String,
    requiredPassword: Option[String],
    copyPayload: String => Option[Array[Byte]],
    chunkSize: Int = 4096,
    errorAfterChunks: Option[Int] = None,
    authMode: String = "cleartext",
    tlsContext: Option[javax.net.ssl.SSLContext] = None) extends AutoCloseable {

  require(Set("cleartext", "md5", "scram").contains(authMode), authMode)

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  @volatile private var closed = false
  @volatile var lastStartupParams: Map[String, String] = Map.empty
  @volatile var sawPassword: Option[String] = None
  @volatile var sawTls: Boolean = false
  @volatile var sawScram: Boolean = false

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

  private def authFailed(out: DataOutputStream, user: String): Unit = {
    errorResponse(out, "28P01",
      s"password authentication failed for user \"$user\"")
    out.flush()
  }

  private def hmac(key: Array[Byte], m: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(m)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** Reads one 'p' (password-family) message body. */
  private def readP(in: DataInputStream): Array[Byte] = {
    val tag = in.readByte().toChar
    val len = in.readInt() - 4
    val b = new Array[Byte](len)
    in.readFully(b)
    require(tag == 'p', s"expected password message, got '$tag'")
    b
  }

  /** RFC 7677 server conversation. Returns true when the client proved the
    * password (and records [[sawScram]]).
    */
  private def scramVerify(in: DataInputStream, out: DataOutputStream,
      password: String): Boolean = {
    // AuthenticationSASL: int32 code 10 + NUL-terminated mechanism list + NUL
    val mechs = "SCRAM-SHA-256\u0000\u0000".getBytes(StandardCharsets.UTF_8)
    msg(out, 'R', java.nio.ByteBuffer.allocate(4 + mechs.length)
      .putInt(10).put(mechs).array())
    out.flush()
    // SASLInitialResponse: String mechanism, int32 n, n bytes
    val ib = readP(in)
    val z = ib.indexOf(0.toByte)
    require(new String(ib, 0, z, StandardCharsets.UTF_8) == "SCRAM-SHA-256")
    val n = java.nio.ByteBuffer.wrap(ib, z + 1, 4).getInt
    val clientFirst = new String(ib, z + 5, n, StandardCharsets.UTF_8)
    require(clientFirst.startsWith("n,,"), s"unexpected gs2 header in $clientFirst")
    val clientFirstBare = clientFirst.stripPrefix("n,,")
    val clientNonce = clientFirstBare.split(',').map(_.split("=", 2))
      .collectFirst { case Array("r", v) => v }.get

    val b64 = java.util.Base64.getEncoder
    val salt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val iterations = 4096
    val serverNonce = clientNonce + "srvext"
    val serverFirst = s"r=$serverNonce,s=${b64.encodeToString(salt)},i=$iterations"
    val sf = serverFirst.getBytes(StandardCharsets.UTF_8)
    msg(out, 'R', java.nio.ByteBuffer.allocate(4 + sf.length).putInt(11).put(sf).array())
    out.flush()

    // SASLResponse: client-final-message
    val clientFinal = new String(readP(in), StandardCharsets.UTF_8)
    val attrs = clientFinal.split(',').map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    if (attrs.get("r") != Some(serverNonce) || attrs.get("c") != Some("biws"))
      return false
    val proof = java.util.Base64.getDecoder.decode(attrs("p"))
    val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
    val authMessage = (clientFirstBare + "," + serverFirst + "," + withoutProof)
      .getBytes(StandardCharsets.UTF_8)

    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)
    val salted = javax.crypto.SecretKeyFactory
      .getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
    val storedKey = sha256(hmac(salted, "Client Key".getBytes(StandardCharsets.UTF_8)))
    val clientSig = hmac(storedKey, authMessage)
    // recover ClientKey from the proof; its hash must equal StoredKey
    val recovered = proof.zip(clientSig).map { case (a, c) => (a ^ c).toByte }
    if (!java.util.Arrays.equals(sha256(recovered), storedKey)) return false
    sawScram = true

    val serverKey = hmac(salted, "Server Key".getBytes(StandardCharsets.UTF_8))
    val v = ("v=" + b64.encodeToString(hmac(serverKey, authMessage)))
      .getBytes(StandardCharsets.UTF_8)
    msg(out, 'R', java.nio.ByteBuffer.allocate(4 + v.length).putInt(12).put(v).array())
    out.flush()
    true
  }

  private def handle(sock0: Socket): Unit = {
    var sock = sock0
    try {
      var in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      var out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      // SSLRequest preamble (int32 8, int32 80877103) or StartupMessage
      var len = in.readInt()
      var proto = in.readInt()
      if (len == 8 && proto == 80877103) {
        tlsContext match {
          case Some(ctx) =>
            out.writeByte('S'); out.flush()
            val ssl = ctx.getSocketFactory
              .createSocket(sock, "127.0.0.1", sock.getPort, true)
              .asInstanceOf[javax.net.ssl.SSLSocket]
            ssl.setUseClientMode(false)
            ssl.startHandshake()
            sawTls = true
            sock = ssl
            in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
            out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
          case None =>
            out.writeByte('N'); out.flush()
        }
        len = in.readInt()
        proto = in.readInt()
      }
      require(proto == 196608, s"unexpected protocol $proto")
      val pbytes = new Array[Byte](len - 8)
      in.readFully(pbytes)
      val kv = new String(pbytes, StandardCharsets.UTF_8)
        .split('\u0000').filter(_.nonEmpty).grouped(2)
        .collect { case Array(k, v) => k -> v }.toMap
      lastStartupParams = kv

      val idOk = kv.get("user").contains(expectedUser) &&
        kv.get("database").contains(expectedDatabase)
      requiredPassword match {
        case Some(want) => authMode match {
          case "cleartext" =>
            msg(out, 'R', java.nio.ByteBuffer.allocate(4).putInt(3).array())
            out.flush()
            val got = new String(readP(in), StandardCharsets.UTF_8)
              .stripSuffix("\u0000")
            sawPassword = Some(got)
            if (got != want || !idOk) {
              authFailed(out, kv.getOrElse("user", "?")); return
            }
          case "md5" =>
            val salt = Array[Byte](9, 8, 7, 6)
            msg(out, 'R', java.nio.ByteBuffer.allocate(8).putInt(5).put(salt).array())
            out.flush()
            val got = new String(readP(in), StandardCharsets.UTF_8)
              .stripSuffix("\u0000")
            sawPassword = Some(got)
            val inner = md5hex((want + kv.getOrElse("user", ""))
              .getBytes(StandardCharsets.UTF_8))
            val expect = "md5" + md5hex(
              inner.getBytes(StandardCharsets.UTF_8) ++ salt)
            if (got != expect || !idOk) {
              authFailed(out, kv.getOrElse("user", "?")); return
            }
          case "scram" =>
            if (!scramVerify(in, out, want) || !idOk) {
              authFailed(out, kv.getOrElse("user", "?")); return
            }
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

object FakePgServer {

  /** Self-signed localhost server SSLContext + a PKCS#12 truststore file a
    * client can pin, generated with the JDK's own keytool (no fixture
    * blobs). Returns (serverContext, trustStorePath, trustStorePassword).
    */
  def selfSignedTls(): (javax.net.ssl.SSLContext, String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pg-tls")
    val ks = dir.resolve("server.p12").toString
    val pass = "graft-test"
    val cmd = Seq("keytool", "-genkeypair", "-alias", "pg", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", pass, "-keypass", pass,
      "-dname", "CN=127.0.0.1", "-validity", "2")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val exit = p.waitFor()
    require(exit == 0, s"keytool failed ($exit): " +
      new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8))
    val store = java.security.KeyStore.getInstance("PKCS12")
    val is = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(ks))
    try store.load(is, pass.toCharArray) finally is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, pass.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    // the same PKCS#12 doubles as the client truststore: it contains the
    // self-signed cert, which is its own anchor
    (ctx, ks, pass)
  }
}
