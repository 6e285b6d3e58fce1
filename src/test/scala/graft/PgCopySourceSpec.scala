package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import graft.sinks.DeltaSink
import graft.sources.{CopyBinary, PgCopyBinarySource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end recorded-wire Postgres path: the reference's own fixture
  * (tests/postgres-init-scripts/init-pg-data.sql — 25,001 rows: one
  * all-NULL row, 25k generated rows, hand-set numeric edge values) is
  * encoded into genuine COPY BINARY wire bytes, decoded by the source,
  * and asserted cell-by-cell exactly as the reference's integration test
  * does (tests/basic_integration.rs:246-427), then round-tripped through
  * the Delta sink — the reference's flagship pg→lakehouse pipeline.
  */
class PgCopySourceSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  /** NUMERIC(8,3) typmod: ((precision << 16) | scale) + VARHDRSZ. */
  private val Numeric8x3 = ((8 << 16) | 3) + 4

  private val cols = Seq(
    ("id", "int8", -1), ("cbool", "bool", -1), ("cchar", "char", -1),
    ("cint2", "int2", -1), ("cint4", "int4", -1), ("cint8", "int8", -1),
    ("cfloat4", "float4", -1), ("cfloat8", "float8", -1),
    ("ctimestamp", "timestamp", -1), ("ctimestamptz", "timestamptz", -1),
    ("cdate", "date", -1), ("cnumeric", "numeric", Numeric8x3),
    ("ctext", "text", -1), ("cbytea", "bytea", -1))

  // ---- COPY BINARY wire encoders (test fixture generator) ----

  private def be16(v: Int) = ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def be32(v: Int) = ByteBuffer.allocate(4).putInt(v).array()
  private def be64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
  private def bef4(v: Float) = ByteBuffer.allocate(4).putFloat(v).array()
  private def bef8(v: Double) = ByteBuffer.allocate(8).putDouble(v).array()

  /** PG wire numeric: base-10000 digit groups aligned to the decimal
    * point, sign/weight/dscale header (numeric.c send format).
    */
  private def pgNumeric(v: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(v.scale, 0)
    val sign = if (v.signum < 0) 0x4000 else 0x0000
    val a = v.abs
    val intStr = a.toBigInteger.toString
    val fracRaw = a.subtract(new java.math.BigDecimal(a.toBigInteger))
      .movePointRight(dscale).toBigIntegerExact.toString
    val fracStr = ("0" * (dscale - fracRaw.length)) + fracRaw
    val intPad = ("0" * ((4 - intStr.length % 4) % 4)) + intStr
    val fracPad = fracStr + ("0" * ((4 - fracStr.length % 4) % 4))
    val digits = (intPad + fracPad).grouped(4).map(_.toInt).toSeq
    val weight = intPad.length / 4 - 1
    val out = new ByteArrayOutputStream()
    out.write(be16(digits.length)); out.write(be16(weight))
    out.write(be16(sign)); out.write(be16(dscale))
    digits.foreach(d => out.write(be16(d)))
    out.toByteArray
  }

  /** Encodes tuples into one complete COPY BINARY stream. */
  private def stream(tuples: Seq[Seq[Option[Array[Byte]]]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.write(CopyBinary.Signature)
    dos.writeInt(0) // flags
    dos.writeInt(0) // header extension length
    tuples.foreach { fields =>
      dos.writeShort(fields.length)
      fields.foreach {
        case None => dos.writeInt(-1)
        case Some(b) => dos.writeInt(b.length); dos.write(b)
      }
    }
    dos.writeShort(-1) // trailer
    dos.flush()
    bos.toByteArray
  }

  /** Days 1970-01-01 → 2024-01-01 (basic_integration.rs:327) and the PG
    * J2000 offsets the wire values are relative to.
    */
  private val ElapsedDays = 19723L
  private val PgEpochDays = 10957L

  private def fixtureTuples: Seq[Seq[Option[Array[Byte]]]] = {
    val numericOverrides: Map[Int, java.math.BigDecimal] =
      Seq(1 -> "0.000", 2 -> "0.001", 3 -> "-0.002", 4 -> "3.000",
        5 -> "-4.000", 6 -> "50.001", 7 -> "99999.999", 8 -> "-99999.999")
        .map { case (s, d) => s -> new java.math.BigDecimal(d) }.toMap
    val nullRow: Seq[Option[Array[Byte]]] =
      Some(be64(1L)) +: Seq.fill(cols.length - 1)(Option.empty[Array[Byte]])
    val rows = (1 to 25000).map { s =>
      val pgMicros = ((ElapsedDays - PgEpochDays) * 86400L + s) * 1000000L
      val numeric = numericOverrides.getOrElse(s,
        java.math.BigDecimal.valueOf(s.toLong, 3))
      Seq(
        Some(be64(s + 1L)),                       // id (BIGSERIAL, null row took 1)
        Some(Array[Byte](if (s % 2 == 1) 1 else 0)), // cbool
        Some(Array[Byte]((s % 256 - 128).toByte)),   // cchar
        Some(be16(s)),                            // cint2
        Some(be32(s)),                            // cint4
        Some(be64(s.toLong)),                     // cint8
        Some(bef4(s + 0.5f)),                     // cfloat4
        Some(bef8(s + 0.5)),                      // cfloat8
        Some(be64(pgMicros)),                     // ctimestamp
        Some(be64(pgMicros)),                     // ctimestamptz
        Some(be32((ElapsedDays - PgEpochDays + s).toInt)), // cdate
        Some(pgNumeric(numeric)),                 // cnumeric
        Some(s.toString.getBytes("UTF-8")),       // ctext
        Some(be32(s)))                            // cbytea = int4send(s)
    }
    nullRow +: rows
  }

  private def checkCells(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.count() == 25001)
    // the reference's rb1 head assertions (basic_integration.rs:246-427)
    val head = df.orderBy("id").limit(9)
      .select(col("id"), col("cbool"), col("cchar"), col("cint2"),
        col("cint4"), col("cint8"), col("cfloat4"), col("cfloat8"),
        col("ctimestamp").cast("string").as("ts"),
        unix_micros(col("ctimestamptz")).as("tz_us"),
        col("cdate").cast("string").as("d"),
        col("cnumeric"), col("ctext"), col("cbytea"))
      .collect()
    val r0 = head(0) // the DEFAULT VALUES row: id only, everything else NULL
    assert(r0.getLong(0) == 1L)
    (1 until r0.length).foreach(i => assert(r0.isNullAt(i), s"field $i not null"))
    val r1 = head(1) // s = 1
    assert(r1.getLong(0) == 2L)
    assert(r1.getBoolean(1))
    assert(r1.getByte(2) == -127)
    assert(r1.getShort(3) == 1 && r1.getInt(4) == 1 && r1.getLong(5) == 1L)
    assert(r1.getFloat(6) == 1.5f && r1.getDouble(7) == 1.5)
    assert(r1.getString(8) == "2024-01-01 00:00:01")
    assert(r1.getLong(9) == (ElapsedDays * 86400L + 1) * 1000000L)
    assert(r1.getString(10) == "2024-01-02")
    assert(r1.getString(12) == "1")
    assert(r1.getAs[Array[Byte]](13).toSeq == Seq[Byte](0, 0, 0, 1))
    val r2 = head(2) // s = 2
    assert(!r2.getBoolean(1) && r2.getByte(2) == -126 && r2.getString(12) == "2")
    // the numeric edge cells: unscaled values at DECIMAL(8,3)
    assert(df.schema("cnumeric").dataType == DecimalType(8, 3))
    val numerics = head.drop(1).map(_.getDecimal(11).unscaledValue().longValue())
    assert(numerics.toSeq == Seq(0L, 1L, -2L, 3000L, -4000L, 50001L, 99999999L, -99999999L))
  }

  test("25,001-row recorded COPY BINARY fixture decodes to the contract cells") {
    val tuples = fixtureTuples
    val dir = Files.createTempDirectory("graft-pgwire")
    // two recorded streams = two Spark partitions (the partition-parallel
    // ranged-COPY shape); the split point is arbitrary
    val (t1, t2) = tuples.splitAt(12500)
    Files.write(dir.resolve("part-0.pgcopy"), stream(t1))
    Files.write(dir.resolve("part-1.pgcopy"), stream(t2))
    val src = PgCopyBinarySource.fromFiles(
      Seq(dir.resolve("part-0.pgcopy").toString, dir.resolve("part-1.pgcopy").toString),
      cols)
    assert(src.schema == StructType(cols.map { case (n, t, m) =>
      StructField(n, graft.sources.PgTypeMapping.sparkTypeFor(t, m), nullable = true)
    }))
    val df = src.load(spark)
    assert(df.rdd.getNumPartitions == 2)
    checkCells(df)
  }

  test("recorded wire fixture round-trips through the Delta sink (pg→lakehouse)") {
    val dir = Files.createTempDirectory("graft-pgwire2")
    Files.write(dir.resolve("all.pgcopy"), stream(fixtureTuples))
    val df = PgCopyBinarySource.fromFiles(Seq(dir.resolve("all.pgcopy").toString), cols).load(spark)
    val table = Files.createTempDirectory("graft-pgdelta").toString
    assert(DeltaSink.write(df, table))
    checkCells(DeltaSink.read(spark, table))
  }

  test("live socket transport: startup + PGPASSWORD auth + COPY over TCP decodes the contract cells (r8)") {
    val payload = stream(fixtureTuples)
    val wrapped = "COPY (SELECT * FROM t) TO STDOUT (FORMAT BINARY)"
    val server = new FakePgServer("loader", "testdb", Some("sekret"),
      sql => if (sql == wrapped) Some(payload) else None)
    try {
      val transport = graft.sources.PgSocketTransport("127.0.0.1", server.port,
        user = "loader", database = "testdb", query = "SELECT * FROM t",
        password = Some("sekret"))
      val df = PgCopyBinarySource(Seq(transport), cols).load(spark)
      checkCells(df)
      // the handshake really carried the startup params + cleartext password
      assert(server.lastStartupParams.get("user").contains("loader"))
      assert(server.lastStartupParams.get("database").contains("testdb"))
      assert(server.sawPassword.contains("sekret"))
    } finally server.close()
  }

  test("socket transport: missing PGPASSWORD and wrong password both fail loudly (r8)") {
    val server = new FakePgServer("loader", "testdb", Some("sekret"),
      _ => Some(stream(fixtureTuples.take(2))))
    try {
      // no password available at all → the reference's env-pickup contract
      val e1 = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT 1", password = None).copyOut()
      }
      assert(e1.getMessage.contains("PGPASSWORD"))
      // wrong password → the server's 28P01 message surfaces verbatim
      val e2 = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT 1", password = Some("nope")).copyOut()
      }
      assert(e2.getMessage.contains("password authentication failed"))
    } finally server.close()
  }

  test("socket transport: an ErrorResponse mid-stream aborts with the server's message (r8)") {
    val server = new FakePgServer("loader", "testdb", None,
      _ => Some(stream(fixtureTuples)), chunkSize = 1024, errorAfterChunks = Some(2))
    try {
      val e = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT * FROM t", password = None).copyOut()
      }
      assert(e.getMessage.contains("mid-stream"))
      assert(e.getMessage.contains("injected mid-stream failure"))
    } finally server.close()
  }

  test("socket transport: SCRAM-SHA-256 auth — proof verified server-side, mutual signature (r9)") {
    val payload = stream(fixtureTuples.take(3))
    val server = new FakePgServer("loader", "testdb", Some("sekret"),
      _ => Some(payload), authMode = "scram")
    try {
      val bytes = graft.sources.PgSocketTransport("127.0.0.1", server.port,
        "loader", "testdb", "SELECT * FROM t",
        password = Some("sekret")).copyOut()
      assert(bytes.sameElements(payload))
      assert(server.sawScram, "server must have VERIFIED a client proof")
      // wrong password → the proof fails verification, 28P01 surfaces
      val e = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT 1", password = Some("wrong")).copyOut()
      }
      assert(e.getMessage.contains("password authentication failed"))
    } finally server.close()
  }

  test("socket transport: MD5 auth — salted double-hash accepted, wrong password refused (r9)") {
    val payload = stream(fixtureTuples.take(2))
    val server = new FakePgServer("loader", "testdb", Some("sekret"),
      _ => Some(payload), authMode = "md5")
    try {
      val bytes = graft.sources.PgSocketTransport("127.0.0.1", server.port,
        "loader", "testdb", "SELECT * FROM t",
        password = Some("sekret")).copyOut()
      assert(bytes.sameElements(payload))
      assert(server.sawPassword.exists(_.startsWith("md5")),
        "client must send the md5-prefixed double hash, never the password")
      val e = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT 1", password = Some("wrong")).copyOut()
      }
      assert(e.getMessage.contains("password authentication failed"))
    } finally server.close()
  }

  test("socket transport: TLS handshake via SSLRequest, then SCRAM over the encrypted channel (r9)") {
    val (ctx, trustPath, trustPass) = FakePgServer.selfSignedTls()
    val payload = stream(fixtureTuples)
    val wrapped = "COPY (SELECT * FROM t) TO STDOUT (FORMAT BINARY)"
    val server = new FakePgServer("loader", "testdb", Some("sekret"),
      sql => if (sql == wrapped) Some(payload) else None,
      authMode = "scram", tlsContext = Some(ctx))
    try {
      val transport = graft.sources.PgSocketTransport("127.0.0.1", server.port,
        "loader", "testdb", "SELECT * FROM t", password = Some("sekret"),
        sslMode = "require", trustStore = Some((trustPath, trustPass)))
      val df = PgCopyBinarySource(Seq(transport), cols).load(spark)
      checkCells(df)
      assert(server.sawTls, "the conversation must have run over TLS")
      assert(server.sawScram)
    } finally server.close()
  }

  test("socket transport: sslMode ladder — require fails on 'N', prefer falls back (r9)") {
    val payload = stream(fixtureTuples.take(2))
    // no tlsContext: the server answers 'N' to SSLRequest
    val server = new FakePgServer("loader", "testdb", None, _ => Some(payload))
    try {
      val e = intercept[java.io.IOException] {
        graft.sources.PgSocketTransport("127.0.0.1", server.port,
          "loader", "testdb", "SELECT 1", password = None,
          sslMode = "require").copyOut()
      }
      assert(e.getMessage.contains("does not support TLS"))
      // prefer: same server, same connection style — plaintext fallback works
      val bytes = graft.sources.PgSocketTransport("127.0.0.1", server.port,
        "loader", "testdb", "SELECT * FROM t", password = None,
        sslMode = "prefer").copyOut()
      assert(bytes.sameElements(payload))
      assert(!server.sawTls)
      // an untrusted server cert fails the handshake under require (no
      // trust-all escape hatch): default JDK anchors reject self-signed
      val (ctx2, _, _) = FakePgServer.selfSignedTls()
      val tlsServer = new FakePgServer("loader", "testdb", None,
        _ => Some(payload), tlsContext = Some(ctx2))
      try {
        intercept[java.io.IOException] { // SSLHandshakeException is an IOException
          graft.sources.PgSocketTransport("127.0.0.1", tlsServer.port,
            "loader", "testdb", "SELECT 1", password = None,
            sslMode = "require", trustStore = None).copyOut()
        }
      } finally tlsServer.close()
    } finally server.close()
  }

  test("SCRAM passwords are SASLprep-normalized before Hi() (RFC 5802 §2.2, r10)") {
    val t = graft.sources.PgSocketTransport("127.0.0.1", 1, "u", "db", "SELECT 1",
      password = Some("unused"))
    // ASCII passes through byte-identical (fixture verifiers stay valid)
    assert(t.saslPrep("s3cret!Pass_99") == "s3cret!Pass_99")
    // B.1 map-to-nothing: soft hyphen, ZWSP/ZWNJ/ZWJ, word joiner, BOM
    assert(t.saslPrep("pa­ss​wo‌rd⁠﻿") == "password")
    // C.1.2 non-ASCII spaces collapse to SPACE before NFKC
    assert(t.saslPrep("a b c　d") == "a b c d")
    // NFKC: compatibility forms fold (ligature fi, fullwidth A, ℌ)
    assert(t.saslPrep("ﬁleＡℌ") == "fileAH")
    // prohibited output fails loudly instead of hashing divergent bytes
    val ctl = intercept[java.io.IOException] { t.saslPrep("badpw") }
    assert(ctl.getMessage.contains("U+0007"))
    intercept[java.io.IOException] { t.saslPrep("del") }
    intercept[java.io.IOException] { t.saslPrep("c1") }
    // unassigned code points (U+0378 has never been assigned) also reject
    intercept[java.io.IOException] { t.saslPrep("un͸assigned") }
    // r11: the full RFC 4013 prohibited-output tables C.3-C.9
    assert(intercept[java.io.IOException] { t.saslPrep("xy") }
      .getMessage.contains("C.3"))
    assert(intercept[java.io.IOException] { t.saslPrep("x￾y") }
      .getMessage.contains("C.4"))
    assert(intercept[java.io.IOException] { // plane-1 non-character U+1FFFE
      t.saslPrep("x" + new String(Character.toChars(0x1FFFE)) + "y") }
      .getMessage.contains("C.4"))
    assert(intercept[java.io.IOException] { t.saslPrep("x\uD800y") }
      .getMessage.contains("C.5"))
    assert(intercept[java.io.IOException] { t.saslPrep("x�y") }
      .getMessage.contains("C.6"))
    assert(intercept[java.io.IOException] { t.saslPrep("x⿰y") }
      .getMessage.contains("C.7"))
    assert(intercept[java.io.IOException] { t.saslPrep("x\u202Ey") }
      .getMessage.contains("C.8"))
    assert(intercept[java.io.IOException] { // tag character U+E0041
      t.saslPrep("x" + new String(Character.toChars(0xE0041)) + "y") }
      .getMessage.contains("C.9"))
    // RFC 3454 §6 bidi: pure RandALCat passes; LCat mixed in rejects
    assert(t.saslPrep("אב") == "אב")
    assert(intercept[java.io.IOException] { t.saslPrep("אaב") }
      .getMessage.contains("rule 2"))
    // a RandALCat string must END RandALCat too (U+0031 is EN, not RAL)
    assert(intercept[java.io.IOException] { t.saslPrep("א1") }
      .getMessage.contains("rule 3"))
  }

  test("malformed streams are rejected loudly") {
    intercept[IllegalArgumentException] {
      CopyBinary.decode("NOTPGCOPY".getBytes ++ Array.fill(20)(0.toByte), cols).toList
    }
    // tuple field-count mismatch
    val bad = {
      val bos = new ByteArrayOutputStream(); val dos = new DataOutputStream(bos)
      dos.write(CopyBinary.Signature); dos.writeInt(0); dos.writeInt(0)
      dos.writeShort(2) // claims 2 fields against a 14-column schema
      dos.writeInt(-1); dos.writeInt(-1); dos.writeShort(-1); dos.flush()
      bos.toByteArray
    }
    intercept[IllegalArgumentException] {
      CopyBinary.decode(bad, cols).toList
    }
  }
}
