package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Deletion-vector kernels for [[graft.sinks.DeltaSink]]'s merge-on-read
  * DELETE (Delta deletion vectors, reader v3 / writer v7): a deleted-row
  * set is a 64-bit roaring bitmap of row indexes WITHIN one data file
  * (the parquet reader's `_metadata.row_index`), stored as a sidecar
  * `.bin` — the data file itself is never rewritten, which is the whole
  * point at 100 TB (a 1-row delete in a 2-GB file costs KBs, not 2 GB).
  *
  * Read-side application is ONE native expression over the whole scan —
  * `NOT dvDeleted(<all DVs of the snapshot>, file_path, row_index)` —
  * never a join: the serialized bitmaps ride the plan as a binary
  * literal (KBs–MBs for millions of deleted rows; roaring compresses
  * runs), deserialize once per executor via a transient lazy val, and
  * probe in O(1) per row. Zero overhead when no live file carries a DV:
  * the expression is never planted.
  */
object DeletionVector {
  private def col(e: Expression): Column = GraftColumnBridge.column(e)
  private def expr(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Portable bytes of one bitmap (RoaringBitmap's own serialization). */
  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def bitmapOf(positions: Iterator[Long]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    positions.foreach(bm.addLong)
    bm
  }

  /** OR-merge of serialized bitmaps — a re-delete on a file that already
    * carries a DV unions into ONE descriptor per file.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bm = deserialize(a)
    bm.or(deserialize(b))
    serialize(bm)
  }

  /** One binary blob holding every (file key → bitmap bytes) of a
    * snapshot — the literal [[dvDeleted]] plants in the plan.
    */
  def packMap(m: Map[String, Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeInt(v.length); out.write(v)
    }
    out.flush()
    bos.toByteArray
  }

  def unpackMap(b: Array[Byte]): Map[String, Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val n = in.readInt()
    (0 until n).map { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val vb = new Array[Byte](in.readInt()); in.readFully(vb)
      (new String(kb, java.nio.charset.StandardCharsets.UTF_8), vb)
    }.toMap
  }

  /** TRUE when (`path`, `pos`) is deleted by the packed DV map. */
  def dvDeleted(packedMap: Array[Byte], path: Column, pos: Column): Column =
    col(DvDeleted(Literal(packedMap, BinaryType), expr(path), expr(pos)))

  /** [[dvDeleted]] with the packed map shipped as a BROADCAST variable
    * instead of a plan literal — the fallback past
    * [[graft.sinks.DeltaSink]]'s size threshold: a multi-MB literal would
    * be serialized into every task binary, where a broadcast ships once
    * per executor over the torrent protocol.
    */
  def dvDeletedBroadcast(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      path: Column, pos: Column): Column =
    col(DvDeletedBroadcast(bc, expr(path), expr(pos)))

  // ---------------------------------------------------------------------
  // Delta-spec serialization of deletion vectors (Delta PROTOCOL.md
  // "Deletion Vector Descriptor" / "Deletion Vector Format"): the sidecar
  // framing, the RoaringBitmapArray "portable" payload, and the RFC 1924
  // base85 UUID encoding that storageType "u" descriptors carry — what an
  // EXTERNAL spec-compliant Delta reader parses. The in-plan probe above
  // keeps its own compact Roaring64 packing (a plan artifact, never a
  // file).
  // ---------------------------------------------------------------------

  /** Magic number heading a portable RoaringBitmapArray (Delta spec). */
  val PortableMagic = 1681511377

  /** RFC 1924 base85 alphabet — the character set Delta's storageType "u"
    * encodes DV UUIDs with (PROTOCOL.md: "Base85 variant with the
    * character set from RFC 1924"; the ZeroMQ Z85 variant differs in
    * alphabet order only).
    */
  private val B85: Array[Char] =
    (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z') ++ "!#$%&()*+-;<=>?@^_`{|}~").toArray
  private val B85Rev: Array[Int] = {
    val r = Array.fill(128)(-1)
    B85.zipWithIndex.foreach { case (c, i) => r(c.toInt) = i }
    r
  }

  /** 4-byte-aligned base85 encode (16-byte UUID → 20 chars). */
  def base85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "base85 encodes 4-byte blocks")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      val block = new Array[Char](5)
      var j = 4
      while (j >= 0) { block(j) = B85((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(block)
      i += 4
    }
    sb.toString
  }

  def base85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "base85 decodes 5-char blocks")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) B85Rev(c.toInt) else -1
        require(d >= 0, s"not a base85 character: $c")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def encodeUuid(uuid: java.util.UUID): String = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    base85Encode(bb.array())
  }

  def decodeUuid(encoded: String): java.util.UUID = {
    require(encoded.length == 20, s"encoded UUID must be 20 chars, got ${encoded.length}")
    val bb = java.nio.ByteBuffer.wrap(base85Decode(encoded))
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  /** Serializes a row-index set as a PORTABLE RoaringBitmapArray (Delta
    * spec): little-endian magic 1681511377, little-endian 8-byte bitmap
    * count, then one standard-format 32-bit RoaringBitmap per consecutive
    * high-32-bit key from 0 (empty keys included) — each index n lives in
    * bitmap n >>> 32 at value n.toInt.
    */
  def toPortable(bm: Roaring64Bitmap): Array[Byte] = {
    import org.roaringbitmap.RoaringBitmap
    val byKey = scala.collection.mutable.LinkedHashMap.empty[Int, RoaringBitmap]
    val it = bm.getLongIterator
    var maxKey = -1
    while (it.hasNext) {
      val v = it.next()
      require(v >= 0, s"row index must be non-negative: $v")
      val key = (v >>> 32).toInt
      maxKey = math.max(maxKey, key)
      byKey.getOrElseUpdate(key, new RoaringBitmap()).add(v.toInt)
    }
    val bitmaps = (0 to maxKey).map(k => byKey.getOrElse(k, new RoaringBitmap()))
    bitmaps.foreach(_.runOptimize())
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes()).sum
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach(_.serialize(bb))
    bb.array()
  }

  def fromPortable(bytes: Array[Byte]): Roaring64Bitmap = {
    import org.roaringbitmap.RoaringBitmap
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"not a portable RoaringBitmapArray: magic $magic != $PortableMagic")
    val n = bb.getLong
    val out = new Roaring64Bitmap()
    var key = 0L
    while (key < n) {
      val rb = new RoaringBitmap()
      rb.deserialize(bb)
      bb.position(bb.position() + rb.serializedSizeInBytes())
      val it = rb.getIntIterator
      while (it.hasNext) out.addLong((key << 32) | (it.next() & 0xffffffffL))
      key += 1
    }
    out
  }

  /** Frames one portable bitmap payload as a Delta-spec DV FILE: version
    * byte 1, then [4-byte big-endian dataSize][payload][4-byte big-endian
    * CRC-32 of payload]. Returns (fileBytes, offset, dataSize) — offset
    * (1: right after the version byte) and dataSize are what the add
    * action's descriptor records.
    */
  def frameDvFile(payload: Array[Byte]): (Array[Byte], Int, Int) = {
    val (bytes, offsets) = frameDvFileMulti(Seq(payload))
    (bytes, offsets.head._1, offsets.head._2)
  }

  /** Multi-DV file framing (the spec's intended shape at scale — real
    * writers pack EVERY deletion vector of one commit into a single
    * sidecar object instead of littering the store with per-file blobs):
    * one version byte, then each payload as [dataSize BE][payload][CRC-32
    * BE] back to back. Returns (fileBytes, per-payload (offset,
    * dataSize)) — each descriptor records the same file with its own
    * offset.
    */
  def frameDvFileMulti(payloads: Seq[Array[Byte]]): (Array[Byte], Seq[(Int, Int)]) = {
    require(payloads.nonEmpty, "a DV file needs at least one bitmap")
    val total = 1 + payloads.map(p => 4 + p.length + 4).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.put(1.toByte)
    val offsets = payloads.map { p =>
      val off = bb.position()
      val crc = new java.util.zip.CRC32()
      crc.update(p)
      bb.putInt(p.length)
      bb.put(p)
      bb.putInt(crc.getValue.toInt)
      (off, p.length)
    }
    (bb.array(), offsets)
  }

  /** Parses one DV out of a spec-framed file: verifies the format
    * version, the recorded size, the CRC-32, and the portable magic, then
    * returns the bitmap. `offset` addresses the dataSize field of this
    * DV's blob (descriptors in multi-DV files carry distinct offsets).
    */
  def readDvFile(fileBytes: Array[Byte], offset: Int, sizeInBytes: Long): Roaring64Bitmap = {
    require(fileBytes.nonEmpty && fileBytes(0) == 1,
      s"unsupported DV file format version: ${if (fileBytes.isEmpty) "<empty>" else fileBytes(0)}")
    readFramedAt(fileBytes, offset, sizeInBytes)
  }

  /** One framed DV blob ([dataSize BE][portable payload][CRC-32 BE]) at
    * `offset` of an arbitrary container — the shared parse under
    * [[readDvFile]] (Delta sidecars, version byte at file start) and the
    * Iceberg V3 Puffin reader (blobs ride a Puffin wrapper, so there is
    * no leading version byte to demand).
    */
  def readFramedAt(fileBytes: Array[Byte], offset: Int, sizeInBytes: Long): Roaring64Bitmap = {
    val bb = java.nio.ByteBuffer.wrap(fileBytes)
    bb.position(offset)
    val dataSize = bb.getInt
    require(dataSize.toLong == sizeInBytes,
      s"DV size mismatch: file records $dataSize, descriptor says $sizeInBytes")
    val payload = new Array[Byte](dataSize)
    bb.get(payload)
    val stored = bb.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    require(stored == crc.getValue.toInt,
      f"DV checksum mismatch: stored 0x$stored%08x, computed 0x${crc.getValue.toInt}%08x")
    fromPortable(payload)
  }
}

/** The read-side probe: deserializes the packed (file → bitmap) map ONCE
  * per executor (transient lazy, keyed by UTF8String so the per-row
  * lookup allocates nothing) and answers membership in O(1). Evaluated
  * (CodegenFallback) — it gates only DV-carrying scans, and the probe is
  * a hash lookup + bitmap contains, not worth a codegen template.
  */
case class DvDeleted(dvMap: Expression, path: Expression, pos: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(dvMap, path, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_deleted"
  override lazy val deterministic: Boolean = true

  @transient private lazy val bitmaps: Map[UTF8String, Roaring64Bitmap] =
    DeletionVector.unpackMap(dvMap.eval(null).asInstanceOf[Array[Byte]])
      .map { case (k, v) =>
        UTF8String.fromString(k) -> DeletionVector.deserialize(v)
      }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val i = pos.eval(input)
    if (p == null || i == null) false
    else bitmaps.get(p.asInstanceOf[UTF8String]) match {
      case Some(bm) => bm.contains(i.asInstanceOf[Long])
      case None => false
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dvMap = newChildren(0), path = newChildren(1), pos = newChildren(2))
}

/** [[DvDeleted]] with the packed map carried by a BROADCAST variable:
  * past [[graft.sinks.DeltaSink.DvLiteralMaxBytes]] the map would bloat
  * every serialized task, so it ships once per executor instead. Same
  * probe, same O(1) per row; the broadcast handle serializes with the
  * expression (Spark broadcasts are Serializable by design).
  */
case class DvDeletedBroadcast(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    path: Expression, pos: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(path, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_deleted_bc"
  override lazy val deterministic: Boolean = true

  @transient private lazy val bitmaps: Map[UTF8String, Roaring64Bitmap] =
    DeletionVector.unpackMap(bc.value).map { case (k, v) =>
      UTF8String.fromString(k) -> DeletionVector.deserialize(v)
    }

  override def eval(input: InternalRow): Any = {
    val p = path.eval(input)
    val i = pos.eval(input)
    if (p == null || i == null) false
    else bitmaps.get(p.asInstanceOf[UTF8String]) match {
      case Some(bm) => bm.contains(i.asInstanceOf[Long])
      case None => false
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(path = newChildren(0), pos = newChildren(1))
}
