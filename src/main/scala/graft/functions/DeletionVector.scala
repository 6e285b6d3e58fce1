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
