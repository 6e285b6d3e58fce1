package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Iceberg partition-transform hashing (Iceberg spec §Appendix B): the
  * `bucket[N]` transform is `(murmur3_x86_32(encode(v)) & Int.MaxValue) % N`
  * with the SPEC's value encoding — int/long/date/timestamp hash as the
  * 8-byte little-endian LONG (ints widen first, so bucket(34:int) ==
  * bucket(34:long)), strings hash their UTF-8 bytes. Using the spec
  * hashing (not Spark's differently-seeded `hash()`) keeps the layout
  * interoperable: an external Iceberg reader prunes our buckets and vice
  * versa. IcebergTransformSpec pins the spec's published test vectors
  * (34 → 2017239379, "iceberg" → 1210000089, 2017-11-16 → -653330422,
  * 2017-11-16T22:31:08 → -2047944441).
  */
object IcebergTransforms {

  /** murmur3_x86_32, seed 0 — the public-domain algorithm the Iceberg
    * spec mandates for bucket transforms.
    */
  def murmur3_32(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  private def longLE(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Spec hash of a LONG-encodable value (int/long/date-days/timestamp-µs). */
  def hashLong(v: Long): Int = murmur3_32(longLE(v))

  /** Spec hash of a string (UTF-8 bytes). */
  def hashString(s: String): Int =
    murmur3_32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Bucket id: (hash & Int.MaxValue) % n. */
  def bucketOfHash(h: Int, n: Int): Int = (h & Int.MaxValue) % n

  def bucketExpr(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      IcebergBucketExpr(org.apache.spark.sql.GraftColumnBridge.expression(c), n))
}

/** `bucket[n]` as an eval-only expression — runs once per written row at
  * staging time, so codegen buys nothing; the INPUT encoding per type is
  * the Iceberg spec's, documented on [[IcebergTransforms]].
  */
case class IcebergBucketExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  require(n > 0, s"bucket count must be positive, got $n")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = s"graft_iceberg_bucket_$n"
  override protected def withNewChildInternal(c: Expression): IcebergBucketExpr =
    copy(child = c)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | ShortType | ByteType | StringType |
           DateType | TimestampType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName supports int/long/string/date/timestamp, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val h = child.dataType match {
      case StringType => IcebergTransforms.hashString(v.toString)
      case IntegerType | DateType => IcebergTransforms.hashLong(v.asInstanceOf[Int].toLong)
      case ShortType => IcebergTransforms.hashLong(v.asInstanceOf[Short].toLong)
      case ByteType => IcebergTransforms.hashLong(v.asInstanceOf[Byte].toLong)
      case LongType | TimestampType => IcebergTransforms.hashLong(v.asInstanceOf[Long])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    IcebergTransforms.bucketOfHash(h, n)
  }
}
