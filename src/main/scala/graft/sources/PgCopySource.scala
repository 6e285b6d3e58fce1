package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** A pluggable batch source: the interface the reference's P1 source slot
  * implies (`PgArrowSource` produces schema + record batches,
  * /root/reference/src/pg_arrow_source.rs:201-273; the pipeline consumes it
  * source-agnostically through lib.rs). A Spark source produces a schema
  * and a DataFrame.
  */
trait Source {
  def schema: StructType
  def load(spark: SparkSession): DataFrame
}

/** Decoder for the Postgres COPY BINARY wire format (the stream
  * `COPY table TO STDOUT (FORMAT BINARY)` emits, and what the reference's
  * spawned connection task reads row-group-wise,
  * pg_arrow_source.rs:211-273): an 11-byte signature, int32 flags, int32
  * header-extension length, then per tuple an int16 field count and
  * length-prefixed big-endian field values (length −1 = NULL), terminated
  * by field count −1. Field bytes decode through the property-tested
  * [[PgTypeMapping]] contract — J2000 epoch rebase for dates/timestamps,
  * base-10000 truncating numeric decode.
  */
object CopyBinary {

  val Signature: Array[Byte] =
    Array('P', 'G', 'C', 'O', 'P', 'Y', '\n', 0xFF.toByte, '\r', '\n', 0x00).map(_.toByte)

  /** One wire field value → the Spark external value for its PG type. */
  private[sources] def fieldDecoder(pgType: String, typmod: Int): Array[Byte] => Any = {
    def bb(b: Array[Byte]) = ByteBuffer.wrap(b) // big-endian by default
    def micros(us: Long): (Long, Int) =
      (Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt)
    pgType match {
      case "bool" => b => b(0) != 0
      case "char" => b => b(0)
      case "int2" => b => bb(b).getShort
      case "int4" => b => bb(b).getInt
      case "int8" => b => bb(b).getLong
      case "float4" => b => bb(b).getFloat
      case "float8" => b => bb(b).getDouble
      case "timestamp" => b => {
        val (s, n) = micros(PgTypeMapping.rebaseMicros(bb(b).getLong))
        LocalDateTime.ofEpochSecond(s, n, ZoneOffset.UTC)
      }
      case "timestamptz" => b => {
        val (s, n) = micros(PgTypeMapping.rebaseMicros(bb(b).getLong))
        Instant.ofEpochSecond(s, n)
      }
      case "date" => b => LocalDate.ofEpochDay(PgTypeMapping.rebaseDays(bb(b).getInt).toLong)
      case "numeric" => b => {
        val scale =
          if (typmod >= 4) PgTypeMapping.numericTypmodScale(typmod) else 18
        new java.math.BigDecimal(
          PgTypeMapping.pgNumericToUnscaled(b, scale).bigInteger, scale)
      }
      case "text" | "varchar" | "bpchar" => b => new String(b, StandardCharsets.UTF_8)
      case "bytea" => b => b
      case other => throw new IllegalArgumentException(
        s"Unsupported Postgres type '$other'. Cast the column to text in the query.")
    }
  }

  /** Lazily decodes one COPY BINARY stream into external-typed Rows.
    * `cols` are (name, pgType, typmod) as [[PgTypeMapping.toSchema]] takes.
    */
  def decode(bytes: Array[Byte], cols: Seq[(String, String, Int)]): Iterator[Row] = {
    val buf = ByteBuffer.wrap(bytes)
    val sig = new Array[Byte](Signature.length)
    buf.get(sig)
    require(java.util.Arrays.equals(sig, Signature), "not a COPY BINARY stream (bad signature)")
    buf.getInt // flags: bit 16 = OIDs included (never set by modern PG)
    val extLen = buf.getInt
    buf.position(buf.position() + extLen)
    val decoders = cols.map { case (_, t, m) => fieldDecoder(t, m) }.toArray

    new Iterator[Row] {
      private var nFields: Int = buf.getShort.toInt
      override def hasNext: Boolean = nFields != -1
      override def next(): Row = {
        require(nFields == decoders.length,
          s"tuple has $nFields fields, schema has ${decoders.length}")
        val vals = new Array[Any](decoders.length)
        var i = 0
        while (i < decoders.length) {
          val len = buf.getInt
          if (len >= 0) {
            val b = new Array[Byte](len)
            buf.get(b)
            vals(i) = decoders(i)(b)
          }
          i += 1
        }
        nFields = if (buf.remaining() >= 2) buf.getShort.toInt else -1
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }
  }
}

/** [[Source]] over recorded/ranged COPY BINARY streams: one stream per
  * file, one Spark partition per stream, each executor decoding its own
  * stream — the shape a partition-parallel `COPY (SELECT … WHERE id
  * BETWEEN lo AND hi) TO STDOUT (FORMAT BINARY)` export produces at scale.
  * The container ships no Postgres driver (SURVEY.md §7.1), so streams
  * arrive as bytes (recorded files here, object-store objects in
  * production) rather than from a live socket; the wire decode is
  * identical either way.
  */
final case class PgCopyBinarySource(paths: Seq[String],
    cols: Seq[(String, String, Int)]) extends Source {

  override val schema: StructType = PgTypeMapping.toSchema(cols)

  override def load(spark: SparkSession): DataFrame = {
    require(paths.nonEmpty, "no COPY BINARY streams to load")
    val colsB = cols
    val rows = spark.sparkContext
      .parallelize(paths, paths.size)
      .flatMap(p => CopyBinary.decode(Files.readAllBytes(Paths.get(p)), colsB))
    spark.createDataFrame(rows, schema)
  }
}
