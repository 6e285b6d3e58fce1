package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per-partition in batches
  * (the Scala analogue of mapInPandas). The container ships no image/audio
  * codecs, so [[decodeStub]] is a clearly-marked deterministic fake — the
  * REAL parts are the schema, the partition-level batch shape, and the
  * executor-side iteration, which is exactly what a production decode
  * (JNI codec / ONNX feature extractor) would plug into.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decode: a real implementation would decompress the payload and
    * run a codec/feature extractor here. This fake derives a deterministic
    * 4-float "feature vector" from payload bytes so the plumbing is
    * testable end-to-end. Marked per the multimodal contract — do NOT ship
    * as a real decoder.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    var a = 0L
    payload.foreach(b => a = a * 31 + (b & 0xff))
    Array(payload.length.toFloat, (a & 0xffff).toFloat,
      ((a >> 16) & 0xffff).toFloat, ((a >> 32) & 0xffff).toFloat)
  }

  /** (id, payload binary) → feature rows, executed per partition on the
    * executors: no collect, no shuffle; partition sizing is controlled by
    * the upstream reader (spark.sql.files.maxPartitionBytes) exactly as it
    * would be for real image shards.
    */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), payload.length.toLong, "stub", decodeStub(payload))
        }
      }(enc)
  }

  /** Documents → multimodal-shaped frame (text bytes standing in for a real
    * binary modality).
    */
  def asBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("content_type"))

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  /** STUB resize: a real implementation would decode the image and
    * bilinear-resample; this fake nearest-neighbour-samples payload bytes
    * into a w×h buffer so the executor-side batch plumbing (fixed output
    * geometry, per-partition iteration, no shuffle) is real and testable.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(resizedSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val out = new Array[Byte](width * height)
          // empty payload → all-zero buffer (a real decoder would error or
          // emit a blank frame; zeros keep the stub total)
          if (payload.nonEmpty) {
            var i = 0
            while (i < out.length) {
              out(i) = payload((i.toLong * payload.length / out.length).toInt)
              i += 1
            }
          }
          Row(r.getLong(0), width, height, out)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame sampling: a real implementation would demux a video and
    * decode every Nth keyframe; this fake slices the payload into
    * `frameSize`-byte chunks and keeps every `everyN`th — one output row per
    * sampled frame, the real flatMap-shaped plumbing a demuxer plugs into.
    */
  def frameSampleStub(df: DataFrame, frameSize: Int, everyN: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          val frames = payload.grouped(frameSize).toSeq
          frames.indices.collect {
            case i if i % everyN == 0 => Row(r.getLong(0), i, frames(i))
          }
        }
      }(enc)
  }
}
