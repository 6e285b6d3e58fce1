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
}
