package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per-partition in batches
  * (the Scala analogue of mapInPandas). Payloads that magic-byte-sniff as
  * a JDK-decodable raster format (PNG/BMP/GIF — javax.imageio, no extra
  * dependency) take a REAL decode path: genuine pixel decode, grayscale
  * feature stats, nearest-neighbour resample. Everything else (video,
  * audio, the text-as-bytes test corpus) falls back to [[decodeStub]], a
  * clearly-marked deterministic fake — there the real parts are the
  * schema, the partition-level batch shape, and the executor-side
  * iteration, which is exactly what a production codec (JNI / ONNX
  * feature extractor) would plug into.
  */
object Multimodal {

  /** Magic-byte sniff: Some(format) only for formats the JDK's ImageIO
    * decodes everywhere ("png", "bmp", "gif", and since r8 "jpeg" — the
    * JDK bundles a JPEG plugin on every platform, and DedupSpec pins its
    * decoded feature values so IDCT determinism is a tested fact, not an
    * assumption); sniffing — not try-decode — keeps non-image payloads
    * off ImageIO entirely, so the stub path stays bit-stable no matter
    * what bytes arrive.
    */
  private[graft] def sniffImageFormat(p: Array[Byte]): Option[String] =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some("png")
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') Some("bmp")
    else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') Some("gif")
    else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff) Some("jpeg")
    else None

  private def readImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
    catch { case _: Exception => None }

  /** ITU-R BT.601 integer luma of a packed ARGB pixel — deterministic
    * across JVMs (pure int math, no color-management involvement).
    */
  private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff; val g = (argb >> 8) & 0xff; val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

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
    * would be for real image shards. Sniffed raster payloads decode for
    * real ([width, height, mean luma, luma variance] — deterministic
    * integer pixel math); everything else takes the declared stub.
    */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val real = for {
            fmt <- sniffImageFormat(payload)
            img <- readImage(payload)
          } yield {
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L; var sumSq = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val l = luma(img.getRGB(x, y)); sum += l; sumSq += l.toLong * l
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val mean = sum.toDouble / n
            val variance = sumSq.toDouble / n - mean * mean
            Row(r.getLong(0), payload.length.toLong, fmt,
              Array(w.toFloat, h.toFloat, mean.toFloat, variance.toFloat))
          }
          real.getOrElse(
            Row(r.getLong(0), payload.length.toLong, "stub", decodeStub(payload)))
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

  /** Resize to a fixed w×h grayscale buffer. Sniffed raster payloads
    * REALLY decode and nearest-neighbour-resample their pixels (manual
    * index math over getRGB — deterministic, no Java2D rendering
    * pipeline); other payloads nearest-neighbour-sample raw bytes (the
    * declared stub), so the executor-side batch plumbing (fixed output
    * geometry, per-partition iteration, no shuffle) is identical on both
    * paths.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(resizedSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val out = new Array[Byte](width * height)
          val img = sniffImageFormat(payload).flatMap(_ => readImage(payload))
          img match {
            case Some(im) =>
              val (w, h) = (im.getWidth, im.getHeight)
              var y = 0
              while (y < height) {
                val sy = (y.toLong * h / height).toInt
                var x = 0
                while (x < width) {
                  val sx = (x.toLong * w / width).toInt
                  out(y * width + x) = luma(im.getRGB(sx, sy)).toByte
                  x += 1
                }
                y += 1
              }
            case None =>
              // empty payload → all-zero buffer (a real decoder would error
              // or emit a blank frame; zeros keep the stub total)
              if (payload.nonEmpty) {
                var i = 0
                while (i < out.length) {
                  out(i) = payload((i.toLong * payload.length / out.length).toInt)
                  i += 1
                }
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
