package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed per-partition in batches
  * (the Scala analogue of mapInPandas). Payloads that magic-byte-sniff as
  * a JDK-decodable raster format (PNG/BMP/GIF/JPEG — javax.imageio, no
  * extra dependency) take a REAL decode path: genuine pixel decode,
  * grayscale feature stats, nearest-neighbour resample. RIFF/WAVE PCM
  * audio (r8) also decodes for real — a hand-rolled chunk walk +
  * little-endian sample read ([[decodeWav]], pure JVM integer math) with
  * exact mean/variance features. Everything else (video, compressed
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

  /** RIFF/WAVE magic sniff (the audio analogue of [[sniffImageFormat]]). */
  private[graft] def sniffWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private[graft] case class WavPcm(sampleRate: Int, bitsPerSample: Int,
      channels: Int, samples: Array[Int])

  /** REAL WAV decode — hand-rolled RIFF chunk walk + PCM sample read (pure
    * JVM integer math, no library): `fmt ` must declare PCM (audioFormat
    * 1) at 8 or 16 bits; `data` holds little-endian samples (8-bit
    * unsigned re-centred to signed, 16-bit signed). Malformed or
    * compressed payloads → None (callers fall back to the stub), so a
    * truncated file can never crash an executor.
    */
  private[graft] def decodeWav(p: Array[Byte]): Option[WavPcm] = {
    if (!sniffWav(p)) return None
    def le16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    try {
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None     // (offset, length)
      while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(p, off, 4, "US-ASCII")
        val size = le32(off + 4)
        // bound check in LONG arithmetic: a crafted size near Int.MaxValue
        // would wrap `off + 8 + size` negative and pass an int comparison,
        // then die allocating a multi-GB sample array (OutOfMemoryError is
        // not an Exception — the catch below wouldn't save the task)
        if (size < 0 || off.toLong + 8L + size.toLong > p.length.toLong) return None
        id match {
          case "fmt " =>
            if (size < 16 || le16(off + 8) != 1) return None // PCM only
            fmt = Some((le16(off + 10), le32(off + 12), le16(off + 22)))
          case "data" => data = Some((off + 8, size))
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data) yield {
        require(channels >= 1 && (bits == 8 || bits == 16), "unsupported PCM shape")
        val bytesPer = bits / 8
        val n = dLen / bytesPer
        val samples = new Array[Int](n)
        var i = 0
        while (i < n) {
          samples(i) =
            if (bits == 8) (p(dOff + i) & 0xff) - 128
            else le16(dOff + i * 2).toShort.toInt
          i += 1
        }
        WavPcm(rate, bits, channels, samples)
      }
    } catch { case _: Exception => None }
  }

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

  /** Number of luma-histogram bins appended to raster feature vectors:
    * 16 bins of width 16 over the 0..255 BT.601 luma range (bin = l >> 4).
    */
  val LumaHistBins = 16

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
    * real — [width, height, mean luma, luma variance] followed by a
    * [[LumaHistBins]]-bin NORMALIZED luma histogram (bin l>>4, exact
    * integer counts over the decoded pixels divided by n) — deterministic
    * integer pixel math end-to-end; everything else takes the declared
    * stub.
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
            val hist = new Array[Long](LumaHistBins)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val l = luma(img.getRGB(x, y)); sum += l; sumSq += l.toLong * l
                hist(l >> 4) += 1
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val mean = sum.toDouble / n
            val variance = sumSq.toDouble / n - mean * mean
            Row(r.getLong(0), payload.length.toLong, fmt,
              Array(w.toFloat, h.toFloat, mean.toFloat, variance.toFloat) ++
                hist.map(c => (c.toDouble / n).toFloat))
          }
          val realAudio = if (real.isEmpty) decodeWav(payload).map { w =>
            // [n_samples, sample_rate, mean, variance] — exact long sums
            // over decoded PCM, deterministic across JVMs
            var sum = 0L; var sumSq = 0L
            w.samples.foreach { s => sum += s; sumSq += s.toLong * s }
            val n = math.max(1L, w.samples.length.toLong)
            val mean = sum.toDouble / n
            val variance = sumSq.toDouble / n - mean * mean
            Row(r.getLong(0), payload.length.toLong, "wav",
              Array(w.samples.length.toFloat, w.sampleRate.toFloat,
                mean.toFloat, variance.toFloat))
          } else None
          real.orElse(realAudio).getOrElse(
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
    * REALLY decode and area-average-resample (r10): each output cell is
    * the exact integer mean BT.601 luma of its source pixel block
    * ([[lumaThumb]] — the proper downsampling filter, no aliasing, no
    * Java2D rendering pipeline, deterministic across JVMs). Non-raster
    * payloads nearest-neighbour-sample raw bytes (the declared stub), so
    * the executor-side batch plumbing (fixed output geometry,
    * per-partition iteration, no shuffle) is identical on both paths.
    */
  def resize(df: DataFrame, width: Int, height: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(resizedSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val img = sniffImageFormat(payload).flatMap(_ => readImage(payload))
          val out = img match {
            case Some(im) => lumaThumb(im, width, height)
            case None =>
              // empty payload → all-zero buffer (a real decoder would error
              // or emit a blank frame; zeros keep the stub total)
              val buf = new Array[Byte](width * height)
              if (payload.nonEmpty) {
                var i = 0
                while (i < buf.length) {
                  buf(i) = payload((i.toLong * payload.length / buf.length).toInt)
                  i += 1
                }
              }
              buf
          }
          Row(r.getLong(0), width, height, out)
        }
      }(enc)
  }

  /** Pre-r10 name for [[resize]] (the raster path has since graduated from
    * nearest-neighbour to exact area-averaging; the non-raster byte
    * sampling is still the labeled stub).
    */
  @deprecated("use resize", "r10")
  def resizeStub(df: DataFrame, width: Int, height: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame =
    resize(df, width, height, idCol, payloadCol)

  val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** 64-bit perceptual difference hash (dHash) of an image payload —
    * the standard near-duplicate-image fingerprint: decode, area-average
    * the luma plane onto a 9×8 grid, set bit (y*8+x) when cell (x,y) is
    * brighter than its right neighbour. Small edits (re-encode, crop a
    * border, tweak a few pixels) flip only a few bits, so near-duplicate
    * pairs sit within a small Hamming radius and the SimHash banding
    * machinery (4×16-bit bands → equi-join) finds them without an
    * all-pairs comparison. Pure integer math over exact pixel-block sums
    * (no Java2D rescale, no float accumulation) — deterministic across
    * JVMs, which DedupSpec pins.
    *
    * Payloads that don't sniff+decode as a raster fall back to a 64-bit
    * SimHash over byte 4-gram shingles ([[byteSimHash64]]) — still a real
    * similarity-preserving content fingerprint (near-identical byte
    * streams land at small Hamming distance; identical payloads at 0), it
    * just isn't *perceptual*: format="stub" labels rows where no codec
    * ran, so a caller can route undecodable media to a real JNI/codec
    * stage instead.
    */
  private[graft] def dHash64(im: java.awt.image.BufferedImage): Long = {
    val (w, h) = (im.getWidth, im.getHeight)
    val (gw, gh) = (9, 8)
    val cells = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      // exact integer cell bounds: pixel rows [y0,y1), cols [x0,x1)
      val y0 = (gy.toLong * h / gh).toInt
      val y1 = math.max(y0 + 1, ((gy + 1).toLong * h / gh).toInt)
      var gx = 0
      while (gx < gw) {
        val x0 = (gx.toLong * w / gw).toInt
        val x1 = math.max(x0 + 1, ((gx + 1).toLong * w / gw).toInt)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { sum += luma(im.getRGB(x, y)); x += 1 }
          y += 1
        }
        val n = math.max(1L,
          (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0))
        cells(gy * gw + gx) = sum / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val gy2 = i / 8; val gx2 = i % 8
      if (cells(gy2 * gw + gx2) > cells(gy2 * gw + gx2 + 1)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** 64-bit SimHash over byte 4-gram shingles — the non-raster fallback
    * fingerprint: per-shingle 64-bit mix (splitmix64 finalizer over the
    * packed 4 bytes + position-free), majority vote per bit. Pure integer
    * math, deterministic across JVMs.
    */
  private[graft] def byteSimHash64(p: Array[Byte]): Long = {
    if (p.length < 4) {
      // degenerate payloads: mix whatever bytes exist so "" ≠ "a"
      var a = 0x9e3779b97f4a7c15L
      p.foreach(b => a = mix64(a ^ (b & 0xffL)))
      return a
    }
    val votes = new Array[Int](64)
    var i = 0
    while (i + 4 <= p.length) {
      val sh = ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
      val h = mix64(sh)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) bits |= (1L << b); b += 1 }
    bits
  }

  /** splitmix64 finalizer (public-domain constant schedule). */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** (id, payload) → (id, format, 64-bit dHash), per-partition on the
    * executors: zero shuffle — the banding/join that turns hashes into
    * duplicate pairs is the caller's (q_image_phash's) only exchange.
    */
  def perceptualHash(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(phashSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val real = for {
            fmt <- sniffImageFormat(payload)
            img <- readImage(payload)
          } yield Row(r.getLong(0), fmt, dHash64(img))
          real.getOrElse(Row(r.getLong(0), "stub", byteSimHash64(payload)))
        }
      }(enc)
  }

  /** OR-amplified LSH band keys over 64-bit perceptual hashes (SURVEY
    * note 28): wider-than-Hamming-3 recall routes to MORE TABLES, never
    * narrower bands — band values must stay 16-bit so buckets stay sparse
    * (Σ bucket² sub-quadratic; 9-bit bands were measured 7.9× super-linear
    * in the r8 scaling audit).
    *
    *  - table 0: the 4 contiguous 16-bit bands (pigeonhole-exact at
    *    Hamming ≤ 3: ≤3 differing bits always leave one band untouched);
    *  - table 1: the 4 BYTE-PAIR bands (bytes b and b+4 packed into 16
    *    bits) — orthogonal to the contiguous split, so bit patterns that
    *    touch every contiguous band (e.g. one flipped bit per 16-bit
    *    lane, the pattern small geometric shifts produce in dHashes)
    *    usually leave a byte-pair band clean. OR-ing both tables
    *    amplifies recall toward Hamming ≤ 6 probabilistically; the
    *    verify filter stays exact either way.
    *
    * Band ids are disjoint across tables (0..3, 4..7), so ONE equi-join
    * on (band, bandBits) serves the union — per-table bucket occupancy is
    * unchanged and candidate volume is ≤ 2× the single-table count.
    * Returns (doc_id, phash, band, bandBits).
    */
  def phashBands(sig: DataFrame, nTables: Int): DataFrame = {
    require(nTables >= 1 && nTables <= 2, s"1 or 2 phash tables, got $nTables")
    val h = col("phash")
    val contiguous = (0 until 4).map(b =>
      shiftrightunsigned(h, b * 16).bitwiseAND(lit(0xFFFFL)))
    val bytePairs = (0 until 4).map(b =>
      shiftrightunsigned(h, b * 8).bitwiseAND(lit(0xFFL))
        .bitwiseOR(shiftleft(
          shiftrightunsigned(h, (b + 4) * 8).bitwiseAND(lit(0xFFL)), 8)))
    val all = if (nTables == 1) contiguous else contiguous ++ bytePairs
    sig.select(col("doc_id"), col("phash"), posexplode(array(all: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandBits")
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** All frames of an animated (or single-frame) GIF payload — REAL demux
    * (r10): the JDK's GIF plugin reads the full image sequence, which makes
    * GIF the one genuinely multi-frame container this JVM can open without
    * native codecs, i.e. the honest stand-in for video keyframe
    * extraction. Non-GIF or malformed payloads → None (callers fall back
    * to the labeled stub), so arbitrary bytes can never crash an executor.
    */
  private[graft] def gifFrames(p: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] = {
    if (!(p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some((0 until r.getNumImages(true)).map(r.read(_)))
          finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** `w`×`h` grayscale thumbnail by EXACT integer area-averaging (the
    * dHash grid math generalized): cell (x,y) is the mean BT.601 luma of
    * its pixel block — deterministic across JVMs, no Java2D rescale.
    */
  private[graft] def lumaThumb(im: java.awt.image.BufferedImage,
      w: Int, h: Int): Array[Byte] = {
    val (sw, sh) = (im.getWidth, im.getHeight)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val y0 = (y.toLong * sh / h).toInt
      val y1 = math.max(y0 + 1, ((y + 1).toLong * sh / h).toInt)
      var x = 0
      while (x < w) {
        val x0 = (x.toLong * sw / w).toInt
        val x1 = math.max(x0 + 1, ((x + 1).toLong * sw / w).toInt)
        var sum = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { sum += luma(im.getRGB(xx, yy)); xx += 1 }
          yy += 1
        }
        out(y * w + x) = (sum / ((y1 - y0).toLong * (x1 - x0))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  val sampledFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Every-`everyN`th frame per payload — the video keyframe-sampling
    * operator with a REAL demux path (r10): GIF payloads open through the
    * JDK's multi-frame GIF reader and each sampled frame is emitted as an
    * exact-integer 8×8 luma thumbnail (format="gif"); anything else takes
    * the labeled byte-slicing stub (format="stub", `frameSize`-byte
    * chunks), so the flatMap/encoder plumbing — one output row per sampled
    * frame, per-partition execution, no shuffle, no collect — is identical
    * on both paths and a production demuxer swaps in behind the same
    * signature.
    */
  def frameSample(df: DataFrame, frameSize: Int, everyN: Int,
      idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(sampledFrameSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]](1)
          gifFrames(payload) match {
            case Some(frames) =>
              frames.indices.collect {
                case i if i % everyN == 0 =>
                  Row(r.getLong(0), i, "gif", lumaThumb(frames(i), 8, 8))
              }
            case None =>
              val chunks = payload.grouped(frameSize).toSeq
              chunks.indices.collect {
                case i if i % everyN == 0 => Row(r.getLong(0), i, "stub", chunks(i))
              }
          }
        }
      }(enc)
  }

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
