package graft.functions

/** Deterministic decodable multimodal payloads, built on the driver at plan
  * time (a few ms each, fixture-scale) — the planted inputs that drag the
  * REAL codec paths of [[Multimodal]] under the driver's DuckDB oracle the
  * same way the r10 twin gates did for the signature family: each builder
  * has a companion "expected decode" computed by replicating the decoder's
  * exact integer/float arithmetic, so the queries can pin booleans like
  * `features === lit(expected)` that are TRUE on every JVM the codecs are
  * deterministic on (and fail loudly the day they are not — that is the
  * point of the pin).
  *
  * All encoders are the JDK's own (javax.imageio / hand-rolled RIFF), no
  * extra dependency; all payloads are lossless for the planted content
  * (PNG is lossless, the GIF frames are solid grays that survive palette
  * quantization, WAV is raw PCM) except JPEG, whose decode stats are
  * PINNED constants (the DedupSpec r8 IDCT-determinism pin, reused).
  */
object MultimodalFixtures {

  /** BT.601 integer luma — must match Multimodal.luma exactly. */
  private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Pixels of the 4×2 PNG: row 0 = black..white gray ramp, row 1 = solid
    * primaries + white — luma values fixed by the integer BT.601 formula.
    */
  val Png4x2Pixels: Seq[Seq[Int]] = Seq(
    Seq(0x000000, 0x555555, 0xAAAAAA, 0xFFFFFF),
    Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF))

  /** Row-major BT.601 lumas of [[Png4x2Pixels]]. */
  val Png4x2Lumas: Seq[Int] = Png4x2Pixels.flatten.map(luma)

  /** The 4×2 known-pixel PNG (lossless: decode returns the exact pixels). */
  def png4x2: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, Png4x2Pixels(y)(x))
    val buf = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", buf), "no PNG writer")
    buf.toByteArray
  }

  /** Expected extractFeatures vector for [[png4x2]]: [w, h, mean, var] ++
    * the 16-bin normalized luma histogram — same double-then-float math as
    * the decoder.
    */
  def png4x2Features: Array[Float] = {
    val n = Png4x2Lumas.length
    val mean = Png4x2Lumas.sum.toDouble / n
    val variance = Png4x2Lumas.map(l => l.toLong * l).sum.toDouble / n - mean * mean
    // mirror the decoder exactly (Multimodal.scala): count per bin into
    // longs, then emit (count/n).toFloat — NOT accumulated (1/n).toFloat
    // increments, whose float addition order diverges unless n is a
    // power of two
    val counts = new Array[Long](Multimodal.LumaHistBins)
    Png4x2Lumas.foreach(l => counts(l >> 4) += 1)
    val hist = counts.map(c => (c.toDouble / n).toFloat)
    Array(4f, 2f, mean.toFloat, variance.toFloat) ++ hist
  }

  /** Expected `resize(_, 8, 4)` buffer for [[png4x2]]: upscaling 4×2 → 8×4
    * maps every output cell onto exactly one source pixel, so the area
    * average is that pixel's luma.
    */
  def png4x2Thumb8x4: Array[Byte] =
    (for (y <- 0 until 4; x <- 0 until 8)
      yield luma(Png4x2Pixels(y / 2)(x / 2)).toByte).toArray

  /** The r8 16×8 gradient JPEG whose decoded mean/variance are PINNED
    * ([[Jpeg16x8PinnedMean]]/[[Jpeg16x8PinnedVar]] — the IDCT-determinism
    * pin: if the bundled codec ever changed pixels, the oracle row fails).
    */
  def jpeg16x8: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = (x * 16 + y * 8) & 0xff
      img.setRGB(x, y, (v << 16) | (((v + 64) & 0xff) << 8) | ((255 - v) & 0xff))
    }
    val buf = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpg", buf), "no JPEG writer")
    buf.toByteArray
  }

  val Jpeg16x8PinnedMean = 124.55469f
  val Jpeg16x8PinnedVar = 2000.4971f

  /** PCM samples of [[wav4]]. */
  val WavSamples: Seq[Int] = Seq(1000, -1000, 32767, -32768)
  val WavRate = 8000

  /** Hand-assembled 16-bit PCM RIFF/WAVE with the 4 [[WavSamples]]. */
  def wav4: Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val data = WavSamples.flatMap(le16).toArray
    val fmt = le16(1) ++ le16(1) ++ le32(WavRate) ++ le32(WavRate * 2) ++
      le16(2) ++ le16(16)
    "RIFF".getBytes ++ le32(4 + 8 + fmt.length + 8 + data.length) ++
      "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  /** Expected extractFeatures vector for [[wav4]]: [n, rate, mean, var]. */
  def wav4Features: Array[Float] = {
    val n = WavSamples.length
    val mean = WavSamples.sum.toDouble / n
    val variance = WavSamples.map(v => v.toLong * v).sum.toDouble / n - mean * mean
    Array(n.toFloat, WavRate.toFloat, mean.toFloat, variance.toFloat)
  }

  /** Solid-gray levels of the 3 [[gif3]] frames — gray g has BT.601 luma
    * exactly g, and solid colors survive GIF palette quantization, so the
    * 8×8 luma thumbs of frames 0/2 are exactly all-10 / all-200 bytes.
    */
  val GifGrays: Seq[Int] = Seq(10, 100, 200)

  /** A real 3-frame animated GIF written by the JDK's own sequence writer. */
  def gif3: Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    GifGrays.foreach { g =>
      val im = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    baos.toByteArray
  }
}
