package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.stream.MemoryCacheImageInputStream
import javax.imageio.ImageIO

/** REAL image codec on the JDK's own ImageIO (PNG/JPEG/BMP/GIF/TIFF —
  * verified available headless in this container), closing the
  * round-3 "environment-blocked codec" gap for the image modality.
  * No external libraries: decode, metadata probe, resize and GIF
  * frame extraction are pure `java.desktop`. Audio/video remain
  * behind [[Multimodal.FakeCodec]] — the JDK ships no codec for
  * those, and that boundary stays honestly labeled.
  *
  * Determinism contract (the property every engine operation here
  * must keep): all pixel math is integer (sRGB bytes in, integer
  * sums with exact division by cell pixel count out) and the resize
  * is nearest-neighbor on integer indices — no Graphics2D
  * interpolation, whose rounding is renderer-dependent. Re-encoded
  * outputs are PNG (lossless), so a decode→resize→decode chain is
  * reproducible bit-for-bit across executors and JVMs.
  */
object JvmImageCodec {
  System.setProperty("java.awt.headless", "true")
  // In-memory ImageIO streams: with the default useCache=true every
  // ImageIO.read(InputStream) / write(..., OutputStream) spins up a
  // DISK-BACKED FileCache{Input,Output}Stream — one temp file created
  // and deleted PER FRAME decode (q199 alone: 64k frame decodes per
  // bench rep at sf0.1). Byte-in/byte-out payloads never need the
  // disk spool; decoded pixels are identical either way.
  ImageIO.setUseCache(false)

  /** Decode-probe: (format, width, height, n_frames) without decoding
    * pixel data for single-frame formats (the reader parses headers
    * only for width/height). Returns None for undecodable payloads —
    * callers route those rows to a quarantine side instead of
    * failing the batch (bad blobs are a fact of 100 TB lakes). */
  def probe(media: Array[Byte]): Option[(String, Int, Int, Int)] = {
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(media))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(in)
        val fmt = r.getFormatName.toLowerCase
        Some((fmt, r.getWidth(0), r.getHeight(0), containerFrames(r)))
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally in.close()
  }

  /** Frame count by walking the container index — counts EVERY
    * multi-image format the reader supports (animated GIF and
    * multi-page TIFF both; single-frame formats report 1), not just
    * GIF. Readers that cannot enumerate without decoding return -1
    * from getNumImages; treat that (and any walk failure) as 1. */
  private def containerFrames(r: javax.imageio.ImageReader): Int =
    try math.max(1, r.getNumImages(true)) catch { case _: Exception => 1 }

  private def decode(media: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(media)))
    catch { case _: Exception => None }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** g×g mean-luminance grid, row-major, each cell in [0,1] — the
    * classic tiny-image feature (and the front half of a perceptual
    * hash). Integer accumulation, one exact division per cell:
    * partition order, JVM and executor count cannot change a bit.
    * Undecodable payloads yield the zero vector (quarantine signal —
    * all-zero is impossible for a real image only up to black frames,
    * so callers pair this with [[probe]] when they must distinguish). */
  def luminanceGrid(media: Array[Byte], g: Int): Array[Float] = {
    val out = new Array[Float](g * g)
    val img = decode(media).getOrElse(return out)
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](g * g)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val cy = math.min(y * g / h, g - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * g / w, g - 1)
        val rgb = img.getRGB(x, y)
        // integer ITU-R 601 luma, scaled by 1000 (exact)
        val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        sums(cy * g + cx) += lum
        counts(cy * g + cx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < out.length) {
      if (counts(i) > 0) out(i) = (sums(i).toDouble / (counts(i) * 255000.0)).toFloat
      i += 1
    }
    out
  }

  /** Nearest-neighbor resize to exactly (tw, th), re-encoded PNG.
    * Manual integer index map (src = dst * srcDim / dstDim) — not
    * Graphics2D, whose interpolation/rounding is implementation-
    * defined. Undecodable payloads return None. */
  def resizeImage(media: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"target ${tw}x$th")
    decode(media).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        val sy = math.min(y * h / th, h - 1)
        var x = 0
        while (x < tw) {
          dst.setRGB(x, y, img.getRGB(math.min(x * w / tw, w - 1), sy))
          x += 1
        }
        y += 1
      }
      encodePng(dst)
    }
  }

  /** Every `stride`-th frame of a multi-image container (animated
    * GIF, multi-page TIFF — any format whose reader enumerates; the
    * single frame of anything else), re-encoded PNG. Frame index is
    * the CONTAINER's index, so downstream joins on (media_id,
    * frame_idx) are stable under stride changes. */
  def sampleFrames(media: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    require(stride >= 1, s"stride $stride")
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(media))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return Seq.empty
      val r = readers.next()
      try {
        r.setInput(in)
        val n = containerFrames(r)
        (0 until n by stride).flatMap { i =>
          try {
            val frame = r.read(i)
            // normalize palette/ARGB frames to RGB so the PNG bytes are
            // a pure function of pixel values, not the source color model
            val rgb = new BufferedImage(frame.getWidth, frame.getHeight, BufferedImage.TYPE_INT_RGB)
            val gfx = rgb.createGraphics()
            try gfx.drawImage(frame, 0, 0, null) finally gfx.dispose()
            Some(i -> encodePng(rgb))
          } catch { case _: Exception => None }
        }
      } finally r.dispose()
    } catch { case _: Exception => Seq.empty }
    finally in.close()
  }
}
