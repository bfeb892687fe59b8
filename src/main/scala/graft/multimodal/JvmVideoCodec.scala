package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** REAL video codec for MJPEG-in-AVI — the one video format a bare
  * JDK can genuinely decode: the AVI container is a RIFF chunk tree
  * (walked here byte-explicitly, ~no format library needed), and each
  * MJPEG frame is a complete JPEG payload, which `javax.imageio`
  * decodes. This closes the video half of the FakeCodec boundary the
  * same way [[JvmImageCodec]] (round 4) closed images and
  * [[JvmAudioCodec]] (round 5) closed audio. Inter-frame codecs
  * (H.264, VP9, AV1…) remain behind [[Multimodal.FakeCodec]] — the
  * JDK ships no bitstream decoder for those and that boundary stays
  * honestly labeled.
  *
  * Container reference (public spec): RIFF('AVI ') → LIST('hdrl')
  * holding 'avih' (MainAVIHeader: µs/frame, total frames, width,
  * height) and per-stream LIST('strl') ('strh' fccType/handler +
  * 'strf'); LIST('movi') holding the frame chunks, fourCC `NNdc` /
  * `NNdb` (stream NN compressed/uncompressed). Chunk sizes are
  * little-endian u32, data padded to even length.
  *
  * Determinism contract (mirrors the sibling codecs): the container
  * walk is pure integer offset arithmetic; frame counts come from
  * COUNTING movi chunks, never from trusting the header's
  * dwTotalFrames; decoded frames are normalized to TYPE_INT_RGB and
  * re-encoded as lossless PNG, so a demux→decode→re-encode chain is
  * reproducible bit-for-bit across executors and JVMs. Truncated or
  * lying containers degrade to fewer frames / None, never to a thrown
  * batch (the quarantine-routing contract).
  */
object JvmVideoCodec {
  System.setProperty("java.awt.headless", "true")
  // see JvmImageCodec: memory-backed ImageIO streams, not per-call
  // disk-spooled temp files (decoded/encoded bytes are identical)
  ImageIO.setUseCache(false)

  private def fourcc(s: String): Int =
    ByteBuffer.wrap(s.getBytes(US_ASCII)).order(ByteOrder.LITTLE_ENDIAN).getInt

  private val RIFF = fourcc("RIFF")
  private val AVI_ = fourcc("AVI ")
  private val LIST = fourcc("LIST")
  private val HDRL = fourcc("hdrl")
  private val AVIH = fourcc("avih")
  private val MOVI = fourcc("movi")

  /** Video frame chunk: two ASCII digits + "dc" (compressed) or "db"
    * (uncompressed DIB). MJPEG writers use NNdc. */
  private def isFrameChunk(cc: Int): Boolean = {
    val b0 = cc & 0xff; val b1 = (cc >> 8) & 0xff
    val b2 = (cc >> 16) & 0xff; val b3 = (cc >> 24) & 0xff
    b0 >= '0' && b0 <= '9' && b1 >= '0' && b1 <= '9' &&
      b2 == 'd' && (b3 == 'c' || b3 == 'b')
  }

  private final class Reader(bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u32(off: Int): Long = buf.getInt(off) & 0xffffffffL
    def cc(off: Int): Int = buf.getInt(off)
    def len: Int = bytes.length
  }

  /** Walk the chunks of [from, until): calls `f(fourCC, dataOff,
    * dataLen)` for each well-formed chunk, clamping lying sizes to the
    * parent's extent and stopping at the first unwalkable offset. */
  private def walkChunks(r: Reader, from: Int, until: Int)(f: (Int, Int, Int) => Unit): Unit = {
    var off = from
    val end = math.min(until, r.len)
    while (off + 8 <= end) {
      val cc = r.cc(off)
      val size = r.u32(off + 4)
      val dataOff = off + 8
      val dataLen = math.min(size, (end - dataOff).toLong).toInt
      if (dataLen < 0) return
      f(cc, dataOff, dataLen)
      off = dataOff + dataLen + (dataLen & 1) // chunks pad to even
    }
  }

  /** Header-probe: (format, width, height, n_frames, fps_millis)
    * without decoding pixel data. Dimensions come from 'avih';
    * n_frames from COUNTING movi frame chunks (the header's
    * dwTotalFrames is advisory and writers lie); fps (×1000, integer
    * — no float in metadata) from µs/frame. None when the payload is
    * not a RIFF-AVI — same quarantine contract as the sibling
    * probes. */
  def probe(media: Array[Byte]): Option[(String, Int, Int, Int, Int)] =
    try {
      val r = new Reader(media)
      if (r.len < 12 || r.cc(0) != RIFF || r.cc(8) != AVI_) return None
      val riffEnd = math.min(12 + r.u32(4).toInt - 4, r.len)
      var w = -1; var h = -1; var usPerFrame = 0L; var frames = 0
      walkChunks(r, 12, riffEnd) { (cc, off, len) =>
        if (cc == LIST && len >= 4) {
          val listType = r.cc(off)
          if (listType == HDRL)
            walkChunks(r, off + 4, off + len) { (c2, o2, l2) =>
              if (c2 == AVIH && l2 >= 40) {
                usPerFrame = r.u32(o2)
                w = r.u32(o2 + 32).toInt
                h = r.u32(o2 + 36).toInt
              }
            }
          else if (listType == MOVI)
            walkChunks(r, off + 4, off + len) { (c2, _, _) =>
              if (isFrameChunk(c2)) frames += 1
            }
        }
      }
      if (w < 0) None
      else {
        val fpsMillis =
          if (usPerFrame > 0) ((1000000000L + usPerFrame / 2) / usPerFrame).toInt else 0
        Some(("avi/mjpeg", w, h, frames, fpsMillis))
      }
    } catch { case _: Exception => None }

  /** Raw frame payloads (the stored JPEG bytes) of every `stride`-th
    * movi frame chunk, with the CONTAINER frame index — demux only,
    * no decode: the cheap path when downstream wants the compressed
    * frames (e.g. to re-mux a clip). */
  def demuxFrames(media: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] = {
    require(stride >= 1, s"stride $stride")
    try {
      val r = new Reader(media)
      if (r.len < 12 || r.cc(0) != RIFF || r.cc(8) != AVI_) return Seq.empty
      val riffEnd = math.min(12 + r.u32(4).toInt - 4, r.len)
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var idx = 0
      walkChunks(r, 12, riffEnd) { (cc, off, len) =>
        if (cc == LIST && len >= 4 && r.cc(off) == MOVI)
          walkChunks(r, off + 4, off + len) { (c2, o2, l2) =>
            if (isFrameChunk(c2)) {
              if (idx % stride == 0)
                out += ((idx, java.util.Arrays.copyOfRange(media, o2, o2 + l2)))
              idx += 1
            }
          }
      }
      out.result()
    } catch { case _: Exception => Seq.empty }
  }

  /** Every `stride`-th frame DECODED (ImageIO JPEG) and re-encoded as
    * lossless PNG after TYPE_INT_RGB normalization — byte-identical
    * to what [[JvmImageCodec.sampleFrames]] emits for the same pixels,
    * so image and video frames join the same downstream feature /
    * dedup operators. Undecodable frames are skipped (quarantine),
    * never thrown. */
  def sampleFrames(media: Array[Byte], stride: Int): Seq[(Int, Array[Byte])] =
    demuxFrames(media, stride).flatMap { case (idx, jpeg) =>
      try Option(ImageIO.read(new ByteArrayInputStream(jpeg))).map { img =>
        val rgb = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val gfx = rgb.createGraphics()
        try gfx.drawImage(img, 0, 0, null) finally gfx.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(rgb, "png", bos)
        idx -> bos.toByteArray
      } catch { case _: Exception => None }
    }

  /** Encode JPEG frame payloads into a minimal standard MJPEG-AVI
    * (RIFF/hdrl/avih + strl/strh'vids'/MJPG + strf/BITMAPINFOHEADER +
    * movi/00dc…). The write path of this modality: re-muxing sampled
    * clips, writing quarantine repros, and round-tripping the spec's
    * real-bytes tests. fpsMillis is frames-per-second ×1000. */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
      fpsMillis: Int = 25000): Array[Byte] = {
    require(w > 0 && h > 0, s"dims ${w}x$h")
    require(fpsMillis > 0, s"fpsMillis $fpsMillis")
    val usPerFrame = (1000000000L / fpsMillis).toInt

    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val b = ByteBuffer.allocate(8 + data.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes(US_ASCII)).putInt(data.length).put(data)
      b.array()
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + children.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(US_ASCII)).putInt(4 + children.length)
        .put(listType.getBytes(US_ASCII)).put(children)
      b.array()
    }

    val maxFrame = if (jpegFrames.isEmpty) 0 else jpegFrames.map(_.length).max
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame)                 // dwMicroSecPerFrame
      .putInt(maxFrame * (fpsMillis / 1000).max(1)) // dwMaxBytesPerSec (advisory)
      .putInt(0).putInt(0)                // padding granularity, flags (no idx1 → no HASINDEX)
      .putInt(jpegFrames.length)          // dwTotalFrames
      .putInt(0).putInt(1)                // initial frames, streams
      .putInt(maxFrame)                   // suggested buffer
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes(US_ASCII)).put("MJPG".getBytes(US_ASCII))
      .putInt(0).putShort(0).putShort(0)  // flags, priority, language
      .putInt(0)                          // initial frames
      .putInt(1000).putInt(fpsMillis)     // dwScale / dwRate = fps
      .putInt(0).putInt(jpegFrames.length)
      .putInt(maxFrame).putInt(-1)        // suggested buffer, quality
      .putInt(0)                          // sample size (0 = varying)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      .array()
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .put("MJPG".getBytes(US_ASCII))
      .putInt(w * h * 3)
      .putInt(0).putInt(0).putInt(0).putInt(0)
      .array()

    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegFrames.toArray.flatMap(chunk("00dc", _)))
    val body = "AVI ".getBytes(US_ASCII) ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(body.length).put(body)
    out.array()
  }
}
