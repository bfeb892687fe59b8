package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** REAL audio codec on the JDK's own `javax.sound.sampled`
  * (java.desktop, headless-safe — same move [[JvmImageCodec]] made for
  * images in round 4): WAV/AU/AIFF container probe and PCM frame
  * decode with no external libraries. This closes the audio half of
  * the round-3 codec gap; only VIDEO remains behind
  * [[Multimodal.FakeCodec]], because a bare JDK genuinely ships no
  * video codec.
  *
  * Determinism contract (mirrors JvmImageCodec): decoded samples are
  * exact integers straight from the PCM words (sign/endianness/width
  * handled bit-explicitly, 8/16/24/32-bit); μ-law/a-law payloads are
  * first converted to 16-bit PCM by the JDK's deterministic table
  * codec. Window statistics accumulate exactly in Long, with one IEEE
  * double division + sqrt at the end (both correctly rounded per
  * IEEE 754) — reproducible bit-for-bit across executors and JVMs.
  */
object JvmAudioCodec {
  System.setProperty("java.awt.headless", "true")

  /** Header-probe: (format, sample_rate_hz, channels, bits_per_sample,
    * n_frames) without decoding sample data. None for undecodable
    * payloads — same quarantine-routing contract as
    * [[JvmImageCodec.probe]]. */
  def probe(media: Array[Byte]): Option[(String, Int, Int, Int, Long)] =
    try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(media))
      val f = aff.getFormat
      Some((aff.getType.getExtension.toLowerCase,
        math.round(f.getSampleRate),
        f.getChannels,
        f.getSampleSizeInBits,
        aff.getFrameLength.toLong))
    } catch { case _: Exception => None }

  /** Decode to interleaved integer PCM samples (channel-major within a
    * frame, frames in container order). Non-PCM encodings (μ-law,
    * a-law) are converted to 16-bit signed PCM first. None for
    * undecodable payloads. The samples are the exact stored integers —
    * no float normalization, so the decode is bit-deterministic. */
  def pcmSamples(media: Array[Byte]): Option[(Array[Int], Int, Int)] =
    try {
      var in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(media))
      var f = in.getFormat
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED &&
          f.getEncoding != AudioFormat.Encoding.PCM_UNSIGNED) {
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
          f.getSampleRate, false)
        in = AudioSystem.getAudioInputStream(target, in)
        f = in.getFormat
      }
      val bytes = in.readAllBytes()
      val bps = f.getSampleSizeInBits
      val bytesPer = (bps + 7) / 8
      val big = f.isBigEndian
      val unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val n = bytes.length / bytesPer
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val off = i * bytesPer
        var v = 0
        var b = 0
        while (b < bytesPer) {
          val byteVal = bytes(off + (if (big) b else bytesPer - 1 - b)) & 0xff
          v = (v << 8) | byteVal
          b += 1
        }
        // sign-extend signed samples; recentre unsigned ones at zero
        val shift = 32 - bps
        out(i) = if (unsigned) v - (1 << (bps - 1)) else (v << shift) >> shift
        i += 1
      }
      Some((out, math.round(f.getSampleRate), f.getChannels))
    } catch { case _: Exception => None }

  /** RMS + peak per fixed-length sample window over the interleaved
    * PCM stream — the audio twin of the q106 frame-energy family,
    * computed on REAL decoded frames. Long sum of squares is exact:
    * a 32-bit sample's square is < 2^62, and window sizes are
    * API-bounded far below the 2^33 16-bit-full-scale overflow point
    * (a 32-bit full-scale overflow would need a multi-sample window
    * of INT_MIN — not a real signal; callers slicing whole tracks
    * into one window should use 16-bit sources, which all JDK-written
    * WAV/AU testdata is). One IEEE double division + sqrt per window.
    * The final partial window is emitted with its true sample
    * count. */
  def windowEnergy(media: Array[Byte], windowSamples: Int): Seq[(Int, Int, Double, Int)] = {
    require(windowSamples >= 1, s"windowSamples $windowSamples")
    pcmSamples(media) match {
      case None => Seq.empty
      case Some((samples, _, _)) =>
        val out = Seq.newBuilder[(Int, Int, Double, Int)]
        var idx = 0
        var start = 0
        while (start < samples.length) {
          val end = math.min(start + windowSamples, samples.length)
          var sumSq = 0L
          var peak = 0
          var i = start
          while (i < end) {
            val s = samples(i)
            sumSq += s.toLong * s.toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val n = end - start
          out += ((idx, n, math.sqrt(sumSq.toDouble / n), peak))
          idx += 1
          start = end
        }
        out.result()
    }
  }
}
