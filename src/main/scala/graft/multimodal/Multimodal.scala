package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling [EXT]: images/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run as partition-batch
  * transforms so each executor core processes a whole columnar batch
  * without per-row JVM boundary crossings.
  *
  * The IMAGE modality is REAL as of round 4: [[JvmImageCodec]]
  * decodes/probes/resizes PNG/JPEG/BMP/GIF/TIFF and samples GIF
  * frames on the JDK's own ImageIO — no external libraries, verified
  * headless in this container — behind the same partition-batch
  * shapes ([[imageMeta]], [[imageFeatures]], [[resizeImages]],
  * [[imageFrames]]). The AUDIO modality is REAL as of round 5:
  * [[JvmAudioCodec]] probes and PCM-decodes WAV/AU/AIFF on
  * `javax.sound.sampled` behind [[audioMeta]] / [[audioFeatures]] /
  * [[audioWindows]]. The VIDEO modality is REAL as of round 5 for
  * MJPEG-in-AVI: [[JvmVideoCodec]] walks the RIFF container and
  * ImageIO-decodes the JPEG frames behind [[videoMeta]] /
  * [[videoFrames]] / [[videoFeatures]]. Only inter-frame video
  * codecs (H.264/VP9/AV1) remain behind [[FakeCodec]] — a bare JDK
  * ships no bitstream decoder for those; that boundary stays honestly
  * labeled and is one object swap wide.
  */
object Multimodal {
  // see JvmImageCodec: memory-backed ImageIO streams — this object has
  // its own direct ImageIO.read/write call sites (synth encoders,
  // reencodeJpeg) that may load before the codec objects do
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried beside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** The canonical multimodal table schema: stable id, opaque payload,
    * typed metadata. Mirrors how a 100 TB media lake is laid out:
    * metadata columns are tiny and prunable, the blob column is only
    * read by stages that decode. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", mediaMetaType)))

  final case class MediaRow(media_id: Long, media: Array[Byte],
      format: String, width: Int, height: Int, n_frames: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ======== STUB: deterministic fake codec (INTER-FRAME VIDEO ONLY)
    * Stands in for decoding video codecs the JDK has no bitstream
    * decoder for (H.264/VP9/AV1 — ffmpeg etc. are not in this
    * container). Images use the real [[JvmImageCodec]], audio the
    * real [[JvmAudioCodec]], MJPEG-AVI video the real
    * [[JvmVideoCodec]]. Deterministic in the payload bytes so tests
    * are exact. A production build replaces only this object. */
  object FakeCodec {
    /** "Decode" media bytes to a fixed-length float feature vector. */
    def decodeToFeatures(media: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic FNV-ish fold over bytes
      var i = 0
      while (i < media.length) { h = h * 31 + (media(i) & 0xff); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }

    /** "Resize": real implementation would decode + resample; the stub
      * truncates/pads the payload to the target byte budget. */
    def resize(media: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(media, targetBytes)

    /** "Frame extraction": slice the payload into n_frames equal chunks
      * and return every `stride`-th chunk. */
    def sampleFrames(media: Array[Byte], nFrames: Int, stride: Int): Seq[(Int, Array[Byte])] = {
      if (nFrames <= 0) return Seq.empty
      val frameLen = math.max(1, media.length / nFrames)
      (0 until nFrames by stride).map { idx =>
        val from = math.min(idx * frameLen, media.length)
        val until = math.min(from + frameLen, media.length)
        idx -> java.util.Arrays.copyOfRange(media, from, until)
      }
    }
  }

  /** REAL blob-store ingest: a directory (tree) of media files via
    * Spark's built-in `binaryFile` source — the actual entry point at
    * lake scale (splittable listing, per-file rows, pushes
    * `pathGlobFilter`/`modifiedAfter` into the scan; the CONTENT
    * column is only materialized by stages that decode). Metadata
    * comes from [[JvmImageCodec.probe]] on the real bytes, not from
    * trusted file extensions; media_id is the path's xxhash64 —
    * stable across re-listings, join-ready. */
  def mediaFromImageDir(spark: SparkSession, path: String,
      glob: String = "*.{png,jpg,jpeg,bmp,gif,tif,tiff}"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) =>
        val m = JvmImageCodec.probe(bytes)
        (p, bytes, m.map(_._1).getOrElse("undecodable"),
          m.map(_._2).getOrElse(-1), m.map(_._3).getOrElse(-1),
          m.map(_._4).getOrElse(0))
      })
      .toDF("path", "media", "format", "width", "height", "n_frames")
      .select(
        xxhash64(col("path")).as("media_id"),
        col("media"),
        struct(col("format"), col("width"), col("height"),
          col("n_frames")).as("meta"),
        col("path"))
  }

  /** Build a media table from `documents` (payload = utf-8 text bytes)
    * — the testdata stand-in for a real blob store scan. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("format"),
        col("n_chars").cast(IntegerType).as("width"),
        lit(1).as("height"),
        greatest(lit(1), (col("n_chars") / 100).cast(IntegerType)).as("n_frames")).as("meta"))
  }

  /** Feature extraction as a partition-batch transform: one
    * [[FakeCodec]] call per row, but iterator-composed per partition —
    * the Scala analogue of a pandas-batch UDF: no shuffle, constant
    * memory, codec state reusable across the partition. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would initialize the real codec once here
        it.map { case (id, bytes) => MediaFeatures(id, FakeCodec.decodeToFeatures(bytes, dim)) }
      }
  }

  /** Resize every payload to a byte budget; metadata is carried through.
    *
    * The stub's "resize" is `Arrays.copyOf` — truncate-or-zero-pad —
    * which the built-ins express exactly (`substring`/`rpad` operate on
    * BinaryType), so this stays inside whole-stage codegen with no UDF.
    * The real-codec boundary lives in [[extractFeatures]]'s
    * mapPartitions, not here. */
  def resizeAll(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("media",
        expr(s"rpad(substring(media, 1, $targetBytes), $targetBytes, X'00')"))
      .withColumn("meta", col("meta").withField("width", lit(targetBytes)))

  /** Frame sampling: one input row fans out to ~n_frames/stride rows.
    * flatMap keeps it pipelined — no shuffle, output partitioning
    * follows input. */
  def sampleFrames(media: DataFrame, stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("meta.n_frames").as("n_frames"))
      .as[(Long, Array[Byte], Int)]
      .flatMap { case (id, bytes, n) =>
        FakeCodec.sampleFrames(bytes, n, stride).map { case (idx, fb) => MediaFrame(id, idx, fb) }
      }
  }

  // ======== REAL image pipeline (JDK ImageIO via JvmImageCodec) ======

  final case class ImageMeta(media_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, decodable: Boolean)

  /** Header-probe every blob: REAL metadata from the bytes (format,
    * dimensions, GIF frame count) instead of trusting the lake's
    * metadata column — the first step of any media-ingest pipeline,
    * and the quarantine router: `decodable = false` rows carry
    * sentinel values and are filtered by downstream stages rather
    * than failing the batch. Map-only, no shuffle; the probe parses
    * headers, not pixels. */
  def imageMeta(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        JvmImageCodec.probe(bytes) match {
          case Some((f, w, h, n)) => ImageMeta(id, f, w, h, n, decodable = true)
          case None => ImageMeta(id, "undecodable", -1, -1, 0, decodable = false)
        }
      })
  }

  /** g×g mean-luminance grid per image (default 16 floats) — REAL
    * decoded-pixel features with integer-exact cell math, the input
    * to the q33-family cosine/ANN operators for image dedup. Same
    * partition-batch shape as [[extractFeatures]]. */
  def imageFeatures(media: DataFrame, grid: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id, JvmImageCodec.luminanceGrid(bytes, grid)) })
  }

  /** Decode → nearest-neighbor resize to exactly (w, h) → lossless
    * PNG re-encode. Undecodable payloads are DROPPED (the quarantine
    * contract: route them via [[imageMeta]] first when they must be
    * kept). Metadata is rewritten from the REAL output dimensions. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        JvmImageCodec.resizeImage(bytes, w, h).map(id -> _) })
      .toDF("media_id", "media")
      .withColumn("meta", struct(
        lit("png").as("format"), lit(w).as("width"),
        lit(h).as("height"), lit(1).as("n_frames")))
  }

  /** Every `stride`-th frame of a multi-image container (GIF, TIFF;
    * single frame for other formats) as lossless PNG rows —
    * [[sampleFrames]]'s shape with a REAL container walk; frame_idx
    * is the container's index, stable under stride changes. Same
    * partition-batch shape as the sibling image operators. */
  def imageFrames(media: DataFrame, stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        JvmImageCodec.sampleFrames(bytes, stride)
          .map { case (idx, fb) => MediaFrame(id, idx, fb) } })
  }

  // ======== REAL audio pipeline (javax.sound.sampled) ================

  final case class AudioMeta(media_id: Long, format: String,
      sample_rate: Int, channels: Int, bits: Int, n_frames: Long,
      decodable: Boolean)
  final case class AudioWindow(media_id: Long, window_idx: Int,
      n_samples: Int, rms: Double, peak: Int)

  /** Header-probe every audio blob — [[imageMeta]]'s shape for the
    * audio modality: REAL container metadata (format, sample rate,
    * channels, bit depth, frame count) from the bytes via
    * [[JvmAudioCodec.probe]], with the same quarantine routing
    * (`decodable = false` + sentinels, never a failed batch). */
  def audioMeta(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        JvmAudioCodec.probe(bytes) match {
          case Some((f, sr, ch, bits, nf)) =>
            AudioMeta(id, f, sr, ch, bits, nf, decodable = true)
          case None => AudioMeta(id, "undecodable", -1, -1, -1, 0L, decodable = false)
        }
      })
  }

  /** Per-window RMS energy as a dense float vector per blob — REAL
    * decoded PCM through [[JvmAudioCodec.windowEnergy]], emitted in
    * the same `MediaFeatures` shape as [[imageFeatures]] so the
    * q33/q34-family cosine/ANN operators consume audio features
    * unchanged. Undecodable payloads yield the empty vector. */
  def audioFeatures(media: DataFrame, windowSamples: Int = 1024): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeatures(id,
          JvmAudioCodec.windowEnergy(bytes, windowSamples)
            .map(_._3.toFloat).toArray)
      })
  }

  // ======== REAL video pipeline (MJPEG-AVI via JvmVideoCodec) ========

  final case class VideoMeta(media_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, fps_millis: Int, decodable: Boolean)
  final case class FrameFeatures(media_id: Long, frame_idx: Int,
      features: Array[Float])

  /** Header-probe every video blob — [[imageMeta]]'s shape for the
    * video modality: REAL container metadata (dimensions from 'avih',
    * frame count by COUNTING movi chunks, integer fps×1000) via
    * [[JvmVideoCodec.probe]], with the same quarantine routing. */
  def videoMeta(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        JvmVideoCodec.probe(bytes) match {
          case Some((f, w, h, n, fps)) =>
            VideoMeta(id, f, w, h, n, fps, decodable = true)
          case None => VideoMeta(id, "undecodable", -1, -1, 0, 0, decodable = false)
        }
      })
  }

  /** Every `stride`-th video frame DECODED to the same normalized
    * lossless-PNG bytes [[imageFrames]] emits — image and video rows
    * are indistinguishable downstream, so one dedup/feature pipeline
    * serves both modalities. Pipelined fan-out, no shuffle;
    * frame_idx is the container's index, stable under stride. */
  def videoFrames(media: DataFrame, stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        JvmVideoCodec.sampleFrames(bytes, stride)
          .map { case (idx, fb) => MediaFrame(id, idx, fb) } })
  }

  /** Per-frame g×g luminance grids straight off the demuxed JPEG
    * frames — demux + decode + feature in ONE partition-batch pass
    * (no intermediate PNG materialization), the shape a 100 TB video
    * lake needs: the blob is read once per executor core and only
    * |frames|×g² floats leave the stage. */
  def videoFeatures(media: DataFrame, grid: Int = 4, stride: Int = 2): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        JvmVideoCodec.demuxFrames(bytes, stride).map { case (idx, jpeg) =>
          FrameFeatures(id, idx, JvmImageCodec.luminanceGrid(jpeg, grid)) } })
  }

  /** Full per-window statistics (sample count, RMS, integer peak) —
    * the audio twin of the q106 frame-energy family on REAL PCM
    * frames; one input row fans out to its window rows, pipelined
    * (no shuffle). Undecodable payloads produce no rows (quarantine
    * via [[audioMeta]] when they must be kept). */
  def audioWindows(media: DataFrame, windowSamples: Int = 1024): Dataset[AudioWindow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        JvmAudioCodec.windowEnergy(bytes, windowSamples)
          .map { case (idx, n, rms, peak) => AudioWindow(id, idx, n, rms, peak) }
      })
  }

  // ======== REAL media ENCODERS (synthesis side of the codecs) ========
  // The decode paths above are exercised by the registry's q152 via
  // these: executors synthesize genuine WAV / MJPEG-AVI container
  // bytes from closed-form per-id parameters, the real codecs decode
  // them back, and the DuckDB oracle recomputes the aggregate from
  // the closed forms alone — cross-engine equality proves the whole
  // encode -> container -> decode pipeline, not a synthetic feature
  // column. Also the library's answer to "write media fixtures".

  /** Mono 16-bit signed PCM samples -> a real WAV file, written by the
    * JDK's own audio writer (javax.sound.sampled.AudioSystem) — the
    * same genuine container [[JvmAudioCodec]] decodes. */
  def encodeWavPcm16(samples: Array[Int], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** A solid-gray w x h JPEG via ImageIO — the frame payload for
    * synthesized MJPEG-AVI containers. */
  def encodeSolidJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray & 0xff) * 0x010101
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  /** Closed-form audio synthesis: per id, a +-a square wave of n
    * samples (a = 100 + id % 900, n = 1024 + id % 1501) in a real WAV
    * container. Every 1024-sample window of a +-a square wave has
    * RMS EXACTLY a and peak a (integer-perfect double math), so the
    * decoded window stats are oracle-predictable without any codec on
    * the oracle side. Map-only: one row in, one row out, pipelined. */
  def synthSquareWav(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val a = (100L + id % 900L).toInt
        val n = (1024L + id % 1501L).toInt
        (id, encodeWavPcm16(Array.tabulate(n)(i => if (i % 2 == 0) a else -a)))
      }).toDF("media_id", "media")
  }

  /** Closed-form envelope synthesis: (media_id, amps ARRAY<INT>) rows
    * → a real WAV of len(amps) segments, each `segSamples` samples of
    * a ±amp square wave — the audio twin of [[synthGridPng]]. Every
    * aligned window of a ±a square wave has RMS EXACTLY a (integer
    * sum of squares, sqrt of a perfect square), so the decoded
    * envelope is oracle-predictable from the amps alone. Map-only. */
  def synthEnvelopeWav(params: DataFrame, segSamples: Int = 128): DataFrame = {
    val spark = params.sparkSession
    import spark.implicits._
    params.select(col("media_id"), col("amps")).as[(Long, Array[Int])]
      .mapPartitions(_.map { case (id, amps) =>
        val samples = new Array[Int](amps.length * segSamples)
        var k = 0
        while (k < amps.length) {
          var i = 0
          while (i < segSamples) {
            samples(k * segSamples + i) = if (i % 2 == 0) amps(k) else -amps(k)
            i += 1
          }
          k += 1
        }
        (id, encodeWavPcm16(samples))
      }).toDF("media_id", "media")
  }

  /** 64-bit temporal envelope hash — the audio member of the
    * perceptual-fingerprint family ([[dHash64]] is the image one):
    * decode (REAL codec), per-window RMS over `windowSamples`-sample
    * windows, one bit per window set iff it outshines its circular
    * successor (window (k+1) mod 64). Bits depend only on the
    * LOUDNESS ORDER of the envelope, so gain-preserving re-encodes
    * hash identically and the hamming-band pairing
    * ([[phashDupPairs]]) applies unchanged. Map-only, 8 bytes out per
    * blob; undecodable or short payloads hash toward the zero grid
    * (missing windows read as silence). */
  def envelopeHash64(media: DataFrame, windowSamples: Int = 128): Dataset[(Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val rms = new Array[Double](64)
        JvmAudioCodec.windowEnergy(bytes, windowSamples).foreach {
          case (idx, _, r, _) => if (idx < 64) rms(idx) = r
        }
        var h = 0L
        var k = 0
        while (k < 64) {
          if (rms(k) > rms((k + 1) % 64)) h |= (1L << k)
          k += 1
        }
        (id, h)
      })
  }

  /** Decode-parallelism spread (r14, guide §2.6/§6): the synthetic
    * media corpora derive from a SINGLE-row-group parquet scan, so
    * without an exchange the whole downstream synth + demux + decode
    * chain runs in ONE task regardless of core count. The params rows
    * are tiny (an id + ≤64 ints), so hash-spreading them across
    * `defaultParallelism` costs a negligible shuffle and buys
    * full-width decode. Deterministic (hash on media_id, never rand —
    * guide §2.5) and EXPLICIT numPartitions (REPARTITION_BY_NUM), so
    * AQE cannot coalesce the tiny exchange back to one partition. At
    * lake scale media bytes arrive pre-split across thousands of row
    * groups and this spread of the param rows stays noise.
    *
    * Applied ONLY to the video synth (64 ImageIO JPEG decodes per
    * clip ≈ 3.5 ms/row — q199 measured 3.77 → 1.6 s min): the same
    * spread under the PNG-grid and WAV paths was measured a net LOSS
    * (q198 1.17 → 1.86, q215 0.96 → 2.0 min) — their per-row decode
    * is ~50 µs, and the extra exchange both adds a stage and leaks 32
    * near-empty partitions into the memoized media-IVF corpus
    * checkpoint, which every steady-state serve rep then re-pays as
    * task-scheduling floor (the q66 lesson from r3, re-measured). */
  private def spreadForDecode(params: DataFrame): DataFrame =
    params.repartition(
      params.sparkSession.sparkContext.defaultParallelism, col("media_id"))

  /** Closed-form video synthesis from a gray sequence: (media_id,
    * grays ARRAY<INT>) rows → a real MJPEG-AVI with one solid-gray
    * w×h frame per gray — the video twin of [[synthGridPng]] /
    * [[synthEnvelopeWav]]. JPEG is lossy, but identical grays encode
    * to identical frame bytes (deterministic encoder) and a solid
    * frame's decoded mean luminance sits within ±1 gray level of the
    * source (MultimodalSpec-measured), so any ORDER over grays spaced
    * ≥ 3 levels survives the round-trip exactly — the contract
    * [[videoTemporalHash64]] and its oracle rest on. Map-only after
    * the [[spreadForDecode]] exchange. */
  def synthGrayVideo(params: DataFrame, w: Int = 8, h: Int = 8): DataFrame = {
    val spark = params.sparkSession
    import spark.implicits._
    spreadForDecode(params)
      .select(col("media_id"), col("grays")).as[(Long, Array[Int])]
      .mapPartitions(_.map { case (id, grays) =>
        (id, JvmVideoCodec.encodeMjpegAvi(
          grays.toSeq.map(g => solidJpegCached(w, h, g)), w, h))
      }).toDF("media_id", "media")
  }

  /** Per-executor cache for [[encodeSolidJpeg]]: a solid w×h frame has
    * at most 256 distinct gray values, and ImageIO writer spin-up is
    * ~ms per call — synthesizing a 64-frame clip per row would spend
    * most of its map time re-encoding identical frames. Synthesis-side
    * only (the DECODE path is never cached: it is the engine cost
    * under measurement). */
  private val solidJpegCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()
  private def solidJpegCached(w: Int, h: Int, gray: Int): Array[Byte] =
    solidJpegCache.computeIfAbsent((w, h, gray & 0xff),
      k => encodeSolidJpeg(k._1, k._2, k._3))

  /** 64-bit temporal luminance hash — the VIDEO member of the
    * perceptual-fingerprint family ([[dHash64]] spatial,
    * [[envelopeHash64]] loudness): demux the REAL container, decode
    * each frame's mean luminance (1×1 luminance grid), one bit per
    * frame set iff it outshines its circular successor. Bits read the
    * BRIGHTNESS ORDER of the frame sequence, so re-encodes that
    * preserve frame order and approximate levels hash identically;
    * the hamming-band pairing ([[phashDupPairs]]) applies unchanged.
    * Map-only, 8 bytes out per clip; clips beyond 64 frames hash
    * their first 64 (fingerprint the opening — trailer-length
    * differences shouldn't break identity), shorter clips read
    * missing frames as black. */
  def videoTemporalHash64(media: DataFrame): Dataset[(Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val lum = new Array[Float](64)
        JvmVideoCodec.demuxFrames(bytes, 1).foreach { case (idx, jpeg) =>
          if (idx < 64) lum(idx) = JvmImageCodec.luminanceGrid(jpeg, 1)(0)
        }
        var h = 0L
        var k = 0
        while (k < 64) {
          if (lum(k) > lum((k + 1) % 64)) h |= (1L << k)
          k += 1
        }
        (id, h)
      })
  }

  /** Distinct frame-sequence shingles per clip — the video twin of the
    * text family's 3-gram shingles: demux the REAL container, decode
    * each frame's mean luminance, and emit every distinct window of
    * `n` consecutive frame fingerprints as one string. Identical
    * source frames encode to identical bytes and decode to EXACTLY
    * equal floats, so a clip cut from a longer video shares its
    * interior shingles verbatim — the signal containment detection
    * ([[graft.operators.Extras]] q200) joins on. Map-only fan-out. */
  def videoShingles(media: DataFrame, n: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val lums = JvmVideoCodec.demuxFrames(bytes, 1).sortBy(_._1)
          .map { case (_, jpeg) => JvmImageCodec.luminanceGrid(jpeg, 1)(0).toString }
        lums.sliding(n).filter(_.length == n).map(_.mkString("|"))
          .toSet[String].iterator.map(s => (id, s))
      }).toDF("media_id", "sh")
  }

  /** g×g cell grid -> real PNG: each cell is a solid gray painted at
    * cellPx×cellPx pixels, encoded by ImageIO's lossless PNG writer —
    * the image-side fixture encoder (q152 discipline: genuine
    * container bytes from closed-form params, so the decode side is
    * exercised for real while an oracle recomputes downstream numbers
    * from the params alone). PNG is lossless and the cells are
    * axis-aligned with [[JvmImageCodec.luminanceGrid]]'s g×g cells,
    * so each decoded grid value is EXACTLY gray/255. */
  def encodeGridPng(grays: Array[Int], g: Int, cellPx: Int): Array[Byte] = {
    require(grays.length == g * g, s"${grays.length} grays for ${g}x$g")
    val side = g * cellPx
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val v = grays((y / cellPx) * g + (x / cellPx)) & 0xff
        img.setRGB(x, y, v * 0x010101)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Closed-form image synthesis: (media_id, grays ARRAY<INT>) rows ->
    * (media_id, media) with a real g×g-cell PNG per row. Map-only,
    * pipelined — the image twin of [[synthSquareWav]]; the grays
    * column is computed by the CALLER as a deterministic SQL
    * expression so a DuckDB oracle can reproduce it verbatim. */
  def synthGridPng(params: DataFrame, g: Int = 8, cellPx: Int = 4): DataFrame = {
    val spark = params.sparkSession
    import spark.implicits._
    params.select(col("media_id"), col("grays")).as[(Long, Array[Int])]
      .mapPartitions(_.map { case (id, grays) =>
        (id, gridPngCached(grays, g, cellPx)) })
      .toDF("media_id", "media")
  }

  /** Per-executor cache for [[encodeGridPng]] — the [[solidJpegCached]]
    * discipline for the grid family: the q195/q215 fixture corpus has
    * ≤ 64 distinct gray grids however many media rows replicate them
    * (re-posted images), and ImageIO writer spin-up is ~ms per call.
    * Synthesis-side only (the DECODE path is never cached: it is the
    * engine cost under measurement); bounded so a diverse-grays caller
    * degrades to plain encoding instead of growing the heap. */
  private val GridPngCacheCap = 4096
  private val gridPngCache =
    new java.util.concurrent.ConcurrentHashMap[(Seq[Int], Int, Int), Array[Byte]]()
  private def gridPngCached(grays: Array[Int], g: Int, cellPx: Int): Array[Byte] = {
    val v = gridPngCache.computeIfAbsent((grays.toSeq, g, cellPx),
      k => encodeGridPng(grays, k._2, k._3))
    // HARD bound (a check-then-act guard alone is racy across executor
    // threads and never evicts): evict arbitrary entries after insert
    // until back under the cap. Eviction order doesn't matter — the
    // cache exists for the ≤64-distinct-grid fixture corpora; a
    // diverse-grays caller just degrades toward plain encoding.
    while (gridPngCache.size > GridPngCacheCap) {
      val it = gridPngCache.keySet.iterator()
      if (it.hasNext) gridPngCache.remove(it.next())
    }
    v
  }

  /** 64-bit difference hash (dHash) per image — the classic perceptual
    * fingerprint: decode (REAL codec), g×g mean-luminance grid, one
    * bit per cell set iff the cell outshines its right neighbor
    * (row-wraparound so g=8 fills all 64 bits). Bits depend only on
    * luminance ORDER, so lossless re-encodes hash identically and
    * mild lossy re-encodes (JPEG quality shifts) land within a
    * hamming bit or two — which is exactly what the half-band join
    * ([[phashDupPairs]]) recovers. Map-only, 8 bytes out per blob;
    * undecodable payloads hash the zero grid (all-false comparisons
    * -> 0L) and are routed by [[imageMeta]] when they must be kept. */
  def dHash64(media: DataFrame, grid: Int = 8): Dataset[(Long, Long)] = {
    require(grid * grid <= 64, s"grid $grid overflows 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val gv = JvmImageCodec.luminanceGrid(bytes, grid)
        var h = 0L
        var i = 0
        while (i < grid * grid) {
          val row = i - i % grid
          if (gv(i) > gv(row + (i % grid + 1) % grid)) h |= (1L << i)
          i += 1
        }
        (id, h)
      })
  }

  /** Perceptual-hash media dedup pairing — the dedup × multimodal
    * composition: hamming-band LSH over 64-bit perceptual hashes,
    * reusing the q61 SimHash plumbing verbatim ([[graft.operators
    * .Dedup.halfBandsSql]]: 2 unsigned 32-bit half-bands; pigeonhole
    * makes the (band, half) equi-join EXACT for hamming <= 1, popcount
    * verifies). Input: (media_id, phash); output: (ida, idb, hamming)
    * pairs. Never all-pairs — collision work is bounded by band-bucket
    * size, and the only shuffled payload is 8 bytes per image, so the
    * shape is the same one the text near-dup family runs at 100 TB. */
  def phashDupPairs(hashes: DataFrame): DataFrame = {
    val bands = hashes.selectExpr("media_id", "phash",
      graft.operators.Dedup.halfBandsSql("phash"))
    bands.as("pa").join(bands.as("pb"),
        col("pa.band") === col("pb.band") && col("pa.half") === col("pb.half") &&
        col("pa.media_id") < col("pb.media_id"))
      .select(col("pa.media_id").as("ida"), col("pb.media_id").as("idb"),
        col("pa.phash").as("ha"), col("pb.phash").as("hb"))
      .distinct()
      .select(col("ida"), col("idb"),
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      .filter(col("hamming") <= 1)
  }

  /** Decode -> JPEG re-encode at an explicit quality — the
    * "quality-shifted copy" a crawled media lake is full of, used to
    * exercise [[dHash64]]'s robustness (MultimodalSpec). Undecodable
    * payloads return None. */
  def reencodeJpeg(media: Array[Byte], quality: Float): Option[Array[Byte]] = {
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))).map { src =>
      // JPEG writer rejects ARGB; normalize to RGB first
      val rgb = new java.awt.image.BufferedImage(src.getWidth, src.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = rgb.createGraphics()
      try gfx.drawImage(src, 0, 0, null) finally gfx.dispose()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(rgb, null, null), p)
      } finally { ios.close(); w.dispose() }
      bos.toByteArray
    } catch { case _: Exception => None }
  }

  /** Closed-form video synthesis: per id, a real MJPEG-AVI with
    * nf = 1 + id % 4 solid-gray 8x8 frames (gray = id % 256). Frame
    * COUNTS and container dimensions round-trip bit-exactly (JPEG
    * pixel values do not — they stay out of q152's aggregate). */
  def synthMjpegAvi(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val nf = (1L + id % 4L).toInt
        val jpeg = encodeSolidJpeg(8, 8, (id % 256L).toInt)
        (id, JvmVideoCodec.encodeMjpegAvi(Seq.fill(nf)(jpeg), 8, 8))
      }).toDF("media_id", "media")
  }
}
