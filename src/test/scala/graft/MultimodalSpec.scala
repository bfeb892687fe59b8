package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal

/** Multimodal plumbing tests: schema contract, batch-shaped transforms,
  * deterministic stub codec (SURVEY.md / builder EXT requirements). */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val media = Multimodal.mediaFromDocuments(spark, dir)

  test("media table matches the canonical schema (binary + typed metadata)") {
    assert(media.schema("media").dataType == BinaryType)
    // compare field names/types, not nullability (lit() fields are non-null)
    assert(media.schema("meta").dataType.simpleString == Multimodal.mediaMetaType.simpleString)
    val row = media.orderBy("media_id").first()
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
    assert(row.getStruct(2).getAs[String]("format") == "text/plain")
  }

  test("feature extraction: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .orderBy("media_id").collect()
    assert(f1.length == media.count())
    assert(f1.forall(_.features.length == 16))
    // partitioning must not change results (pure per-row codec)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("resize truncates payloads and rewrites metadata") {
    val out = Multimodal.resizeAll(media, targetBytes = 32)
    val r = out.select(length(col("media")).as("len"), col("meta.width")).distinct().collect()
    assert(r.forall(_.getInt(0) == 32))
    assert(r.forall(_.getInt(1) == 32))
    // byte-exact FakeCodec.resize parity (truncate or zero-pad)...
    val originals = media.select("media_id", "media").collect()
      .map(row => row.getLong(0) -> row.getAs[Array[Byte]](1)).toMap
    out.select("media_id", "media").collect().foreach { row =>
      val expected = Multimodal.FakeCodec.resize(originals(row.getLong(0)), 32)
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](1), expected))
    }
    // ...achieved with built-ins: no UDF in the plan (codegen-friendly)
    assert(!out.queryExecution.executedPlan.toString.contains("UDF"))
  }

  test("frame sampling fans out one row per sampled frame, no shuffle") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val perDoc = frames.groupBy("media_id").count()
    val joined = media.select(col("media_id"), col("meta.n_frames"))
      .join(perDoc, "media_id")
    // ceil(n_frames / stride) frames per doc
    val bad = joined.filter(col("count") =!= ceil(col("n_frames") / lit(2.0))).count()
    assert(bad == 0)
    // pipelined: no exchange in the plan
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  // ======== REAL image codec (JDK ImageIO) ========

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Animated GIF from web-safe solid frames (quantization-proof). */
  private def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def imageDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("media_id", "media").withColumn("meta", struct(
      lit("?").as("format"), lit(-1).as("width"), lit(-1).as("height"),
      lit(1).as("n_frames")))
  }

  test("imageMeta probes REAL headers and quarantines garbage instead of failing") {
    val df = imageDf(Seq(
      1L -> png(8, 6)((x, y) => (x * 32 << 16) | (y * 40 << 8)),
      2L -> animatedGif(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 4, 4),
      3L -> Array[Byte](1, 2, 3, 4)))
    val got = Multimodal.imageMeta(df).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).format == "png" && got(1L).width == 8 && got(1L).height == 6
      && got(1L).n_frames == 1 && got(1L).decodable)
    assert(got(2L).format == "gif" && got(2L).n_frames == 4 && got(2L).decodable)
    assert(!got(3L).decodable && got(3L).format == "undecodable")
  }

  test("imageFeatures equals an independent per-cell luminance re-derivation") {
    // 8x8 image, 4x4 grid: each 2x2 cell painted one solid color
    val cellColors = Array.tabulate(16)(i => ((i * 16) << 16) | ((255 - i * 15) << 8) | 64)
    val bytes = png(8, 8)((x, y) => cellColors((y / 2) * 4 + (x / 2)))
    val got = Multimodal.imageFeatures(imageDf(Seq(7L -> bytes)), grid = 4)
      .collect()(0).features
    val expected = cellColors.map { c =>
      val lum = 299L * ((c >> 16) & 0xff) + 587L * ((c >> 8) & 0xff) + 114L * (c & 0xff)
      // 4 identical pixels per cell: sum = 4*lum, count = 4 — exact division
      (lum * 4.toDouble / (4 * 255000.0)).toFloat
    }
    assert(got.toSeq == expected.toSeq)
    // and a second run over a different partitioning is bit-identical
    val again = Multimodal.imageFeatures(imageDf(Seq(7L -> bytes)).repartition(3), grid = 4)
      .collect()(0).features
    assert(again.toSeq == got.toSeq)
  }

  test("resizeImages maps nearest-neighbor pixels exactly and rewrites meta") {
    val srcPix = (x: Int, y: Int) => ((x * 30) << 16) | ((y * 40) << 8) | ((x + y) * 10)
    val df = imageDf(Seq(5L -> png(8, 6)(srcPix), 6L -> Array[Byte](9, 9)))
    val out = Multimodal.resizeImages(df, 4, 3).collect()
    assert(out.length == 1, "undecodable row must be dropped, not fail")
    val row = out(0)
    assert(row.getStruct(2).getInt(1) == 4 && row.getStruct(2).getInt(2) == 3)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("media")))
    assert(back.getWidth == 4 && back.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == (srcPix(2 * x, 2 * y) & 0xffffff),
        s"pixel ($x,$y)")
  }

  test("image near-dup dedup end-to-end: real features feed the cosine path") {
    import spark.implicits._
    // three images: 2 is image 1 with ONE pixel changed (near-dup);
    // 3 is an unrelated gradient — the 100 TB image-dedup story in
    // miniature: decode -> luminance grid -> blocked cosine pairs
    val base = (x: Int, y: Int) => ((x * 30) << 16) | ((y * 40) << 8) | 128
    val df = imageDf(Seq(
      1L -> png(8, 8)(base),
      2L -> png(8, 8)((x, y) => if (x == 7 && y == 7) 0xffffff else base(x, y)),
      3L -> png(8, 8)((x, y) => ((255 - x * 30) << 16) | ((x * y) << 8) | 30)))
    val feats = Multimodal.imageFeatures(df, grid = 4)
      .toDF("vec_id", "embedding")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(expr("aggregate(zip_with(v, v, (a, b) -> a * b), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")))
    val pairs = feats.as("a").join(feats.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("ida"), $"b.vec_id".as("idb"),
        (expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
          / ($"a.nrm" * $"b.nrm")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val near = pairs.filter(_._3 >= 0.99).map(p => (p._1, p._2))
    assert(near == Seq((1L, 2L)), s"pairs=$pairs")
  }

  test("mediaFromImageDir ingests a real file tree via the binaryFile source") {
    val base = java.nio.file.Files.createTempDirectory("imgdir")
    java.nio.file.Files.write(base.resolve("a.png"),
      png(8, 6)((x, y) => (x << 16) | y))
    java.nio.file.Files.write(base.resolve("b.gif"),
      animatedGif(Seq(0xff0000, 0x0000ff), 4, 4))
    java.nio.file.Files.write(base.resolve("notes.txt"),
      "not an image".getBytes)  // must be excluded by the glob
    val df = Multimodal.mediaFromImageDir(spark, base.toString)
    val rows = df.collect().map(r => (
      r.getAs[String]("path").split('/').last,
      r.getStruct(2).getString(0), r.getStruct(2).getInt(1),
      r.getStruct(2).getInt(3))).sortBy(_._1)
    assert(rows.toSeq == Seq(("a.png", "png", 8, 1), ("b.gif", "gif", 4, 2)))
    // ids are path-stable: re-listing yields identical ids
    val ids1 = df.select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Multimodal.mediaFromImageDir(spark, base.toString)
      .select("media_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2 && ids1.distinct.size == 2)
    // and the schema contract matches the canonical media table
    assert(df.schema("media").dataType.simpleString == "binary")
    assert(df.schema("meta").dataType.simpleString == Multimodal.mediaMetaType.simpleString)
  }

  test("imageFrames walks the REAL GIF container with stable indices") {
    val gif = animatedGif(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff), 4, 4)
    val frames = Multimodal.imageFrames(imageDf(Seq(9L -> gif)), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    val colors = frames.map { f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
        .getRGB(1, 1) & 0xffffff }
    assert(colors.toSeq == Seq(0xff0000, 0x0000ff))
  }

  /** Multi-page TIFF from solid frames (JDK TIFF writer sequence). */
  private def multiPageTiff(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("multi-page TIFF pages are counted by probe and walked by imageFrames") {
    val tiff = multiPageTiff(Seq(0xff0000, 0x00ff00, 0x0000ff), 4, 4)
    val meta = Multimodal.imageMeta(imageDf(Seq(11L -> tiff))).collect()(0)
    assert(meta.decodable && meta.n_frames == 3, meta)
    val frames = Multimodal.imageFrames(imageDf(Seq(11L -> tiff)), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    val colors = frames.map { f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
        .getRGB(1, 1) & 0xffffff }
    assert(colors.toSeq == Seq(0xff0000, 0x0000ff))
  }

  // ======== REAL audio codec (javax.sound.sampled) ========

  /** PCM WAV/AU bytes from integer samples — real container written by
    * the JDK's own audio writer, so the codec test decodes genuine
    * file bytes, not a hand-rolled header. */
  private def audioBytes(samples: Array[Int], sampleRate: Float = 8000f,
      channels: Int = 1, bits: Int = 16,
      tpe: javax.sound.sampled.AudioFileFormat.Type =
        javax.sound.sampled.AudioFileFormat.Type.WAVE): Array[Byte] = {
    val bigEndian = tpe == javax.sound.sampled.AudioFileFormat.Type.AU
    val signed = bits > 8
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, bits, channels, signed, bigEndian)
    val bytesPer = bits / 8
    val data = new Array[Byte](samples.length * bytesPer)
    samples.indices.foreach { i =>
      val v = if (signed) samples(i) else samples(i) + (1 << (bits - 1))
      (0 until bytesPer).foreach { b =>
        val shift = if (bigEndian) 8 * (bytesPer - 1 - b) else 8 * b
        data(i * bytesPer + b) = ((v >> shift) & 0xff).toByte
      }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  test("audioMeta probes REAL WAV/AU headers and quarantines garbage") {
    val sq = Array.tabulate(4096)(i => if (i % 2 == 0) 1000 else -1000)
    val df = imageDf(Seq(
      1L -> audioBytes(sq),
      2L -> audioBytes(sq, channels = 2, sampleRate = 16000f,
        tpe = javax.sound.sampled.AudioFileFormat.Type.AU),
      3L -> Array[Byte](9, 9, 9, 9)))
    val got = Multimodal.audioMeta(df).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).format == "wav" && got(1L).sample_rate == 8000
      && got(1L).channels == 1 && got(1L).bits == 16
      && got(1L).n_frames == 4096L && got(1L).decodable, got(1L))
    assert(got(2L).format == "au" && got(2L).sample_rate == 16000
      && got(2L).channels == 2 && got(2L).n_frames == 2048L, got(2L))
    assert(!got(3L).decodable && got(3L).format == "undecodable")
  }

  test("audioWindows: exact RMS/peak on real decoded PCM, bit-deterministic") {
    // +-1000 square wave: every window's RMS is EXACTLY 1000.0
    val sq = Array.tabulate(2500)(i => if (i % 2 == 0) 1000 else -1000)
    val rows = Multimodal.audioWindows(
        imageDf(Seq(5L -> audioBytes(sq))), windowSamples = 1024)
      .collect().sortBy(_.window_idx)
    assert(rows.map(_.n_samples).toSeq == Seq(1024, 1024, 452))
    assert(rows.forall(w => w.rms == 1000.0 && w.peak == 1000), rows.toSeq)
    // same samples through the big-endian AU container: identical stats
    val au = Multimodal.audioWindows(
        imageDf(Seq(6L -> audioBytes(sq,
          tpe = javax.sound.sampled.AudioFileFormat.Type.AU))),
        windowSamples = 1024)
      .collect().sortBy(_.window_idx)
    assert(au.map(w => (w.n_samples, w.rms, w.peak)).toSeq ==
      rows.map(w => (w.n_samples, w.rms, w.peak)).toSeq)
    // 8-bit unsigned recentering: constant 10 above the 128 midpoint
    val dc = Multimodal.audioWindows(
        imageDf(Seq(7L -> audioBytes(Array.fill(512)(10), bits = 8))),
        windowSamples = 512)
      .collect()
    assert(dc.length == 1 && dc(0).rms == 10.0 && dc(0).peak == 10, dc.toSeq)
    // undecodable payloads produce no rows (quarantine contract)
    assert(Multimodal.audioWindows(
      imageDf(Seq(8L -> Array[Byte](1, 2, 3)))).count() == 0)
  }

  test("audioFeatures emits the dense-vector shape the ANN family consumes") {
    val sq = Array.tabulate(3000)(i => if (i % 2 == 0) 500 else -500)
    val f = Multimodal.audioFeatures(
        imageDf(Seq(9L -> audioBytes(sq))), windowSamples = 1024)
      .collect()(0)
    assert(f.features.length == 3) // ceil(3000 / 1024)
    assert(f.features.forall(_ == 500.0f))
  }

  // ======== REAL video codec (MJPEG-AVI via JvmVideoCodec) ========

  import graft.multimodal.JvmVideoCodec

  /** Solid-color JPEG frame — real ImageIO JPEG bytes. Solid gray
    * survives JPEG's lossy DCT essentially exactly; color asserts
    * below use a small tolerance for chroma subsampling. */
  private def jpeg(w: Int, h: Int, color: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  test("videoMeta probes the REAL RIFF container and quarantines garbage") {
    val frames = Seq(0x404040, 0x808080, 0xc0c0c0).map(jpeg(8, 6, _))
    val avi = JvmVideoCodec.encodeMjpegAvi(frames, 8, 6, fpsMillis = 25000)
    val df = imageDf(Seq(1L -> avi, 2L -> Array[Byte](82, 73, 70, 70, 0))) // "RIFF" torso
    val got = Multimodal.videoMeta(df).collect().map(m => m.media_id -> m).toMap
    assert(got(1L).format == "avi/mjpeg" && got(1L).width == 8 && got(1L).height == 6
      && got(1L).n_frames == 3 && got(1L).fps_millis == 25000 && got(1L).decodable, got(1L))
    assert(!got(2L).decodable && got(2L).n_frames == 0)
  }

  test("demux round-trips the exact stored JPEG bytes; truncation degrades, never throws") {
    val frames = Seq(0x202020, 0x606060, 0xaaaaaa, 0xe0e0e0).map(jpeg(4, 4, _))
    val avi = JvmVideoCodec.encodeMjpegAvi(frames, 4, 4)
    val all = JvmVideoCodec.demuxFrames(avi, 1)
    assert(all.map(_._1) == Seq(0, 1, 2, 3))
    all.zip(frames).foreach { case ((_, got), exp) =>
      assert(java.util.Arrays.equals(got, exp), "demux must be a pure byte copy") }
    // container frame count comes from counting, not the header
    assert(JvmVideoCodec.probe(avi).get._4 == 4)
    // truncate mid-way through frame 3: earlier frames still demux
    val cut = java.util.Arrays.copyOf(avi, avi.length - frames.last.length / 2 - 4)
    val partial = JvmVideoCodec.demuxFrames(cut, 1)
    assert(partial.map(_._1).startsWith(Seq(0, 1, 2)) || partial.map(_._1) == Seq(0, 1, 2),
      s"got ${partial.map(_._1)}")
  }

  test("videoFrames emits the SAME normalized PNG bytes as the image frame path") {
    val frames = Seq(0x303030, 0x707070, 0xb0b0b0).map(jpeg(8, 8, _))
    val avi = JvmVideoCodec.encodeMjpegAvi(frames, 8, 8)
    val got = Multimodal.videoFrames(imageDf(Seq(3L -> avi)), stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2))
    // cross-modality parity: decoding the same stored JPEG through the
    // image codec's frame walk yields byte-identical PNG — video and
    // image frame rows are interchangeable downstream
    got.foreach { f =>
      val viaImage = graft.multimodal.JvmImageCodec.sampleFrames(frames(f.frame_idx), 1)
      assert(java.util.Arrays.equals(f.frame, viaImage.head._2))
    }
    // gray solids survive JPEG: decoded pixel within 1/255 of source
    val lum = got.map { f =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.frame))
        .getRGB(4, 4) & 0xff }
    assert(lum.zip(Seq(0x30, 0xb0)).forall { case (g, e) => math.abs(g - e) <= 1 }, lum.toSeq)
  }

  test("videoFeatures: one-pass demux+decode luminance grids, bit-deterministic") {
    val grays = Seq(0x101010, 0x505050, 0x909090, 0xd0d0d0)
    val avi = JvmVideoCodec.encodeMjpegAvi(grays.map(jpeg(8, 8, _)), 8, 8)
    val df = imageDf(Seq(4L -> avi))
    val feats = Multimodal.videoFeatures(df, grid = 2, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(feats.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(feats.forall(_.features.length == 4))
    // solid frame => all 4 cells equal, near the gray level
    feats.zip(grays).foreach { case (f, c) =>
      val exp = (c & 0xff) / 255.0f
      assert(f.features.forall(v => math.abs(v - exp) < 0.01), s"$f vs $exp")
      assert(f.features.distinct.length == 1)
    }
    // partitioning cannot change a bit (pure per-row codec)
    val again = Multimodal.videoFeatures(df.repartition(5), grid = 2, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(again.map(_.features.toSeq).toSeq == feats.map(_.features.toSeq).toSeq)
    // and the fan-out is pipelined: no exchange in the plan
    assert(!Multimodal.videoFeatures(df, 2, 1).queryExecution.executedPlan
      .toString.contains("Exchange"))
  }

  test("q195 family: dHash pairs a JPEG quality-shifted re-encode with its original; distinct images don't") {
    // 6 distinct images: 8x8 cells at cellPx=8 (cells align with JPEG
    // blocks, so each cell is a DC-only solid) and adjacent-cell gray
    // gaps of >= 45 levels — a lossy re-encode may perturb each cell's
    // luminance slightly but can never reorder neighbors, which is the
    // only thing dHash reads.
    val originals = (0L until 6L).map { b =>
      val grays = Array.tabulate(64)(i => ((b.toInt * 7 + i * 3) % 16) * 15)
      b -> Multimodal.encodeGridPng(grays, g = 8, cellPx = 8)
    }
    // the quality-shifted copy a crawled media lake is full of
    val shifted = Multimodal.reencodeJpeg(originals.head._2, quality = 0.8f).get
    val df = imageDf(originals :+ (100L -> shifted))
    val hashes = Multimodal.dHash64(df).toDF("media_id", "phash")
    val hmap = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distinct images stay apart: outside the hamming<=1 dup band
    for (a <- 0L until 6L; b <- (a + 1) until 6L)
      assert(java.lang.Long.bitCount(hmap(a) ^ hmap(b)) >= 2, s"img $a vs $b too close")
    // the re-encode lands within one bit of its original
    assert(java.lang.Long.bitCount(hmap(0L) ^ hmap(100L)) <= 1,
      f"re-encode drifted: ${hmap(0L)}%016x vs ${hmap(100L)}%016x")
    // and the half-band LSH join recovers EXACTLY the engineered pair
    val pairs = Multimodal.phashDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 100L)), pairs)
  }

  test("q198 family: envelope hash is gain-invariant (real WAV round-trip); distinct envelopes stay apart") {
    import spark.implicits._
    // 4 distinct 64-segment envelopes; adjacent-amp gaps >= 45 so the
    // comparisons are never razor-thin
    val envs = (0 until 4).map { b =>
      b.toLong -> Array.tabulate(64)(i => 100 + ((b * 7 + i * 3) % 16) * 15)
    }
    // the gain-shifted copy a normalizing pipeline produces: x3 on
    // every sample — RMS scales exactly, loudness ORDER (the only
    // thing the hash reads) is untouched
    val all = envs :+ (100L -> envs.head._2.map(_ * 3))
    val media = Multimodal.synthEnvelopeWav(
      all.toDF("media_id", "amps"), segSamples = 128)
    val hmap = Multimodal.envelopeHash64(media, windowSamples = 128)
      .collect().toMap
    for (a <- 0L until 4L; b <- (a + 1) until 4L)
      assert(java.lang.Long.bitCount(hmap(a) ^ hmap(b)) >= 2, s"env $a vs $b too close")
    assert(hmap(0L) == hmap(100L),
      f"gain shift changed the hash: ${hmap(0L)}%016x vs ${hmap(100L)}%016x")
    val pairs = Multimodal.phashDupPairs(
      Multimodal.envelopeHash64(media, 128).toDF("media_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 100L)), pairs)
  }

  test("q199 family: temporal hash survives per-frame JPEG re-encode + re-mux; distinct sequences stay apart") {
    import spark.implicits._
    // 4 distinct 64-frame gray sequences, gaps >= 12 levels so the
    // brightness ORDER survives lossy re-encoding noise
    val seqs = (0 until 4).map { b =>
      b.toLong -> Array.tabulate(64)(i => 16 + ((b * 7 + i * 3) % 16) * 12)
    }
    val base = Multimodal.synthGrayVideo(seqs.toDF("media_id", "grays"), w = 8, h = 8)
    // the re-posted copy: demux clip 0, re-encode every frame at JPEG
    // quality 0.8, re-mux into a fresh container
    val bytes0 = base.filter($"media_id" === 0L)
      .select("media").collect().head.getAs[Array[Byte]](0)
    val reenc = JvmVideoCodec.encodeMjpegAvi(
      JvmVideoCodec.demuxFrames(bytes0, 1)
        .map { case (_, jpeg) => Multimodal.reencodeJpeg(jpeg, 0.8f).get }, 8, 8)
    val media = base.union(Seq((100L, reenc)).toDF("media_id", "media"))
    val hmap = Multimodal.videoTemporalHash64(media).collect().toMap
    for (a <- 0L until 4L; b <- (a + 1) until 4L)
      assert(java.lang.Long.bitCount(hmap(a) ^ hmap(b)) >= 2, s"clip $a vs $b too close")
    assert(java.lang.Long.bitCount(hmap(0L) ^ hmap(100L)) <= 1,
      f"re-encode drifted: ${hmap(0L)}%016x vs ${hmap(100L)}%016x")
    val pairs = Multimodal.phashDupPairs(
      Multimodal.videoTemporalHash64(media).toDF("media_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 100L)), pairs)
  }

  test("q200 family: a cut clip's frame shingles are a strict subset of its original's (containment 1.0), via real demux") {
    import spark.implicits._
    // 24 non-repeating frame grays; the clip is frames [8, 19]
    val grays = Array.tabulate(24)(i => 16 + ((i * 11 + (i * i) % 7) % 28) * 8)
    val other = Array.tabulate(24)(i => 16 + ((i * 13 + 5) % 28) * 8)
    val media = Multimodal.synthGrayVideo(Seq(
      (0L, grays), (1L, grays.slice(8, 20)), (2L, other))
      .toDF("media_id", "grays"), w = 8, h = 8)
    val dsh = Multimodal.videoShingles(media, n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byId = dsh.groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
    assert(byId(0L).size == 22 && byId(1L).size == 10, byId.view.mapValues(_.size).toMap)
    // the clip's shingles sit INSIDE the original's — containment 1.0
    assert(byId(1L).subsetOf(byId(0L)), "clip shingles must match the original's verbatim")
    // an unrelated clip shares nothing
    assert(byId(2L).intersect(byId(0L)).isEmpty)
  }
}
