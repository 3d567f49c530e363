package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media travel as opaque `binary` columns with
  * a typed metadata struct; decode/feature-extract runs per partition so
  * batches amortize any codec setup cost.
  *
  * Three decode tiers:
  *  - [[decodeImage]]/[[extractImageFeatures]] — a REAL codec path:
  *    `javax.imageio` (JDK built-in, zero dependencies) decodes
  *    PNG/JPEG/GIF/BMP payloads to pixels inside the mapPartitions batch,
  *    exactly the shape a production image pipeline uses.
  *  - [[encodeWavPcm16]]/[[decodeWavFeatures]]/[[audioFeatures]] — a REAL
  *    audio codec path (r12): `javax.sound.sampled` (also JDK built-in)
  *    writes and reads WAV/PCM16, and because PCM16 encode→decode is
  *    bit-exact, the whole codec round trip is hash-checkable against a
  *    SQL oracle computing the same features from the raw samples.
  *  - [[decodeStub]]/[[resizeStub]] — deterministic byte-level stand-ins
  *    for codecs the JDK does not ship (video): they keep the
  *    declared queries oracle-replayable while exercising the identical
  *    plumbing (schema, binary column, partition batching, output shape).
  */
object Multimodal {

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Int,
      checksum: Long)

  /** STUB for media decode: deterministic byte-level features standing in
    * for (width, height, duration, …). Same rolling hash as
    * TextFunctions.polyHash so the oracle can replay it over ASCII text. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(id, bytes.length.toLong,
      if (bytes.nonEmpty) bytes(0) & 0xff else -1, acc)
  }

  /** Attach an opaque binary payload + typed metadata to each document.
    * (Test corpus has no real media, so the payload is the UTF-8 text.) */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      struct(lit("text/plain").as("mime"), length(col("text")).as("n_chars")).as("meta"))

  /** Feature extraction over the binary column as pure column expressions
    * (the [[decodeStub]] features are all expressible declaratively):
    * stays inside whole-stage codegen, no encoder/object boundary, no
    * shuffle. `first_byte` reads the payload's first octet unsigned via
    * substr→hex→conv (all codegen'd, O(1)); the checksum is the compiled
    * BytePolyHash expression. This is the default path; [[extractFeatures]]
    * keeps the mapPartitions shape for real codecs that force imperative
    * per-batch decode. */
  def extractFeaturesDeclarative(docs: DataFrame): DataFrame = {
    graft.functions.CatalystExpressions.register(docs.sparkSession)
    withPayload(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      when(length(col("payload")) === 0, lit(-1))
        .otherwise(conv(hex(col("payload").substr(1, 1)), 16, 10).cast("int"))
        .as("first_byte"),
      call_function("graft_bytehash", col("payload")).as("checksum"))
  }

  /** Distributed feature extraction over the binary column: mapPartitions
    * keeps decode batched per task (the Scala analogue of mapInPandas) —
    * the shape a real codec needs; for stub-expressible features prefer
    * [[extractFeaturesDeclarative]]. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, mean_luma: Double)

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP —
    * no added dependencies): width/height plus mean Rec.601 luma over all
    * pixels. Undecodable payloads return None — bad media is data to be
    * filtered, not an exception to kill a 100-TB job. */
  def decodeImage(id: Long, bytes: Array[Byte]): Option[ImageFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var luma = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            luma += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(ImageFeatures(id, w, h, n, luma / n))
      }
    } catch { case _: java.io.IOException => None }

  /** Batched REAL-codec feature extraction: the [[extractFeatures]]
    * mapPartitions shape instantiated with [[decodeImage]]. Rows whose
    * payload does not decode as an image are dropped (flatMap) — the
    * filter-bad-media step every multimodal curation pipeline starts
    * with. Input: (doc_id, payload binary). */
  def extractImageFeatures(spark: SparkSession, payloaded: DataFrame): DataFrame = {
    import spark.implicits._
    payloaded.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => decodeImage(id, bytes) })
      .toDF()
  }

  /** REAL image resize via the JDK: decode, scale so the longest side is
    * `maxDim` (aspect preserved, bilinear; never upscales), re-encode as
    * PNG. None for undecodable payloads — same bad-media-is-data contract
    * as [[decodeImage]]. */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        if (scale >= 1.0) Some(bytes) // already within budget: pass through
        else {
          val nw = math.max(1, math.round(img.getWidth * scale).toInt)
          val nh = math.max(1, math.round(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      }
    } catch { case _: java.io.IOException => None }

  /** Batched real image resize — the [[resize]] mapPartitions shape with
    * the JDK codec; undecodable payloads are dropped. */
  def resizeImages(spark: SparkSession, payloaded: DataFrame,
      maxDim: Int): DataFrame = {
    import spark.implicits._
    payloaded.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => resizeImage(b, maxDim).map((id, _)) })
      .toDF("doc_id", "payload")
  }

  /** STUB for media resize/downsample: keep every `stride`-th byte. A real
    * deployment swaps the body for an image scaler; the contract —
    * binary in, smaller binary out, schema unchanged — is what the
    * pipeline depends on. */
  def resizeStub(bytes: Array[Byte], stride: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
    out
  }

  /** Batched resize over the payload column (same mapPartitions shape as
    * [[extractFeatures]]). Returns (doc_id, payload); re-derive or re-join
    * metadata downstream — the payload change invalidates size-dependent
    * meta anyway. */
  def resize(spark: SparkSession, payloaded: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    payloaded.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, resizeStub(b, stride)) })
      .toDF("doc_id", "payload")
  }

  final case class AudioFeatures(user_id: Long, n_samples: Long,
      sum_sq: Long, zero_cross: Long, peak: Long)

  /** REAL audio encode via the JDK: PCM16 mono little-endian samples →
    * a WAV container, written by `javax.sound.sampled.AudioSystem`
    * itself (no hand-rolled header — the codec writes what the codec
    * reads). PCM16 is lossless, so [[decodeWavFeatures]] recovers the
    * exact samples — what makes the audio path hash-checkable. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode via the JDK: parse the WAV container, read the
    * PCM frames, and fold the signal features every audio curation
    * pipeline filters on — sample count, energy (Σs² — kept as the
    * exact integer instead of a float RMS), zero crossings (strict
    * sign flips in frame order), peak |s|. None for payloads the codec
    * rejects — the bad-media-is-data contract of [[decodeImage]]. */
  def decodeWavFeatures(id: Long, wav: Array[Byte]): Option[AudioFeatures] =
    try {
      import javax.sound.sampled.AudioSystem
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val big = fmt.isBigEndian
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          var sumSq = 0L
          var zc = 0L
          var peak = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            val s = if (big) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff))
              else ((hi << 8) | lo)
            sumSq += s.toLong * s
            if (i > 0 && prev.toLong * s < 0) zc += 1
            if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
            prev = s
            i += 1
          }
          Some(AudioFeatures(id, n.toLong, sumSq, zc, peak))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batched REAL-codec audio features over per-key signals
    * (`(user_id long, samples array<int>)`, one row per signal): each
    * signal round-trips through the JDK WAV codec — encode to the
    * container, decode the container, fold features from the DECODED
    * frames — inside the mapPartitions batch, exactly the shape a
    * production audio pipeline uses (payload bytes in, features out).
    * PCM16 losslessness makes the output equal features computed from
    * the raw samples, which is what the SQL oracle replays (q132). */
  def audioFeatures(spark: SparkSession, signals: DataFrame): DataFrame = {
    import spark.implicits._
    signals.as[(Long, Seq[Int])]
      .mapPartitions(_.flatMap { case (id, s) =>
        decodeWavFeatures(id, encodeWavPcm16(s.map(_.toShort).toArray))
      })
      .toDF()
  }

  final case class AudioFrame(user_id: Long, frame: Long, n_samples: Long,
    sum_sq: Long, zero_cross: Long, peak: Long)

  /** FRAMED audio features from a real WAV decode — the
    * voice-activity-detection / silence-trim granularity (whole-clip
    * energy says nothing about WHERE the speech is; VAD, trimming, and
    * chunked ASR all consume per-frame energy): the decoded PCM stream
    * is cut into consecutive `frameSize`-sample frames and each frame
    * folds the same exact-integer features as [[decodeWavFeatures]].
    * Zero crossings are counted WITHIN a frame only (the boundary
    * sample pair belongs to neither) — the contract that lets a SQL
    * oracle replay frames independently. Trailing partial frame kept
    * (n_samples < frameSize marks it). */
  def decodeWavFrameFeatures(id: Long, wav: Array[Byte],
      frameSize: Int): Seq[AudioFrame] =
    try {
      import javax.sound.sampled.AudioSystem
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) Nil
        else {
          val big = fmt.isBigEndian
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = Seq.newBuilder[AudioFrame]
          var f = 0L
          var i = 0
          while (i < n) {
            val end = math.min(i + frameSize, n)
            var sumSq = 0L
            var zc = 0L
            var peak = 0L
            var prev = 0
            var j = i
            while (j < end) {
              val lo = bytes(2 * j) & 0xff
              val hi = bytes(2 * j + 1).toInt
              val s = if (big) ((bytes(2 * j).toInt << 8) | (bytes(2 * j + 1) & 0xff))
                else ((hi << 8) | lo)
              sumSq += s.toLong * s
              if (j > i && prev.toLong * s < 0) zc += 1
              if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
              prev = s
              j += 1
            }
            out += AudioFrame(id, f, (end - i).toLong, sumSq, zc, peak)
            f += 1
            i = end
          }
          out.result()
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => Nil
      case _: java.io.IOException => Nil
    }

  /** Batched framed features: [[audioFeatures]]' pipeline at frame
    * granularity — encode to the WAV container, decode it, fold per
    * frame, all inside the mapPartitions batch. PCM16 losslessness
    * makes each frame's features equal those computed from the raw
    * samples, which is what the SQL oracle replays per (key, frame). */
  def audioFrameFeatures(spark: SparkSession, signals: DataFrame,
      frameSize: Int): DataFrame = {
    import spark.implicits._
    signals.as[(Long, Seq[Int])]
      .flatMap { case (id, s) =>
        decodeWavFrameFeatures(id, encodeWavPcm16(s.map(_.toShort).toArray),
          frameSize)
      }
      .toDF()
  }

  final case class ImageHash(doc_id: Long, sig: Long)

  /** REAL image encode via the JDK: a 16×16 grayscale test card
    * (r = g = b = pixel) written through `javax.imageio`'s BMP codec.
    * 24-bit BMP is uncompressed and lossless, so decode recovers the
    * exact pixels — the imaging twin of [[encodeWavPcm16]]'s PCM16
    * argument, and what makes the perceptual-hash path hash-checkable
    * end to end. `pixels` is row-major, 256 values in [0, 255]. */
  def encodeGrayBmp16(pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == 256, s"need 256 pixels, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val p = pixels(y * 16 + x) & 0xff
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** REAL image decode + perceptual AVERAGE HASH (aHash): decode the
    * payload through `javax.imageio`, 2×2-block-reduce the 16×16 gray
    * image to 8×8 block sums, and set bit j iff block j's sum exceeds
    * the image mean (strictly — `sum·64 > total` in exact integer
    * arithmetic, no division). The signature keeps blocks 0–59 (60
    * bits): a 64-bit mask would need bit 63, which signed-long SQL
    * replay cannot build (the q21 SimHash60 convention), and 60 bits
    * tile exactly into the 15-bit × 4 LSH bands the Hamming pair
    * search uses. None for undecodable or wrong-shape payloads — the
    * bad-media-is-data contract of [[decodeImage]]. */
  def decodeImageAHash(id: Long, bytes: Array[Byte]): Option[ImageHash] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth != 16 || img.getHeight != 16) None
      else {
        val bs = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val p = (img.getRGB(x, y) & 0xff).toLong
            bs((y / 2) * 8 + x / 2) += p
            total += p
            x += 1
          }
          y += 1
        }
        var sig = 0L
        var j = 0
        while (j < 60) {
          if (bs(j) * 64L > total) sig |= 1L << j
          j += 1
        }
        Some(ImageHash(id, sig))
      }
    } catch { case _: java.io.IOException => None }

  /** Batched REAL-codec image perceptual hashing over per-doc pixel
    * rows (`(doc_id long, pixels array<int>)`): each image round-trips
    * through the JDK BMP codec — encode to the container, decode the
    * container, aHash from the DECODED raster — inside the
    * mapPartitions batch. BMP losslessness makes the output equal a
    * hash computed from the raw pixels, which is what the SQL oracle
    * replays (q140); compose with [[graft.ops.Dedup.hammingPairs]] for
    * the image near-dup pair search. */
  def imageAHash(spark: SparkSession, pixelRows: DataFrame): DataFrame = {
    import spark.implicits._
    pixelRows.as[(Long, Seq[Int])]
      .mapPartitions(_.flatMap { case (id, px) =>
        decodeImageAHash(id, encodeGrayBmp16(px.toArray))
      })
      .toDF()
  }

  /** [[imageAHash]] with the test-card CONSTRUCTION fused into the
    * kernel: pixels come straight from the text's chars
    * (`p(i) = text[i mod len]`, the declared card recipe) inside the
    * same mapPartitions pass that encodes and decodes. The declarative
    * alternative — `transform(sequence(0,255), i -> ascii(substr(…)))`
    * feeding [[imageAHash]] — evaluates an INTERPRETED higher-order
    * lambda 256× per row (each allocating a substring) plus an
    * array-encoder boundary, and measured ~4× the whole codec cost
    * (q140 full-run 3.84 s → BenchOne 0.99 s min at sf0.1 under this
    * fusion — the q107/q120 interpreted-HOF lesson, fourth instance).
    * Input: (doc_id, text); rows with NULL/empty text are dropped. */
  def imageAHashFromText(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        if (text == null || text.isEmpty) None
        else {
          val n = text.length
          val px = new Array[Int](256)
          var i = 0
          while (i < 256) { px(i) = text.charAt(i % n) & 0xff; i += 1 }
          decodeImageAHash(id, encodeGrayBmp16(px))
        }
      })
      .toDF()
  }

  /** Frame sampling: one output row per sampled fixed-width frame of the
    * payload — frame i covers bytes [i·stride, i·stride + frameSize).
    * Fully declarative (sequence → transform → posexplode over binary
    * substring), so it stays inside whole-stage codegen and needs no
    * shuffle: the 1→N row expansion every video/audio pipeline starts
    * with. A real deployment replaces "fixed stride" with codec keyframe
    * offsets from the metadata struct. */
  def frameSample(payloaded: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val n = length(col("payload"))
    val nFrames = expr(s"(length(payload) - $frameSize) div $stride") + 1
    payloaded
      .filter(n >= frameSize)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), (nFrames - 1).cast("int")),
          i => col("payload").substr(i * stride + 1, lit(frameSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("frame_no"),
        col("col").as("frame"))
  }
}
