package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `BINARY`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested. IMAGES have a REAL codec ([[ImageCodec]]:
  * javax.imageio, JDK built-in — PNG encode/decode over genuine pixel
  * rasters, exercised by [[imageFeatures]]/q_media_decode) and so does
  * AUDIO ([[AudioCodec]]: javax.sound.sampled — 16-bit PCM WAV
  * encode/decode with RMS + zero-crossing stats from actual samples,
  * [[audioFeatures]]/q_audio_decode). Only VIDEO decode remains STUBBED
  * with a deterministic fake (`StubCodec`): the JDK ships no video
  * codec. Swap `StubCodec` for a JNI/javacv decoder at deployment;
  * nothing else changes.
  *
  * Scale notes: media bytes are the widest column by orders of magnitude —
  * every transform here keeps them OUT of shuffles (feature extraction is
  * map-only via `mapPartitions`; joins carry `media_id` + features only).
  * `binaryFile` sources at real scale should set
  * `spark.sql.files.maxPartitionBytes` to bound partition memory.
  */
object Multimodal {

  /** Typed media row: kind ∈ {image, audio, video}; bytes opaque. */
  case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Extracted feature row — what downstream training pipelines join on. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, content_hash: Long,
      feature: Array[Float])

  val mediaSchema: StructType = Encoders.product[MediaRow].schema

  // ------------------------------------------------------------------
  // STUB CODEC — deterministic fake standing in for image/audio libs.
  // ------------------------------------------------------------------
  object StubCodec {
    /** Deterministic FNV-based "decode": bytes → dim-length float feature.
      * A real deployment replaces this body with JPEG/PNG decode + model
      * inference; signature and batch shape stay identical.
      */
    def decodeToFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L
        out(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536.0f - 0.5f
        i += 1
      }
      out
    }
    /** Deterministic fake resize: recompute metadata only (real impl:
      * scale pixels). */
    def resizeMeta(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      if (math.max(w, h) <= maxSide || math.max(w, h) == 0) (w, h)
      else {
        val s = maxSide.toDouble / math.max(w, h)
        (math.max(1, (w * s).toInt), math.max(1, (h * s).toInt))
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL IMAGE CODEC — javax.imageio (JDK built-in, zero new deps).
  // ------------------------------------------------------------------
  object ImageCodec {
    /** Deterministic PNG: a w×h RGB raster whose pixel (x, y) is a
      * splitmix64 of (seed, x, y). PNG is LOSSLESS, so the decoded
      * raster — and every statistic of it — is a pure function of
      * (w, h, seed): the determinism the specs assert is a property of
      * the format, not of luck.
      */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var z = seed + x * 0x9E3779B97F4A7C15L + y * 0xC2B2AE3D27D4EB4FL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    final case class Decoded(width: Int, height: Int, nChannels: Int,
      meanR: Double, meanG: Double, meanB: Double)

    /** REAL decode + per-channel mean: ImageIO parses the container,
      * inflates the raster, and the stats are computed from actual
      * pixels. Untagged sRGB PNGs take no color-management path, so the
      * decoded values are bit-identical across JVMs.
      */
    def decodeStats(bytes: Array[Byte]): Decoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image bytes")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >>> 16) & 0xFF; sg += (p >>> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      Decoded(w, h, img.getColorModel.getNumComponents,
        sr / n, sg / n, sb / n)
    }
  }

  // ------------------------------------------------------------------
  // REAL AUDIO CODEC — javax.sound.sampled (JDK built-in, zero deps):
  // 16-bit mono PCM WAV encode + container-parsed decode.
  // ------------------------------------------------------------------
  object AudioCodec {
    /** Deterministic WAV: `nSamples` of a 16-bit mono sine whose
      * frequency and amplitude derive from the seed. PCM is lossless, so
      * decoded sample statistics are a pure function of
      * (nSamples, sampleRate, seed).
      */
    def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      val freq = 200.0 + (math.abs(seed) % 800)
      val amp = 0.2 + (math.abs(seed) % 7) * 0.1
      var i = 0
      while (i < nSamples) {
        val v = math.sin(2.0 * math.Pi * freq * i / sampleRate) * amp
        bb.putShort((v * 32767.0).toShort)
        i += 1
      }
      bb.array()
    }

    final case class Decoded(sampleRate: Int, nSamples: Long,
      rms: Double, zeroCrossings: Long)

    /** REAL decode: AudioSystem parses the RIFF/WAVE container and frame
      * format; RMS + zero-crossing stats come from the actual PCM
      * samples — the standard cheap audio-quality signals (silence /
      * clipping / dead channels show up immediately in RMS and ZCR).
      */
    def decodeStats(bytes: Array[Byte]): Decoded = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit mono PCM, got $fmt")
        val raw = ais.readAllBytes()
        var sumSq = 0.0
        var zc = 0L
        var prevPos = true
        var n = 0L
        var i = 0
        while (i + 1 < raw.length) {
          val s = ((raw(i) & 0xFF) | (raw(i + 1) << 8)).toShort
          sumSq += s.toDouble * s
          val pos = s >= 0
          if (n > 0 && pos != prevPos) zc += 1
          prevPos = pos
          n += 1
          i += 2
        }
        Decoded(fmt.getSampleRate.toInt, n,
          if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0, zc)
      } finally ais.close()
    }
  }

  /** Per-clip REAL-decode stats row. */
  case class AudioStats(media_id: Long, sample_rate: Int, n_samples: Long,
      rms: Double, zero_crossings: Long, n_bytes: Long)

  /** Media table with GENUINE WAV bytes (deterministic sine PCM; length
    * and tone derive from the id). Map-only generation, like
    * [[syntheticImageTable]].
    */
  def syntheticAudioTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (id % 400 + 100).toInt
        (id, "audio", AudioCodec.encodeWav(n, 16000, id), 16000, n)
      }
    }.toDF("media_id", "kind", "bytes", "sample_rate", "n_samples_meta")
  }

  /** REAL audio feature extraction at the mapPartitions codec boundary:
    * container-parsed sample rate + PCM-derived RMS / zero-crossing
    * stats. Map-only; bytes never shuffle.
    */
  def audioFeatures(media: DataFrame): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val s = AudioCodec.decodeStats(bytes)
          AudioStats(id, s.sampleRate, s.nSamples, s.rms, s.zeroCrossings,
            bytes.length.toLong)
        }
      }
  }

  /** Per-image REAL-decode stats row. */
  case class ImageStats(media_id: Long, img_width: Int, img_height: Int,
      n_channels: Int, mean_r: Double, mean_g: Double, mean_b: Double,
      n_bytes: Long)

  /** Media table with GENUINE PNG bytes (encoded per-row from a
    * deterministic raster; dims derived from the id). Generation is
    * map-only inside `mapPartitions` — bytes are born on executors and,
    * chained into [[imageFeatures]], die there without ever shuffling.
    */
  def syntheticImageTable(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 31 + 2).toInt
        val h = (id % 23 + 2).toInt
        (id, "image", ImageCodec.encodePng(w, h, id), w, h)
      }
    }.toDF("media_id", "kind", "bytes", "width", "height")
  }

  /** REAL image feature extraction: decode PNG bytes with javax.imageio
    * at the `mapPartitions` codec boundary (the same boundary the stub
    * path proves) and emit width/height/channels + per-channel means
    * computed from genuine pixel data. Map-only; bytes never shuffle.
    */
  def imageFeatures(media: DataFrame): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val s = ImageCodec.decodeStats(bytes)
          ImageStats(id, s.width, s.height, s.nChannels,
            s.meanR, s.meanG, s.meanB, bytes.length.toLong)
        }
      }
  }

  /** Synthesize a media table from the documents table (deterministic fake
    * bytes = UTF-8 of the text; kind round-robins by id). Stands in for a
    * `spark.read.format("binaryFile")` scan, which this container's
    * testdata doesn't include.
    */
  def syntheticMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (pmod(col("doc_id") * 37, lit(1920)) + 1).cast("int").as("width"),
      (pmod(col("doc_id") * 53, lit(1080)) + 1).cast("int").as("height"),
      lit(16000).cast("int").as("sample_rate"),
      (pmod(col("doc_id"), lit(240)) + 1).cast("int").as("n_frames"))

  /** Batched feature extraction — the Scala analogue of a Pandas-UDF
    * `mapInPandas` stage: per-partition iteration, explicit batch size,
    * codec invoked per batch. Map-only: media bytes never shuffle.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"),
      col("width"), col("height"), col("sample_rate"), col("n_frames"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real impl hands a contiguous buffer
          // to the native decoder / accelerator
          batch.iterator.map { r =>
            var h = 0xcbf29ce484222325L
            r.bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
            MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, h,
              StubCodec.decodeToFeature(r.bytes, dim))
          }
        }
      }
  }

  /** Resize stage (metadata-real, pixel-stub): map-only projection. */
  def resize(media: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(lit(maxSide) / greatest(col("width"), col("height")), lit(1.0))
    media
      .withColumn("resized_width", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("resized_height", greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Frame sampling for video rows: emit one row per sampled frame index
    * (every `stride`-th frame) — the explode pattern that fans a video into
    * training frames WITHOUT duplicating bytes per frame (frame_idx +
    * media_id travel; the decoder seeks at read time).
    */
  def sampleFrames(media: DataFrame, stride: Int = 30): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
}
