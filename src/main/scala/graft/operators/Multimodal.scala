package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `BINARY`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested. The actual codec work is STUBBED with a
  * deterministic fake (`StubCodec`): this container has no image/audio
  * libraries, and the contract asks for the pipeline shape, not pixels.
  * Swap `StubCodec` for a JNI/javacv decoder at deployment; nothing else
  * changes.
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
