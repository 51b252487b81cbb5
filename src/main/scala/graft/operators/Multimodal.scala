package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns
  * with typed metadata, mirroring IngestionDocumentImage
  * (IngestionDocument.cs:215-243: Content bytes + MediaType +
  * AlternativeText).
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` produces deterministic fake features. The
  * Spark-side plumbing — binary schema, magic-byte sniffing, batched
  * per-partition UDF shape, partition sizing — is real, and a
  * production decoder (pillow/ffmpeg via mapInPandas, or a JVM codec)
  * swaps in behind the same row contract.
  */
object Multimodal {

  /** Media record: the multimodal row contract. */
  final case class MediaRecord(
      media_id: Long,
      content: Array[Byte],
      media_type: String,
      alt_text: String
  )

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_length: Int,
      sniffed_type: String,
      feature: Array[Float]
  )

  /** Magic-byte media sniffing as a pure column expression (PNG, JPEG,
    * GIF, RIFF/WAV, PDF; else octet-stream).
    */
  def sniffMediaType(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(content, 1, 4)) === "89504E47", "image/png")
      .when(hex(substring(content, 1, 3)) === "FFD8FF", "image/jpeg")
      .when(hex(substring(content, 1, 3)) === "474946", "image/gif")
      .when(hex(substring(content, 1, 4)) === "52494646", "audio/wav")
      .when(hex(substring(content, 1, 4)) === "25504446", "application/pdf")
      .otherwise("application/octet-stream")

  /** Typed metadata extraction over a binary column — pure column ops
    * (length, sniffed type, content hash): the non-stub half of the
    * multimodal surface.
    */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      length(col("content")).as("byte_length"),
      sniffMediaType(col("content")).as("sniffed_type"),
      xxhash64(col("content")).as("content_hash")
    )

  /** Exact binary dedup over a media column — the first pass of any
    * multimodal pipeline (a crawl's images/audio repeat verbatim far
    * more than its text; CDN copies, mirrored assets, re-uploads):
    * group by the sha-256 of the raw BYTES (content-addressing —
    * collision-free at any corpus size, the [[graft.operators.Dedup]]
    * exactGroups contract) and emit every member of each duplicate
    * group with its group size and the keeper (min media_id). Raw
    * bytes never shuffle — only (digest, media_id, byte_length).
    */
  def binaryDuplicates(media: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("digest"))
    media
      .select(col("media_id"), sha2(col("content"), 256).as("digest"),
        length(col("content")).as("byte_length"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keeper_id", min(col("media_id")).over(w))
      .where(col("group_size") > 1)
      .select(col("media_id"), col("digest"), col("byte_length"),
        col("group_size"), col("keeper_id"))
  }

  /** Perceptual-duplicate groups over media bytes: identical 64-bit
    * average hash (graft.functions.native.avgHash64 — the aHash
    * SHAPE; a real pipeline decodes to a grayscale grid first and
    * hashes that, which slots in at the same column). The near-dup
    * complement of [[binaryDuplicates]]: catches copies whose bytes
    * differ but whose coarse block profile survives (padding,
    * trailing-metadata edits), misses nothing sha-256 catches only
    * when re-encoding scrambles every block.
    *
    * Scale: hash is one map-only scan-stage kernel; only (media_id,
    * phash, length) reach the group window — raw bytes never shuffle
    * (the m_binary_dedup contract).
    */
  def perceptualDuplicates(media: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("phash"))
    media
      .select(col("media_id"),
        graft.functions.native.avgHash64(col("content")).as("phash"),
        length(col("content")).as("byte_length"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keeper_id", min(col("media_id")).over(w))
      .where(col("group_size") > 1)
      .select(col("media_id"), col("phash"), col("byte_length"),
        col("group_size"), col("keeper_id"))
  }

  /** Deterministic fake "decode": byte histogram over 16 buckets,
    * L2-normalized — stands in for a real image decode + model
    * embedding. Runs per partition in fixed-size batches (the same
    * shape a mapInPandas/Arrow decoder would use, so swapping in a real
    * decoder changes only this function).
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xFF) >> 4) += 1.0
      i += 1
    }
    val norm = math.sqrt(hist.map(x => x * x).sum)
    if (norm > 0) hist.map(x => (x / norm).toFloat) else new Array[Float](16)
  }

  /** Batched feature extraction: mapPartitions with an explicit batch
    * size (the JVM twin of mapInPandas batches — a real decoder would
    * amortize model setup per batch exactly like this).
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (decoder/model init)
        batch.map { r =>
          val sniffed = sniff(r.content)
          MediaFeatures(r.media_id, r.media_type, r.content.length, sniffed,
            decodeStub(r.content))
        }
      }
    }
  }

  /** One sampled frame (or resized image) from a media blob. */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame: Array[Byte],
      width: Int,
      height: Int
  )

  /** Frame sampling: one row per sampled frame, evenly spaced. The
    * frame "decode" is stubbed (a deterministic slice of the blob —
    * no codecs in this container); the row contract, fan-out shape and
    * per-partition batching are exactly what an ffmpeg-backed decoder
    * would use. A narrow flatMap: no shuffle, scales with input splits.
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   nFrames: Int = 4): Dataset[MediaFrame] = {
    import spark.implicits._
    media.flatMap { r =>
      val len = r.content.length
      if (len == 0) Seq.empty
      else (0 until nFrames).map { i =>
        val start = (len.toLong * i / nFrames).toInt
        val end = (len.toLong * (i + 1) / nFrames).toInt
        // STUB: a real implementation decodes frame i/nFrames via a codec
        MediaFrame(r.media_id, i, java.util.Arrays.copyOfRange(r.content, start, end),
          width = 0, height = 0)
      }
    }
  }

  /** One audio segment: a fixed-width sample window with its energy. */
  final case class AudioSegment(
      media_id: Long,
      seg_idx: Int,
      start_byte: Int,
      end_byte: Int,
      energy: Long,
      voiced: Boolean
  )

  /** Audio segmentation stub: treat the blob as a PCM sample stream,
    * window it at `windowBytes`, and emit one row per window with its
    * energy (sum of unsigned byte values — a deterministic stand-in for
    * RMS over decoded samples) and a voiced/silence flag from a
    * mean-energy threshold. The row contract, fan-out shape and narrow
    * flatMap are exactly what an ffmpeg/librosa-backed VAD would use —
    * only the energy function is a stub. No shuffle: scales with input
    * splits like every other decode path here.
    */
  def segmentAudio(spark: SparkSession, media: Dataset[MediaRecord],
                   windowBytes: Int = 64, meanEnergyThreshold: Int = 100): Dataset[AudioSegment] = {
    import spark.implicits._
    media.flatMap { r =>
      val len = r.content.length
      val nSeg = (len + windowBytes - 1) / windowBytes
      (0 until nSeg).map { i =>
        val start = i * windowBytes
        val end = math.min(start + windowBytes, len)
        var energy = 0L
        var j = start
        while (j < end) { energy += (r.content(j) & 0xFF); j += 1 }
        // integer threshold compare (energy/width vs mean): portable,
        // no float division on the compared surface
        AudioSegment(r.media_id, i, start, end, energy,
          voiced = energy >= meanEnergyThreshold.toLong * (end - start))
      }
    }
  }

  /** Resize stub: passes bytes through and records the target size in
    * metadata (a real implementation re-encodes via an image library
    * behind this exact signature).
    */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): DataFrame =
    media.toDF().select(
      col("media_id"), col("content"), col("media_type"),
      lit(w).as("target_width"), lit(h).as("target_height")
    )

  private def sniff(b: Array[Byte]): String = {
    def is(sig: Int*): Boolean =
      b.length >= sig.length && sig.zipWithIndex.forall { case (s, i) => (b(i) & 0xFF) == s }
    if (is(0x89, 0x50, 0x4E, 0x47)) "image/png"
    else if (is(0xFF, 0xD8, 0xFF)) "image/jpeg"
    else if (is(0x47, 0x49, 0x46)) "image/gif"
    else if (is(0x52, 0x49, 0x46, 0x46)) "audio/wav"
    else if (is(0x25, 0x50, 0x44, 0x46)) "application/pdf"
    else "application/octet-stream"
  }
}
