package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A).map(_.toByte)
  private val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)
  private val junk = "hello".getBytes("UTF-8")

  test("sniffMediaType: magic bytes over binary column") {
    val got = Seq((1L, png, "x"), (2L, jpeg, "x"), (3L, junk, "x"))
      .toDF("media_id", "content", "media_type")
      .orderBy("media_id")
      .select(Multimodal.sniffMediaType(col("content"))).as[String].collect()
    assert(got.toSeq == Seq("image/png", "image/jpeg", "application/octet-stream"))
  }

  test("mediaMetadata: typed metadata columns") {
    val got = Multimodal.mediaMetadata(
      Seq((1L, png, "image/png")).toDF("media_id", "content", "media_type")).head()
    assert(got.getAs[Int]("byte_length") == 6)
    assert(got.getAs[String]("sniffed_type") == "image/png")
  }

  test("segmentAudio: window fan-out, byte-sum energy, voiced threshold") {
    // 100 loud bytes (0xFF) then 60 quiet bytes (0x01): window 64 →
    // segs [0,64) all-loud, [64,128) mixed, [128,160) all-quiet
    val bytes = (Array.fill(100)(0xFF) ++ Array.fill(60)(0x01)).map(_.toByte)
    val media = Seq(Multimodal.MediaRecord(7L, bytes, "audio/pcm", "")).toDS()
    val got = Multimodal.segmentAudio(spark, media, windowBytes = 64,
      meanEnergyThreshold = 100).collect().sortBy(_.seg_idx)
    assert(got.map(s => (s.seg_idx, s.start_byte, s.end_byte)).toSeq ==
      Seq((0, 0, 64), (1, 64, 128), (2, 128, 160)))
    assert(got(0).energy == 64L * 255 && got(0).voiced)
    assert(got(1).energy == 36L * 255 + 28L * 1 && got(1).voiced) // mean ≈ 143
    assert(got(2).energy == 32L && !got(2).voiced)
    // empty blob → zero segments, not one empty segment
    val empty = Seq(Multimodal.MediaRecord(8L, Array.empty[Byte], "audio/pcm", "")).toDS()
    assert(Multimodal.segmentAudio(spark, empty).count() == 0)
  }

  test("extractFeatures: batched stubbed decode, unit-norm features") {
    val media = Seq(
      Multimodal.MediaRecord(1L, png, "image/png", ""),
      Multimodal.MediaRecord(2L, junk, "text/plain", "")
    ).toDS()
    val got = Multimodal.extractFeatures(spark, media, batchSize = 1)
      .collect().sortBy(_.media_id)
    assert(got.length == 2)
    assert(got(0).sniffed_type == "image/png")
    assert(got(0).feature.length == 16)
    val norm = math.sqrt(got(0).feature.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // decode is deterministic
    assert(Multimodal.decodeStub(junk).toSeq == Multimodal.decodeStub(junk).toSeq)
  }

  test("avgHash64: known bit pattern, profile invariance, perceptual groups") {
    import graft.functions.native
    // half zeros, half 255s: blocks 32..63 above the mean
    val half = Array.fill[Byte](64)(0)
    (32 until 64).foreach(i => half(i) = 0xFF.toByte)
    val expect = (32 until 64).foldLeft(0L)((a, i) => a | (1L << i))
    assert(native.avgHash64(half) == expect)
    assert(native.avgHash64(Array.emptyByteArray) == 0L)
    assert(native.avgHash64(Array.fill[Byte](100)(7)) == 0L) // flat: no bit above mean
    // byte-doubling preserves the block profile → same hash
    val doubled = half.flatMap(b => Array(b, b))
    assert(native.avgHash64(doubled) == expect)

    import spark.implicits._
    val media = Seq(
      (1L, "aaaaaaaaaaaaaaaaZZZZZZZZZZZZZZZZ"),
      (2L, "aaaaaaaaaaaaaaaaZZZZZZZZZZZZZZZZ"), // verbatim copy
      (3L, "ZZZZZZZZZZZZZZZZaaaaaaaaaaaaaaaa"), // reversed profile
      (4L, "something else entirely goes here")
    ).toDF("media_id", "txt").select(col("media_id"),
      encode(col("txt"), "UTF-8").as("content"))
    val groups = Multimodal.perceptualDuplicates(media)
      .select("media_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L)) // only the true copies group
  }
}
