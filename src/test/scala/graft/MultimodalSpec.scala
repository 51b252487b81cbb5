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
}
