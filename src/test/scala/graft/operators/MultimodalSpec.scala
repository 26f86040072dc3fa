package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "abcdefghij"),
    (2L, ""),
    (3L, "xy")).toDF("doc_id", "text")

  test("packPayload wraps text as binary with declared modality") {
    val out = Multimodal.packPayload(docs, "text", "image/fake")
      .select("doc_id", "payload", "modality").orderBy("doc_id").collect()
    new String(out.head.getAs[Array[Byte]]("payload"), "UTF-8") shouldBe "abcdefghij"
    out.head.getString(2) shouldBe "image/fake"
  }

  test("decodeStub derives deterministic dims and luma from bytes") {
    val out = Multimodal.decodeStub(Multimodal.packPayload(docs, "text", "image/fake"))
      .select(col("doc_id"), col("meta.byte_len"), col("meta.width"),
        col("meta.height"), col("meta.mean_luma"))
      .orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 10L
    out(0).getInt(2) shouldBe 3 // floor(sqrt(10))
    out(0).getInt(3) shouldBe 3 // 10 / 3
    out(0).getDouble(4) shouldBe ("abcdefghij".map(_.toInt).sum.toDouble / 10) +- 1e-9
    out(1).getLong(1) shouldBe 0L // empty payload: len 0, dims clamp to 1
    out(1).getInt(2) shouldBe 1
  }

  test("resizeStub keeps every stride-th byte, empty and short payloads safe") {
    val out = Multimodal
      .resizeStub(Multimodal.packPayload(docs, "text", "image/fake"), stride = 3)
      .select("doc_id", "resized").orderBy("doc_id").collect()
    new String(out(0).getAs[Array[Byte]]("resized"), "UTF-8") shouldBe "adgj"
    out(1).getAs[Array[Byte]]("resized") shouldBe Array.empty[Byte]
    new String(out(2).getAs[Array[Byte]]("resized"), "UTF-8") shouldBe "x"
  }

  test("resizeStub stride 1 is the identity") {
    val out = Multimodal
      .resizeStub(Multimodal.packPayload(docs, "text", "image/fake"), stride = 1)
      .filter($"doc_id" === 1L).select("resized").collect()
    new String(out.head.getAs[Array[Byte]]("resized"), "UTF-8") shouldBe "abcdefghij"
  }

  test("resizeStub rejects stride < 1") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizeStub(Multimodal.packPayload(docs, "text", "x"), stride = 0)
  }

  test("sampleSegment slices payload bytes") {
    val out = Multimodal.packPayload(docs, "text", "video/fake")
      .filter($"doc_id" === 1L)
      .select(Multimodal.sampleSegment(col("payload"), 3, 4).as("seg")).collect()
    new String(out.head.getAs[Array[Byte]]("seg"), "UTF-8") shouldBe "cdef"
  }

  test("embedStub loads the model once per PARTITION, not once per row") {
    val acc = spark.sparkContext.longAccumulator("embed-inits")
    val many = spark.range(0, 64).toDF("doc_id")
      .withColumn("text", concat(lit("payload-"), col("doc_id")))
      .repartition(4)
    val out = Multimodal.embedStub(
      Multimodal.packPayload(many, "text", "image/fake"),
      idCol = "doc_id", dim = 4, initCounter = Some(acc))
    out.count() shouldBe 64 * 4
    acc.value shouldBe 4L // one "model load" per partition for 64 rows
    // deterministic feature: len("payload-0")=9 -> 9*2654435761 % 1000
    val f0 = out.filter($"doc_id" === 0 && $"dim" === 0).collect().head.getLong(2)
    f0 shouldBe (9L * 2654435761L % 1000L)
  }

  test("frameManifest tiles the payload with a clamped final frame") {
    // 22 bytes, 8-byte frames → offsets 0,8,16 with lengths 8,8,6
    val docs = Seq((1L, "0123456789abcdefghijkl")).toDF("doc_id", "text")
    val out = Multimodal
      .frameManifest(Multimodal.packPayload(docs, "text", "video/fake"), 8)
      .orderBy("frame_no").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L)
    out.map(_.getLong(2)).toSeq shouldBe Seq(0L, 8L, 16L)
    out.map(_.getLong(3)).toSeq shouldBe Seq(8L, 8L, 6L)
    // content hash matches the byte slice it indexes
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("01234567".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    out.head.getString(4) shouldBe expected
  }
}
