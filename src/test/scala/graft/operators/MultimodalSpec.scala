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

  test("decodeMeta reads real dims and pixel-mean luma from the golden PNG") {
    val df = Seq(Tuple1(1L)).toDF("doc_id").withColumn("payload", lit(goldenPng))
    val out = Multimodal.decodeMeta(df)
      .select(col("meta.byte_len"), col("meta.format"), col("meta.width"),
        col("meta.height"), col("meta.mean_luma"))
      .collect().head
    out.getLong(0) shouldBe goldenPng.length.toLong
    out.getString(1) shouldBe "image/png"
    out.getInt(2) shouldBe 4
    out.getInt(3) shouldBe 4
    val expected = (for (y <- 0 until 4; x <- 0 until 4)
      yield (x * 7 + y * 13 + 5) % 256).sum.toDouble / 16
    out.getDouble(4) shouldBe expected
  }

  // a 4x4 8-bit grayscale PNG written by an INDEPENDENT encoder (a
  // pure-python PNG writer: struct-packed IHDR/IDAT/IEND, zlib-deflated
  // scanlines), pixel(x,y) = (x*7 + y*13 + 5) % 256 — decoding it pins
  // javax.imageio against an external golden artifact, not a roundtrip
  // of its own output
  private val goldenPng: Array[Byte] = java.util.Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAQAAAAECAAAAACMmsGiAAAAHElEQVR4nGNg5RGWYhCSV" +
      "FBnkFfTNWHQMbZyBAAQVAIxItxaiwAAAABJRU5ErkJggg==")

  test("golden PNG fixture decodes to the exact known pixels") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(goldenPng))
    img.getWidth shouldBe 4
    img.getHeight shouldBe 4
    val r = img.getRaster
    for (y <- 0 until 4; x <- 0 until 4)
      withClue(s"pixel ($x,$y): ") {
        r.getSample(x, y, 0) shouldBe (x * 7 + y * 13 + 5) % 256
      }
  }

  test("resizePool on the golden PNG: real decode dims + exact 2x2 block means") {
    val df = Seq(Tuple1(9L)).toDF("doc_id").withColumn("payload", lit(goldenPng))
    val out = Multimodal.resizePool(df, pool = 2)
      .select("in_w", "in_h", "out_w", "out_h", "resized").collect().head
    out.getInt(0) shouldBe 4
    out.getInt(1) shouldBe 4
    out.getInt(2) shouldBe 2
    out.getInt(3) shouldBe 2
    def px(x: Int, y: Int) = (x * 7 + y * 13 + 5) % 256
    def blockMean(bx: Int, by: Int) =
      ((0 until 2).flatMap(dy => (0 until 2).map(dx =>
        px(bx * 2 + dx, by * 2 + dy))).sum / 4).toByte
    out.getAs[Array[Byte]]("resized") shouldBe
      Array(blockMean(0, 0), blockMean(1, 0), blockMean(0, 1), blockMean(1, 1))
  }

  test("encodePng→resizePool roundtrip: raster dims come from the decode") {
    val df = spark.range(0, 6).toDF("doc_id")
    val out = Multimodal
      .resizePool(Multimodal.encodePng(df, "doc_id",
        id => (8 + (id % 9).toInt, 8 + ((id * 7) % 9).toInt)), pool = 2)
      .select("doc_id", "in_w", "in_h", "out_w", "out_h", "resized")
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      r.getInt(1) shouldBe 8 + (id % 9).toInt
      r.getInt(2) shouldBe 8 + ((id * 7) % 9).toInt
      r.getInt(3) shouldBe r.getInt(1) / 2
      r.getInt(4) shouldBe r.getInt(2) / 2
      // every pooled byte equals the closed-form block mean
      val bytes = r.getAs[Array[Byte]]("resized")
      bytes.length shouldBe r.getInt(3) * r.getInt(4)
      for (by <- 0 until r.getInt(4); bx <- 0 until r.getInt(3)) {
        val s = (for (dy <- 0 until 2; dx <- 0 until 2)
          yield Multimodal.gray(id, bx * 2 + dx, by * 2 + dy)).sum
        (bytes(by * r.getInt(3) + bx) & 0xff) shouldBe s / 4
      }
    }
  }

  test("resizePool rejects pool < 1") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.resizePool(docs.withColumn("payload", lit(goldenPng)), pool = 0)
  }

  test("sampleSegment slices payload bytes") {
    val out = Multimodal.packPayload(docs, "text", "video/fake")
      .filter($"doc_id" === 1L)
      .select(Multimodal.sampleSegment(col("payload"), 3, 4).as("seg")).collect()
    new String(out.head.getAs[Array[Byte]]("seg"), "UTF-8") shouldBe "cdef"
  }

  test("embedPatches loads the model once per PARTITION, not once per row") {
    val acc = spark.sparkContext.longAccumulator("embed-inits")
    val many = spark.range(0, 64).toDF("doc_id").repartition(4)
    val out = Multimodal.embedPatches(
      Multimodal.encodePng(many, "doc_id", _ => (16, 16)),
      idCol = "doc_id", patch = 4, dim = 4, initCounter = Some(acc))
    out.count() shouldBe 64 * 4
    acc.value shouldBe 4L // one model load per partition for 64 rows
  }

  test("embedPatches features match the closed-form patch projection") {
    val out = Multimodal.embedPatches(
      Multimodal.encodePng(spark.range(0, 3).toDF("doc_id"), "doc_id", _ => (16, 16)),
      idCol = "doc_id").orderBy("doc_id", "dim").collect()
    for (r <- out) {
      val (id, j) = (r.getLong(0), r.getInt(1))
      val pms = (0 until 16).map { k =>
        (for (dy <- 0 until 4; dx <- 0 until 4)
          yield Multimodal.gray(id, (k % 4) * 4 + dx, (k / 4) * 4 + dy)).sum / 16.0
      }
      val expected = BigDecimal(
        (0 until 16).map(k => ((j * 5 + k * 3) % 7 - 3) * pms(k)).sum / 7.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      withClue(s"doc $id dim $j: ") { r.getDouble(2) shouldBe expected }
    }
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
