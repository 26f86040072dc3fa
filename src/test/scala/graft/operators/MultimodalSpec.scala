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

  test("encodeWav writes a parseable RIFF container (with and without LIST chunk)") {
    // id 6: LIST chunk present (6 % 3 == 0); id 7: canonical layout
    val wav = Multimodal.encodeWav(
      Seq(6L, 7L).toDF("doc_id"), "doc_id",
      sampleRate = _ => 8000, nSamples = _ => 120)
    val rows = wav.orderBy("doc_id").collect()
    val b6 = rows(0).getAs[Array[Byte]]("payload")
    val b7 = rows(1).getAs[Array[Byte]]("payload")
    new String(b6.take(4), "US-ASCII") shouldBe "RIFF"
    new String(b6.slice(8, 12), "US-ASCII") shouldBe "WAVE"
    new String(b6.slice(12, 16), "US-ASCII") shouldBe "LIST"
    new String(b7.slice(12, 16), "US-ASCII") shouldBe "fmt "
    b6.length shouldBe b7.length + 12
  }

  test("audioFrames: real chunk walk, decimation, and integer-exact frame sums") {
    // 8 kHz file passes through, 16 kHz decimates by 2; both produce
    // 120 decimated samples = 2 full frames of 60 (partial tail absent)
    val wav = Multimodal.encodeWav(
      Seq(2L, 3L).toDF("doc_id"), "doc_id",
      sampleRate = id => if (id % 2 == 0) 8000 else 16000,
      nSamples = id => if (id % 2 == 0) 120 else 240)
    val out = Multimodal.audioFrames(wav, "doc_id", targetRate = 8000, frame = 60)
      .orderBy("doc_id", "frame_no").collect()
    out.length shouldBe 4
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq shouldBe
      Seq((2L, 0L, 8000L, 60L), (2L, 1L, 8000L, 60L),
        (3L, 0L, 16000L, 60L), (3L, 1L, 16000L, 60L))
    // closed-form check: decimated sample j of id 3 is original i = 2j
    def expectedSum(id: Long, f: Int, dec: Int): Long =
      (f * 60 until (f + 1) * 60).map(j => math.abs(
        (id * 31L + (j * dec) * 17L) % 2048L - 1024L)).sum
    out.map(_.getLong(4)).toSeq shouldBe Seq(
      expectedSum(2L, 0, 1), expectedSum(2L, 1, 1),
      expectedSum(3L, 0, 2), expectedSum(3L, 1, 2))
  }

  test("audioFrames drops the partial tail frame") {
    val wav = Multimodal.encodeWav(
      Seq(4L).toDF("doc_id"), "doc_id", _ => 8000, _ => 149)
    Multimodal.audioFrames(wav, "doc_id", targetRate = 8000, frame = 60)
      .count() shouldBe 2 // 149 samples → 2 full frames, 29 dropped
  }

  test("encodeAvi writes a well-formed container; videoFrameStats demuxes it exactly") {
    val avi = Multimodal.encodeAvi(Seq(7L).toDF("doc_id"), "doc_id",
      frames = 2, w = 15, h = 12)
    val payload = avi.head.getAs[Array[Byte]]("payload")
    new String(payload.take(4), "US-ASCII") shouldBe "RIFF"
    new String(payload.slice(8, 12), "US-ASCII") shouldBe "AVI "
    new String(payload.slice(12, 16), "US-ASCII") shouldBe "LIST"
    val out = Multimodal.videoFrameStats(avi, "doc_id")
      .orderBy("frame_no").collect()
    out.length shouldBe 2
    // dims come from the PARSED strf header
    out.map(r => (r.getLong(2), r.getLong(3))).toSet shouldBe Set((15L, 12L))
    // weighted sums match the closed form — any orientation (bottom-up
    // DIB), padding (15*3=45 → 48 byte rows), or offset error diverges
    def expected(f: Int): Long =
      (for (x <- 0 until 15; y <- 0 until 12)
        yield Multimodal.pix(7L, f, x, y).toLong * (x + 2 * y)).sum
    out.map(_.getLong(4)).toSeq shouldBe Seq(expected(0), expected(1))
  }

  test("videoFrameStats rejects a payload without an strf header") {
    // a RIFF/AVI shell with no streams: parser must fail fast, not
    // guess dimensions
    val bb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4).put("AVI ".getBytes("US-ASCII"))
    val junk = Seq((5L, bb.array())).toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFrameStats(junk, "doc_id").collect()
    }
    ex.getMessage should include("strf")
  }

  test("audioFrames rejects a non-RIFF payload") {
    val junk = Seq((5L, "not a wav".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.audioFrames(junk, "doc_id", 8000, 60).collect()
    }
    ex.getMessage should include("RIFF")
  }

  test("perceptualHash matches the closed-form derivation bit for bit") {
    // the full path — REAL PNG encode, REAL decode, pooling, integer
    // gradient bits — must equal a direct recomputation from the pixel
    // formula, for every dims class (w,h vary with id)
    val df = Multimodal.encodePng(
      spark.range(0, 20).toDF("doc_id"), "doc_id",
      id => (8 + (id % 9).toInt, 8 + ((id * 7) % 9).toInt))
    val got = Multimodal.perceptualHash(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 20L).foreach { id =>
      val (w, h) = (8 + (id % 9).toInt, 8 + ((id * 7) % 9).toInt)
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        sums(y * 8 / h)(x * 9 / w) += Multimodal.gray(id, x, y)
        cnts(y * 8 / h)(x * 9 / w) += 1
      }
      val maxCx = (w - 1) * 9 / w
      val exp = (for (cy <- 0 until 8; cx <- 0 until maxCx) yield
        if (sums(cy)(cx) * cnts(cy)(cx + 1) >
            sums(cy)(cx + 1) * cnts(cy)(cx)) '1' else '0').mkString
      got(id) shouldBe exp
    }
    // images sharing perceptual structure collide regardless of bytes:
    // same dims class + same gradient signs → grouping is the signal
    got.values.toSeq.distinct.size should be < 20
  }
}
