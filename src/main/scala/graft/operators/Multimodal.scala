package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as opaque `binary` columns with typed metadata structs —
  * the lakehouse-standard layout. The image kernels (decode, resize,
  * patch-embed) are REAL: `javax.imageio` (in the JDK) decodes actual
  * PNG bytes, dimensions come from the decoded raster, and pooled
  * pixels/features are computed from it. The Spark-side shape is what
  * matters at 100 TB and is shared by every kernel here: media blobs
  * stay columnar, are never collected to the driver, and per-partition
  * iterator-to-iterator decoding amortizes codec/model init exactly
  * like a `mapInPandas` batch UDF would.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** Wrap a text column as a binary payload with declared modality —
    * the ingest shape for media files landed from object storage. */
  def packPayload(df: DataFrame, payloadFrom: String, modality: String): DataFrame =
    df.withColumn("payload", col(payloadFrom).cast(BinaryType))
      .withColumn("modality", lit(modality))

  /** REAL image decode: run the PNG payload through `javax.imageio` and
    * append a `meta` struct — byte length, container format, width and
    * height from the DECODED raster, and mean luma averaged over the
    * actual pixels. Per-partition iteration (decoder scope amortized),
    * appending a `meta` struct; blobs never leave the executor. */
  def decodeMeta(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add(StructField("meta", MetaSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val decode = grayDecoder()
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val len = if (payload == null) 0L else payload.length.toLong
        val img = decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val g = grayPlane(img)
        var s = 0L
        var i = 0
        while (i < g.length) { s += g(i) & 0xff; i += 1 }
        val luma = s.toDouble / (w * h)
        Row.fromSeq(r.toSeq :+ Row(len, "image/png", w, h, luma))
      }
    }(enc)
  }

  /** Frame/segment sampling: slice `bytes` from offset `off` — the
    * columnar stand-in for "take frame k"; stays a pure expression. */
  def sampleSegment(payload: org.apache.spark.sql.Column, off: Int, len: Int) =
    substring(payload, off, len)

  /** Deterministic gray value for synthetic fixture images — the pixel
    * function the oracle reproduces in closed form, so a REAL decode of
    * a REAL PNG is still hash-checkable end-to-end: the engine round-
    * trips actual bytes through the codec while the oracle derives the
    * same pixels arithmetically; any decode defect diverges the hash. */
  private[operators] def gray(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Encode a REAL grayscale PNG per row via `javax.imageio` (in the
    * JDK — no new deps): pixel (x,y) = `gray(id, x, y)`, dims from
    * `dims(id)`. The fixture-image producer for the real decode/resize/
    * embed kernels below; per-partition iteration (one writer init per
    * partition), payload lands as an opaque binary column exactly like
    * media ingested from object storage. */
  def encodePng(
      df: DataFrame,
      idCol: String,
      dims: Long => (Int, Int)): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("modality", StringType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      val encode = pngEncoder()
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (w, h) = dims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        // a freshly constructed TYPE_BYTE_GRAY image is backed by one
        // row-major DataBufferByte with stride = width — fill it
        // directly instead of per-pixel setSample calls
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { data(y * w + x) = gray(id, x, y).toByte; x += 1 }
          y += 1
        }
        Row.fromSeq(r.toSeq :+ encode(img) :+ "image/png")
      }
    }(enc)
  }

  /** Per-PARTITION PNG decoder: call once inside `mapPartitions` (the
    * `ImageReader` is not serializable) and reuse the returned function
    * across every row of the partition. `ImageIO.read` re-runs reader
    * registry discovery and allocates a fresh reader per call — on the
    * decode-heavy paths (m02/m04/m05) that per-row setup was ~30 % of
    * the kernel; one reader per partition amortizes it away.
    * Fails FAST with a diagnosable message on null/undecodable bytes —
    * letting a bad payload surface as an NPE/IIOException deep in the
    * codec buries the offending row. */
  /** The image's gray plane as one row-major byte array (stride =
    * width): direct backing-array access when the layout already
    * matches (the TYPE_BYTE_GRAY form both our encoder and the PNG
    * decoder produce), one bulk `getSamples` extraction otherwise.
    * The hot kernels (m02 luma, m04 pooling, m05 patch embed) iterate
    * this array instead of calling `raster.getSample` per pixel —
    * the per-sample virtual dispatch + bounds checks were the actual
    * decode-path cost, not codec setup. */
  private def grayPlane(img: java.awt.image.BufferedImage): Array[Byte] = {
    import java.awt.image.{ComponentSampleModel, DataBufferByte}
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    raster.getDataBuffer match {
      case db: DataBufferByte if db.getNumBanks == 1 && db.getOffset == 0 &&
          raster.getSampleModelTranslateX == 0 &&
          raster.getSampleModelTranslateY == 0 &&
          (raster.getSampleModel match {
            case sm: ComponentSampleModel =>
              sm.getNumBands == 1 && sm.getPixelStride == 1 &&
                sm.getScanlineStride == w && db.getData.length == w * h
            case _ => false
          }) =>
        db.getData
      case _ =>
        val tmp = new Array[Int](w * h)
        raster.getSamples(0, 0, w, h, 0, tmp)
        // deeper-than-8-bit planes (16-bit gray PNG) must DOWNSCALE to
        // the high byte, not truncate to the low one — sample 256 is
        // near-black either way only under >>, while .toByte would wrap
        // it to 0 after full brightness at 255 (wrong luma/pool/embed)
        val shift = math.max(0, raster.getSampleModel.getSampleSize(0) - 8)
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < tmp.length) { out(i) = (tmp(i) >> shift).toByte; i += 1 }
        out
    }
  }

  /** Per-PARTITION PNG encoder — same amortization as [[grayDecoder]]
    * for the write side (`ImageIO.write` re-discovers a writer per
    * call). Call once inside `mapPartitions`. */
  private def pngEncoder(): java.awt.image.BufferedImage => Array[Byte] = {
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    require(writers.hasNext, "no PNG ImageWriter in this JDK")
    val writer = writers.next()
    img => {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try { writer.setOutput(ios); writer.write(img) } finally ios.close()
      bos.toByteArray
    }
  }

  private def grayDecoder(): Array[Byte] => java.awt.image.BufferedImage = {
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(readers.hasNext, "no PNG ImageReader in this JDK")
    val reader = readers.next()
    payload => {
      require(payload != null && payload.nonEmpty, "null/empty image payload")
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, true, true)
        try reader.read(0)
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalArgumentException(
              s"undecodable image payload (${payload.length} bytes, " +
                s"head=${payload.take(8).map("%02x".format(_)).mkString})", e)
        }
      } finally iis.close()
    }
  }

  /** REAL image resize: decode the PNG payload (actual raster, actual
    * width/height — no byte-stat faking) and average-pool non-overlapping
    * `pool`×`pool` blocks (floor semantics: partial edge blocks drop, the
    * standard strided-pool contract). Output per row: decoded `in_w`/
    * `in_h`, pooled `out_w`/`out_h`, and `resized` — the pooled image as
    * row-major bytes (block mean, integer floor).
    *
    * Scale shape unchanged from the stub it replaces: binary-in /
    * binary-out, per-partition iteration, blobs never leave the
    * executor, nothing shuffles. */
  def resizePool(df: DataFrame, pool: Int): DataFrame = {
    require(pool >= 1, s"pool must be >= 1, got $pool")
    val outSchema = df.schema
      .add(StructField("in_w", IntegerType))
      .add(StructField("in_h", IntegerType))
      .add(StructField("out_w", IntegerType))
      .add(StructField("out_h", IntegerType))
      .add(StructField("resized", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val decode = grayDecoder()
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val img = decode(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val g = grayPlane(img)
        val (ow, oh) = (w / pool, h / pool)
        val out = new Array[Byte](ow * oh)
        var by = 0
        while (by < oh) {
          var bx = 0
          while (bx < ow) {
            var s = 0
            var dy = 0
            while (dy < pool) {
              val base = (by * pool + dy) * w + bx * pool
              var dx = 0
              while (dx < pool) { s += g(base + dx) & 0xff; dx += 1 }
              dy += 1
            }
            out(by * ow + bx) = (s / (pool * pool)).toByte
            bx += 1
          }
          by += 1
        }
        Row.fromSeq(r.toSeq :+ w :+ h :+ ow :+ oh :+ out)
      }
    }(enc)
  }

  /** REAL patch-feature embedder — the batch-inference pass that turns
    * media payloads into feature vectors, in the shape real model
    * serving needs: the "model" (an integer projection matrix
    * `M(j)(k) = (j*5 + k*3) mod 7 - 3` over patch means) is constructed
    * ONCE per partition — the expensive step a per-row UDF would repeat
    * millions of times — and rows stream through it iterator-to-
    * iterator, batch-amortized, the Scala analog of a `mapInPandas`
    * embedding UDF. `initCounter`, when supplied, counts model
    * constructions so tests can PROVE the amortization (== number of
    * partitions, not rows).
    *
    * Per row: decode the PNG, mean-pool `patch`×`patch` patches (the
    * tokenizer step of a ViT-style encoder), project the patch-mean
    * vector through M, scale by 1/7. All arithmetic before the final
    * division is exact in doubles (patch means are multiples of
    * 1/patch², integer weights), so the feature is bit-reproducible in
    * the oracle. Output stays long-format (id, dim, feat) — joins/
    * aggregates downstream without array-type friction. */
  def embedPatches(
      df: DataFrame,
      idCol: String,
      patch: Int = 4,
      dim: Int = 4,
      initCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("dim", IntegerType),
      StructField("feat", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload")).mapPartitions { rows =>
      initCounter.foreach(_.add(1L)) // model load happens here, once
      // the per-partition "model": patch-count is image-dependent, so
      // weights are generated by (j, k) — materialized lazily per k and
      // memoized across the partition's rows
      val weights = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      def weightRow(k: Int): Array[Int] = {
        while (weights.length <= k)
          weights += Array.tabulate(dim) { j =>
            (j * 5 + weights.length * 3) % 7 - 3
          }
        weights(k)
      }
      val decode = grayDecoder()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val img = decode(r.getAs[Array[Byte]](1))
        val iw = img.getWidth
        val g = grayPlane(img)
        val (pw, ph) = (iw / patch, img.getHeight / patch)
        val acc = new Array[Double](dim)
        var k = 0
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            var s = 0
            var dy = 0
            while (dy < patch) {
              val base = (py * patch + dy) * iw + px * patch
              var dx = 0
              while (dx < patch) { s += g(base + dx) & 0xff; dx += 1 }
              dy += 1
            }
            val mean = s.toDouble / (patch * patch)
            val wr = weightRow(k)
            var j = 0
            while (j < dim) { acc(j) += wr(j) * mean; j += 1 }
            k += 1
            px += 1
          }
          py += 1
        }
        (0 until dim).iterator.map { j =>
          // HALF_UP: the same convention as Spark's round() and the
          // DuckDB oracle's round() — not rint's half-to-even
          Row(id, j, BigDecimal(acc(j) / 7.0)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }(enc)
  }

  /** Perceptual dHash of the DECODED raster — the image analog of the
    * text near-dup fingerprint: average-pool the gray plane onto a
    * 9-wide × 8-high grid (integer cell boundaries `cx = x*9/w`,
    * `cy = y*8/h`), then one bit per horizontally adjacent cell pair =
    * "left cell brighter". Integer-EXACT: cell means never materialize
    * as doubles — the gradient bit compares `sum_a*n_b > sum_b*n_a`,
    * so the hash is bit-reproducible in any engine from the same
    * pixels (the DuckDB oracle re-derives it from the closed-form
    * fixture raster; any codec/pooling defect diverges). Emitted as a
    * '0'/'1' string ordered by (cy, cx): images of equal perceptual
    * structure — not equal bytes — collide, which is the dedup signal
    * byte-hash dedup (d05) cannot see for re-encoded/jittered media.
    * Scale: one map-side pass, 16 bytes of hash per image; grouping
    * shuffles hashes only, never payloads. */
  def perceptualHash(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("phash", StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload")).mapPartitions { rows =>
      val decode = grayDecoder()
      rows.map { r =>
        val id = r.getLong(0)
        val img = decode(r.getAs[Array[Byte]](1))
        val (w, h) = (img.getWidth, img.getHeight)
        val g = grayPlane(img)
        val sums = Array.ofDim[Long](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val cx = x * 9 / w
            sums(cy)(cx) += g(y * w + x) & 0xff
            cnts(cy)(cx) += 1L
            x += 1
          }
          y += 1
        }
        val maxCx = (w - 1) * 9 / w
        val sb = new java.lang.StringBuilder(72)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < maxCx) {
            sb.append(
              if (sums(cy)(cx) * cnts(cy)(cx + 1) >
                  sums(cy)(cx + 1) * cnts(cy)(cx)) '1' else '0')
            cx += 1
          }
          cy += 1
        }
        Row(id, sb.toString)
      }
    }(enc)
  }

  /** Deterministic PCM16 sample for synthetic fixture audio — the
    * closed-form amplitude the oracle reproduces arithmetically while
    * the engine round-trips REAL RIFF/WAVE bytes through a REAL chunk
    * parser; any header/endianness/offset defect diverges the hash. */
  private[operators] def amp(id: Long, i: Int): Int =
    ((id * 31L + i * 17L) % 2048L - 1024L).toInt

  /** Encode a REAL RIFF/WAVE (PCM16 mono, little-endian) file per row:
    * sample i = `amp(id, i)`, rate/length from the supplied functions.
    * Every third id gets an extra LIST/INFO chunk BEFORE fmt, so a
    * consumer that assumes the canonical 44-byte layout (instead of
    * walking chunks) breaks on real-world-shaped files. Payload lands
    * as an opaque binary column, like audio ingested from object
    * storage; per-partition iteration, blobs never hit the driver. */
  def encodeWav(
      df: DataFrame,
      idCol: String,
      sampleRate: Long => Int,
      nSamples: Long => Int): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("modality", StringType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val (rate, n) = (sampleRate(id), nSamples(id))
        val listChunk = if (id % 3 == 0) 12 else 0 // "LIST"+size+"INFO"
        val dataBytes = n * 2
        val riffSize = 4 + listChunk + 24 + 8 + dataBytes
        val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
          .put("WAVE".getBytes("US-ASCII"))
        if (listChunk > 0)
          bb.put("LIST".getBytes("US-ASCII")).putInt(4)
            .put("INFO".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(rate).putInt(rate * 2) // byte rate
          .putShort(2).putShort(16) // block align, bits
        bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
        var i = 0
        while (i < n) { bb.putShort(amp(id, i).toShort); i += 1 }
        Row.fromSeq(r.toSeq :+ bb.array() :+ "audio/wav")
      }
    }(enc)
  }

  /** REAL audio decode + rate-normalize + frame energy — the feature
    * pass a speech/audio curation pipeline runs before any model: parse
    * the RIFF container (genuine chunk walk: LIST/fmt/data in any
    * order), read the ACTUAL sample rate and PCM16 little-endian
    * samples, decimate to `targetRate` (integer factor — files already
    * at target pass through), then emit one row per full `frame`-sample
    * window with its sample count and summed absolute amplitude
    * (integer-exact, so the oracle can hash it). Partial tail frames
    * drop — the standard fixed-window contract.
    *
    * Scale shape: binary-in / long-rows-out, per-partition streaming,
    * no shuffle; the explode happens map-side like frameManifest. */
  def audioFrames(
      df: DataFrame,
      idCol: String,
      targetRate: Int,
      frame: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_no", LongType),
      StructField("src_rate", LongType),
      StructField("n", LongType),
      StructField("sum_abs", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(): String = {
          val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
        }
        require(fourcc() == "RIFF", s"not a RIFF file for id=$id")
        bb.getInt // riff size
        require(fourcc() == "WAVE", s"not a WAVE file for id=$id")
        var rate = -1
        var dataOff = -1
        var dataLen = -1
        while (bb.remaining() >= 8 && (rate < 0 || dataOff < 0)) {
          val id4 = fourcc()
          val sz = bb.getInt
          id4 match {
            case "fmt " =>
              val p = bb.position()
              require(bb.getShort == 1, "PCM only")
              require(bb.getShort == 1, "mono only")
              rate = bb.getInt
              bb.position(p + sz + (sz & 1))
            case "data" =>
              dataOff = bb.position(); dataLen = sz
              bb.position(bb.position() + sz + (sz & 1))
            case _ => bb.position(bb.position() + sz + (sz & 1))
          }
        }
        require(rate > 0 && dataOff >= 0, s"missing fmt/data chunk for id=$id")
        require(rate % targetRate == 0, s"rate $rate not a multiple of $targetRate")
        val dec = rate / targetRate
        val nSamp = dataLen / 2
        val nDecim = (nSamp + dec - 1) / dec
        val fullFrames = nDecim / frame
        (0 until fullFrames).iterator.map { f =>
          var sum = 0L
          var j = f * frame
          val end = (f + 1) * frame
          while (j < end) {
            sum += math.abs(bb.getShort(dataOff + j * dec * 2).toLong)
            j += 1
          }
          Row(id, f.toLong, rate.toLong, frame.toLong, sum)
        }
      }
    }(enc)
  }

  /** Deterministic gray value for synthetic VIDEO frames (frame index
    * shifts the image-series pixel function). */
  private[operators] def pix(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31L + x * 7L + y * 13L + f * 17L) % 256L).toInt

  /** Encode a REAL uncompressed AVI per row: RIFF/'AVI ' container with
    * a proper hdrl (avih + strl/strh + strf BITMAPINFOHEADER) and a
    * movi LIST of '00db' frames — bottom-up BI_RGB DIB rows, 4-byte
    * padded, pixel (x,y) of frame f = gray `pix(id,f,x,y)` in all three
    * channels. This is the standard uncompressed-AVI layout, so the
    * decoder below must do everything a real video demuxer does for
    * this container: walk nested LISTs, read the stream format, and
    * interpret raw DIB frame payloads. */
  def encodeAvi(
      df: DataFrame,
      idCol: String,
      frames: Int,
      w: Int,
      h: Int): DataFrame = {
    val outSchema = df.schema
      .add(StructField("payload", BinaryType))
      .add(StructField("modality", StringType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val rowBytes = (w * 3 + 3) / 4 * 4 // BI_RGB rows pad to 4 bytes
        val frameBytes = rowBytes * h
        val moviSz = 4 + frames * (8 + frameBytes)
        val hdrlSz = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
        val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz)
        val bb = java.nio.ByteBuffer.allocate(8 + riffSz)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def cc(s: String) = bb.put(s.getBytes("US-ASCII"))
        cc("RIFF"); bb.putInt(riffSz); cc("AVI ")
        cc("LIST"); bb.putInt(hdrlSz); cc("hdrl")
        cc("avih"); bb.putInt(56)
        bb.putInt(40000).putInt(frameBytes * 25).putInt(0).putInt(0)
        bb.putInt(frames).putInt(0).putInt(1).putInt(frameBytes)
        bb.putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
        cc("LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); cc("strl")
        cc("strh"); bb.putInt(56)
        cc("vids"); cc("DIB "); bb.putInt(0).putShort(0).putShort(0)
        bb.putInt(0).putInt(1).putInt(25).putInt(0).putInt(frames)
        bb.putInt(frameBytes).putInt(-1).putInt(0)
        bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
        cc("strf"); bb.putInt(40)
        bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        bb.putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
        cc("LIST"); bb.putInt(moviSz); cc("movi")
        var f = 0
        while (f < frames) {
          cc("00db"); bb.putInt(frameBytes)
          var yy = h - 1 // DIB rows are BOTTOM-UP
          while (yy >= 0) {
            var xx = 0
            while (xx < w) {
              val g = pix(id, f, xx, yy).toByte
              bb.put(g).put(g).put(g) // B, G, R
              xx += 1
            }
            var pad = rowBytes - w * 3
            while (pad > 0) { bb.put(0.toByte); pad -= 1 }
            yy -= 1
          }
          f += 1
        }
        Row.fromSeq(r.toSeq :+ bb.array() :+ "video/avi")
      }
    }(enc)
  }

  /** REAL video decode: demux the AVI container — walk the RIFF tree
    * into hdrl for the strf BITMAPINFOHEADER (actual width/height/bpp),
    * then into movi for the '00db' frame chunks — and read each frame's
    * bottom-up padded DIB rows. Output per frame: dims from the PARSED
    * header and a position-weighted pixel sum (weight x + 2y), which is
    * integer-exact AND orientation-sensitive: a top-down/bottom-up or
    * padding mistake diverges the value, not just the row order. */
  def videoFrameStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_no", LongType),
      StructField("w", LongType),
      StructField("h", LongType),
      StructField("wsum", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(): String = {
          val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
        }
        require(fourcc() == "RIFF", s"not a RIFF file for id=$id")
        bb.getInt
        require(fourcc() == "AVI ", s"not an AVI file for id=$id")
        var w = -1
        var h = -1
        val frames = Seq.newBuilder[(Int, Int)] // (offset, length)
        def walk(end: Int): Unit =
          while (bb.position() + 8 <= end) {
            val id4 = fourcc()
            val sz = bb.getInt
            val next = bb.position() + sz + (sz & 1)
            id4 match {
              case "LIST" => fourcc(); walk(next) // descend, past the list type
              case "strf" =>
                val p = bb.position()
                bb.getInt // biSize
                w = bb.getInt; h = bb.getInt
                bb.getShort // planes
                require(bb.getShort == 24, "BI_RGB 24bpp only")
                bb.position(p)
              case "00db" | "00dc" => frames += ((bb.position(), sz))
              case _ => ()
            }
            bb.position(next)
          }
        walk(b.length)
        require(w > 0 && h > 0, s"missing strf header for id=$id")
        val rowBytes = (w * 3 + 3) / 4 * 4
        frames.result().iterator.zipWithIndex.map { case ((off, len), f) =>
          require(len == rowBytes * h, s"frame $f size $len != ${rowBytes * h}")
          var sum = 0L
          var yy = 0
          while (yy < h) {
            // row yy is stored at bottom-up index (h - 1 - yy)
            val rowOff = off + (h - 1 - yy) * rowBytes
            var xx = 0
            while (xx < w) {
              val g = bb.get(rowOff + xx * 3) & 0xff // blue channel = gray
              sum += g.toLong * (xx + 2 * yy)
              xx += 1
            }
            yy += 1
          }
          Row(id, f.toLong, w.toLong, h.toLong, sum)
        }
      }
    }(enc)
  }

  /** Frame-sampling manifest for opaque video/audio payloads: every
    * `frameBytes`-wide slice becomes a manifest row (frame number, byte
    * offset, actual length, content md5) — the work list a downstream
    * decoder fleet consumes, built WITHOUT decoding anything.
    *
    * Scale shape: pure map-side `sequence`+`explode` over the payload
    * length — the manifest explodes rows but never copies the payload
    * more than once per frame slice, and nothing shuffles; output
    * files partition naturally by the scan. */
  def frameManifest(df: DataFrame, frameBytes: Int, idCol: String = "doc_id"): DataFrame =
    df
      .withColumn("__len", length(col("payload")))
      .withColumn("frame_no",
        explode(sequence(lit(0), floor((col("__len") - 1) / frameBytes).cast("int"))))
      .select(
        col(idCol),
        col("frame_no").cast("long").as("frame_no"),
        (col("frame_no") * frameBytes).cast("long").as("byte_offset"),
        least(lit(frameBytes), col("__len") - col("frame_no") * frameBytes)
          .cast("long").as("frame_len"),
        md5(col("payload").substr(col("frame_no") * frameBytes + 1, lit(frameBytes)))
          .as("frame_md5"))
}
