package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as opaque `binary` columns with typed metadata structs —
  * the lakehouse-standard layout. Real decode libraries are not in this
  * build, so `decodeStub` is a clearly-marked deterministic fake; the
  * Spark-side plumbing (schema, partition-preserving batch iteration,
  * metadata struct shape) is real and is what matters at 100 TB: media
  * blobs stay columnar, are never collected to the driver, and
  * per-partition decoding amortizes codec init exactly like an
  * `mapInPandas` batch UDF would.
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

  /** STUB DECODER — deterministic fake standing in for image decode.
    * Derives "dimensions" and "mean luma" from payload bytes so tests are
    * reproducible. Replace the body with a real codec (e.g. javax.imageio
    * / ffmpeg bindings) in production; the iteration shape stays.
    *
    * Runs per-partition over an iterator (one decoder instance per
    * partition, no per-row setup cost), appending a `meta` struct. */
  def decodeStub(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add(StructField("meta", MetaSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition "codec" init would go here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val len = if (payload == null) 0L else payload.length.toLong
        // ??? real decode goes here; fake: square-ish dims + byte mean
        val width = math.max(1, math.sqrt(len.toDouble).toInt)
        val height = math.max(1, (len / math.max(1, width)).toInt)
        val luma =
          if (len == 0) 0.0
          else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / len
        Row.fromSeq(r.toSeq :+ Row(len, "fake/raw", width, height, luma))
      }
    }(enc)
  }

  /** Frame/segment sampling: slice `bytes` from offset `off` — the
    * columnar stand-in for "take frame k"; stays a pure expression. */
  def sampleSegment(payload: org.apache.spark.sql.Column, off: Int, len: Int) =
    substring(payload, off, len)

  /** STUB RESIZE — deterministic fake standing in for image resize /
    * audio downsample: keeps every `stride`-th payload byte. A real
    * kernel (scaling filter, resampler) swaps in here; the contract that
    * matters at scale stays — per-partition iteration, binary-in /
    * binary-out, blobs never leave the executor. */
  def resizeStub(df: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = df.schema.add(StructField("resized", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition resample-kernel init would go here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val out =
          if (payload == null) Array.empty[Byte]
          else Array.range(0, payload.length, stride).map(payload(_))
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** STUB EMBEDDER — the batch-inference pass that turns media payloads
    * into feature vectors, in the shape real model serving needs: the
    * "model" is constructed ONCE per partition (the expensive step a
    * per-row UDF would repeat millions of times) and rows stream
    * through it iterator-to-iterator, batch-amortized — the Scala
    * analog of a `mapInPandas` embedding UDF. `initCounter`, when
    * supplied, counts model constructions so tests can PROVE the
    * amortization (== number of partitions, not rows).
    *
    * Output is long-format (id, dim, feat) — joins/aggregates downstream
    * without array-type friction. The fake feature is a deterministic
    * byte-length hash; a real encoder swaps in without changing the
    * plumbing. */
  def embedStub(
      df: DataFrame,
      idCol: String,
      dim: Int = 4,
      initCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("dim", IntegerType),
      StructField("feat", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col("payload")).mapPartitions { rows =>
      initCounter.foreach(_.add(1L)) // "model load" happens here, once
      val model = new Object // ??? real encoder session goes here
      require(model != null)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val len = if (payload == null) 0L else payload.length.toLong
        val base = len * 2654435761L % 1000L
        (0 until dim).iterator.map(j =>
          Row(id, j, (base + j) % 1000L))
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
