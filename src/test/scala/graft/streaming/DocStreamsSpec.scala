package graft.streaming

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Streaming near-dup screen: bounded per-bucket state, watermark
  * retirement, dead-bucket cap, exactly-once pairs. */
class DocStreamsSpec extends SparkSpec {

  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog tonight"
  private val near2 = "the quick brown fox jumps over the lazy cat tonight"
  private val other = "completely different content with no shared phrasing at all"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def docsDf(rows: (Long, String, String)*): DataFrame =
    rows.map { case (id, t, w) => (id, t, ts(w)) }.toDF("doc_id", "text", "ts")

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("ds-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
  }

  private def runStream(src: String, name: String,
      maxBucket: Int = 1000, horizonSec: Long = 3600L): Seq[(Long, Long, Double)] = {
    val ckpt = Files.createTempDirectory("ds-ckpt").toString
    val q = DocStreams.nearDupPairs(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      maxBucket = maxBucket, horizonSec = horizonSec,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
  }

  test("cross-batch pair emits exactly once despite shared bands") {
    val src = Files.createTempDirectory("ds-x-src").toString
    writeBatch(docsDf((1L, near1, "2026-01-01 10:00:00"),
      (2L, other, "2026-01-01 10:00:30")), src, 1)
    // identical text: shares ALL bands with doc 1 — one pair, not four
    writeBatch(docsDf((5L, near1, "2026-01-01 10:05:00")), src, 2)
    val pairs = runStream(src, "ds_x")
    pairs.map(p => (p._1, p._2)) shouldBe Seq((5L, 1L))
    pairs.head._3 shouldBe 1.0
  }

  test("watermark retirement keeps within-horizon docs pairable") {
    val src = Files.createTempDirectory("ds-wm-src").toString
    writeBatch(docsDf((1L, near1, "2026-01-01 10:00:00")), src, 1)
    // sentinel advances the watermark to ~10:20 (delay 10 min); doc 1
    // stays in state because 10:00 >= 10:20 - horizon(1h)
    writeBatch(docsDf((2L, other, "2026-01-01 10:30:00")), src, 2)
    writeBatch(docsDf((3L, near2, "2026-01-01 10:25:00")), src, 3)
    val pairs = runStream(src, "ds_wm")
    pairs.map(p => (p._1, p._2)) should contain((3L, 1L))
  }

  test("beyond-horizon docs never pair") {
    val src = Files.createTempDirectory("ds-h-src").toString
    writeBatch(docsDf((1L, near1, "2026-01-01 10:00:00")), src, 1)
    writeBatch(docsDf((2L, near2, "2026-01-01 12:30:00")), src, 2) // 2.5h later
    runStream(src, "ds_h", horizonSec = 3600L) shouldBe empty
  }

  test("a bucket past maxBucket goes dead and stops emitting") {
    val src = Files.createTempDirectory("ds-cap-src").toString
    writeBatch(docsDf(
      (1L, near1, "2026-01-01 10:00:00"),
      (2L, near1, "2026-01-01 10:00:01"),
      (3L, near1, "2026-01-01 10:00:02")), src, 1)
    writeBatch(docsDf((4L, near1, "2026-01-01 10:00:03")), src, 2)
    val pairs = runStream(src, "ds_cap", maxBucket = 2)
    // pairs up to the cap trip (2-1, 3-1, 3-2), then silence: doc 4
    // arrives after the bucket died and emits nothing
    pairs.map(p => (p._1, p._2)) shouldBe Seq((2L, 1L), (3L, 1L), (3L, 2L))
  }

  test("in-order stream matches the batch path pair-for-pair") {
    val corpus = (0L until 24L).map(i =>
      (i, if (i % 5 == 0) near1 else if (i % 7 == 0) near2
          else s"unique content line number $i here",
        f"2026-01-01 10:${i / 60}%02d:${i % 60}%02d"))
    val src = Files.createTempDirectory("ds-par-src").toString
    corpus.grouped(8).zipWithIndex.foreach { case (g, i) =>
      writeBatch(docsDf(g: _*), src, i + 1)
    }
    val streamed = runStream(src, "ds_par")
    val batch = DocStreams.nearDupPairs(docsDf(corpus: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    streamed shouldBe batch
    streamed should not be empty
  }
}
