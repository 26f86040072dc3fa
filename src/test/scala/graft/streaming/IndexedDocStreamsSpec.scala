package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.LshIndex
import graft.store.LakeCatalog

/** The index-backed streaming near-dup screen: one signature space
  * shared across batches and the batch path, exactly-once under
  * replays, and crash-window repair without duplicate token sets. */
class IndexedDocStreamsSpec extends SparkSpec {

  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog tonight"
  private val near2 = "the quick brown fox jumps over the lazy cat tonight"
  private val other = "completely different content with no shared phrasing at all"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def freshIndex(boot: DataFrame): LakeCatalog = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("idxstream").toString)
    cat.createDatabase("db")
    LshIndex.build(cat, "db", "nd", boot)
    cat
  }

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("idx-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
    ()
  }

  private def readPairs(out: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(out).select("doc_a", "doc_b", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.get(2).toString.toLong)).toSeq.sorted

  test("stream micro-batches probe and extend ONE persistent signature space") {
    val cat = freshIndex(docs((1L, near1), (2L, other)))
    val src = Files.createTempDirectory("idx-src").toString
    writeBatch(docs((10L, near2)), src, 1)
    writeBatch(docs((20L, near1)), src, 2)
    val out = Files.createTempDirectory("idx-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("idx-ckpt").toString
    val q = IndexedDocStreams.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      cat, "db", "nd", out, ckpt)
    q.awaitTermination()
    // batch 0: doc 10 (near2) pairs with BOOTSTRAP doc 1 (near1).
    // batch 1: doc 20 (near1) pairs with doc 1 (identical) AND with
    // doc 10 — which only batch 0 indexed: the stream extends the same
    // signature space it probes.
    readPairs(out) shouldBe Seq((10L, 1L, 0L), (20L, 1L, 1L), (20L, 10L, 1L))
    val exact = spark.read.parquet(out)
      .filter($"doc_a" === 20L && $"doc_b" === 1L)
      .select("jaccard").head().getDouble(0)
    exact shouldBe 1.0
  }

  test("in-stream interval compaction folds the index without changing the screen") {
    val cat = freshIndex(docs((1L, near1), (2L, other)))
    val src = Files.createTempDirectory("idx-src").toString
    writeBatch(docs((10L, near2)), src, 1)
    writeBatch(docs((20L, near1)), src, 2)
    writeBatch(docs((30L, near2)), src, 3)
    val out = Files.createTempDirectory("idx-out").toString + "/pairs"
    val ckpt = Files.createTempDirectory("idx-ckpt").toString
    val q = IndexedDocStreams.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      cat, "db", "nd", out, ckpt, compactEveryBatches = 1)
    q.awaitTermination()
    // identical pair semantics to the uncompacted stream: each batch
    // still pairs against the bootstrap AND every earlier batch
    readPairs(out) shouldBe Seq(
      (10L, 1L, 0L),
      (20L, 1L, 1L), (20L, 10L, 1L),
      (30L, 1L, 2L), (30L, 10L, 2L), (30L, 20L, 2L))
    // folds ran after batches 1 and 2: the five append/build
    // generations collapse to one entry per table
    cat.table("db.nd_bands").currentSnapshot.get.entries.size shouldBe 1
    cat.table("db.nd_toks").currentSnapshot.get.entries.size shouldBe 1
    // the replay high-water mark survived the folds
    LshIndex.appendBatch(cat, "db", "nd", docs((30L, near2)), 2L) shouldBe false
  }

  test("a replayed batch is a full no-op on both sinks") {
    val cat = freshIndex(docs((1L, near1)))
    val out = Files.createTempDirectory("idx-out2").toString + "/pairs"
    IndexedDocStreams.screenBatch(cat, "db", "nd", docs((10L, near2)), 1L, out)
    val bandsT = cat.table("db.nd_bands")
    val toksT = cat.table("db.nd_toks")
    val (bv, tv) = (bandsT.currentSnapshot.get.version, toksT.currentSnapshot.get.version)
    val before = readPairs(out)
    // the foreachBatch re-fires with the same id (post-crash replay
    // after a completed batch): nothing may change anywhere
    IndexedDocStreams.screenBatch(cat, "db", "nd", docs((10L, near2)), 1L, out)
    bandsT.currentSnapshot.get.version shouldBe bv
    toksT.currentSnapshot.get.version shouldBe tv
    readPairs(out) shouldBe before
    before shouldBe Seq((10L, 1L, 1L))
  }

  test("crash between the toks and bands commits replays to exactly-once state") {
    val cat = freshIndex(docs((1L, other)))
    val out = Files.createTempDirectory("idx-out3").toString + "/pairs"
    IndexedDocStreams.screenBatch(cat, "db", "nd", docs((10L, near1)), 1L, out)
    val bandsT = cat.table("db.nd_bands")
    val toksT = cat.table("db.nd_toks")
    val bandsPreBatch2 = bandsT.currentSnapshot.get.version
    IndexedDocStreams.screenBatch(cat, "db", "nd", docs((20L, near2)), 2L, out)
    val toksAfter = toksT.read.count()
    // simulate the crash window: batch 2's toks landed, its bands
    // commit did not (bands table rewinds, restoring the batch-1 guard)
    bandsT.rollbackTo(bandsPreBatch2)
    bandsT.properties(LshIndex.BatchProp) shouldBe "1"
    // replay of batch 2: must re-append ONLY the bands — a duplicate
    // toks append would corrupt every later Jaccard verification
    IndexedDocStreams.screenBatch(cat, "db", "nd", docs((20L, near2)), 2L, out)
    toksT.read.count() shouldBe toksAfter
    bandsT.properties(LshIndex.BatchProp) shouldBe "2"
    // the repaired index serves probes over batch 2's docs
    val probe = LshIndex.query(cat, "db", "nd", docs((30L, near2)))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    probe should contain ((30L, 20L))
  }
}
