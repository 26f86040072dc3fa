package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.IvfIndex
import graft.store.LakeCatalog

/** Streaming vector ingest on the persistent IVF index: probe-then-
  * append per micro-batch, one shared index, replay no-op. */
class IndexedVecStreamsSpec extends SparkSpec {

  import spark.implicits._

  // two labeled clusters on orthogonal axes; vec_id encodes arrival
  private def vec(id: Long, axis: Int, mag: Float): (Long, Array[Float], String) =
    (id, Array.tabulate(4)(j => if (j == axis) mag else 0f), axis.toString)

  private def df(rows: (Long, Array[Float], String)*): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", StringType)))

  private def boot = df(
    vec(1L, 0, 10f), vec(2L, 0, 9f), vec(3L, 1, 10f), vec(4L, 1, 9f))

  private def freshIndex(): LakeCatalog = {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("vecstream").toString)
    cat.createDatabase("db")
    IvfIndex.build(cat, "db", "ann", boot)
    cat
  }

  private def writeBatch(d: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("vec-batch").toFile
    d.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
    ()
  }

  test("stream batches probe and extend ONE persistent index") {
    val cat = freshIndex()
    val src = Files.createTempDirectory("vec-src").toString
    writeBatch(df(vec(10L, 0, 8f)), src, 1)
    writeBatch(df(vec(20L, 0, 7f)), src, 2)
    val out = Files.createTempDirectory("vec-out").toString + "/nn"
    val ckpt = Files.createTempDirectory("vec-ckpt").toString
    val q = IndexedVecStreams.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      cat, "db", "ann", out, ckpt, k = 3, nprobe = 1)
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .select("query_id", "neighbor_id", "batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2).toString.toLong)).toSeq
    // batch 0: vec 10 (axis 0) finds only the bootstrap axis-0 vectors
    rows.filter(_._1 == 10L).map(_._2).toSet shouldBe Set(1L, 2L)
    // batch 1: vec 20 sees bootstrap AND vec 10 — the one-index claim
    rows.filter(_._1 == 20L).map(_._2).toSet shouldBe Set(1L, 2L, 10L)
    rows.filter(_._1 == 20L).map(_._3).distinct shouldBe Seq(1L)
  }

  test("in-stream interval compaction folds the cells table, screen unchanged") {
    val cat = freshIndex()
    val src = Files.createTempDirectory("vec-src3").toString
    writeBatch(df(vec(10L, 0, 8f)), src, 1)
    writeBatch(df(vec(20L, 1, 8f)), src, 2)
    writeBatch(df(vec(30L, 0, 7f)), src, 3)
    val out = Files.createTempDirectory("vec-out3").toString + "/nn"
    val ckpt = Files.createTempDirectory("vec-ckpt3").toString
    val q = IndexedVecStreams.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      cat, "db", "ann", out, ckpt, k = 3, nprobe = 1, compactEveryBatches = 1)
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // same screen semantics as the uncompacted stream
    rows.filter(_._1 == 10L).map(_._2).toSet shouldBe Set(1L, 2L)
    rows.filter(_._1 == 20L).map(_._2).toSet shouldBe Set(3L, 4L)
    rows.filter(_._1 == 30L).map(_._2).toSet shouldBe Set(1L, 2L, 10L)
    // folds ran after batches 1 and 2: entries collapse to one per
    // occupied cell (build + three appends would otherwise stack one
    // entry per touched leaf per commit)
    val cells = cat.table("db.ann_cells")
    val occupied = cells.read.select("cell").distinct().count()
    cells.currentSnapshot.get.entries.size.toLong shouldBe occupied
    // the replay high-water mark survived the folds
    IvfIndex.appendBatch(cat, "db", "ann", df(vec(30L, 0, 7f)), 2L) shouldBe false
  }

  test("a replayed batch is a no-op on the cells commit and the output") {
    val cat = freshIndex()
    val out = Files.createTempDirectory("vec-out2").toString + "/nn"
    IndexedVecStreams.screenBatch(cat, "db", "ann", df(vec(10L, 0, 8f)), 1L, out,
      k = 3, nprobe = 1)
    val cells = cat.table("db.ann_cells")
    val v = cells.currentSnapshot.get.version
    val before = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    IndexedVecStreams.screenBatch(cat, "db", "ann", df(vec(10L, 0, 8f)), 1L, out,
      k = 3, nprobe = 1)
    cells.currentSnapshot.get.version shouldBe v
    cells.properties(IvfIndex.BatchProp) shouldBe "1"
    spark.read.parquet(out).collect().map(_.toString).sorted.toSeq shouldBe before
  }
}
