package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Rollup
import graft.store.LakeCatalog

/** The production maintenance loop end-to-end: a STREAM appends into a
  * LakeTable source via foreachBatch, and every micro-batch triggers an
  * incremental `Rollup.refresh` — the rollup table tracks the stream
  * with O(increment) work per batch, and the final totals equal a full
  * recompute. Exercises the append → changes() → delta-merge →
  * watermark chain under real micro-batch cadence, including replay
  * idempotence (the refresh watermark rides the merge commit, so a
  * re-delivered batch folds zero new versions). */
class StreamingRollupSpec extends SparkSpec {

  import spark.implicits._

  private def batchDf(rows: (Long, String, String)*): DataFrame =
    rows.map { case (id, k, v) => (id, k, v) }.toDF("id", "k", "v")
      .select($"id", $"k", $"v".cast("decimal(10,2)").as("v"))

  private def writeBatch(df: DataFrame, dir: String, seq: Int): Unit = {
    val tmp = Files.createTempDirectory("sr-batch").toFile
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new File(dir, f"batch-$seq%03d.parquet")
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    dest.setLastModified(1700000000000L + seq * 60000L)
  }

  test("a streamed source keeps its rollup current via per-batch incremental refresh") {
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sr-wh").toString)
    cat.createDatabase("db")
    val srcTable = cat.table("db.stream_src")
    val rollup = cat.table("db.stream_agg")
    srcTable.createOrReplace(batchDf((0L, "a", "1.00")))
    Rollup.refresh(srcTable, rollup, Seq("k"), Seq("v"))

    val src = Files.createTempDirectory("sr-src").toString
    writeBatch(batchDf((1L, "a", "2.00"), (2L, "b", "3.00")), src, 1)
    writeBatch(batchDf((3L, "b", "4.00"), (4L, "c", "5.00")), src, 2)
    writeBatch(batchDf((5L, "a", "6.00")), src, 3)

    var refreshes = 0
    val q = spark.readStream
      .schema(srcTable.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        srcTable.append(batch)
        if (Rollup.refresh(srcTable, rollup, Seq("k"), Seq("v")) > 0) refreshes += 1
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("sr-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    refreshes shouldBe 3 // one incremental fold per micro-batch
    // the maintained totals equal a full recompute of the final source
    val maintained = rollup.read.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    maintained shouldBe Seq(
      ("a", 3L, "9.00"), ("b", 2L, "7.00"), ("c", 1L, "5.00"))
    // replaying the last refresh is a no-op: the watermark rode the merge
    Rollup.refresh(srcTable, rollup, Seq("k"), Seq("v")) shouldBe 0L
  }

  test("a CDC UPSERT stream into a MoR target keeps its rollup current (signed folds)") {
    // the c33 machinery at the streaming seam: micro-batches carry
    // upserts (op 'u' updates an existing key, 'c' inserts) and
    // deletes (op 'd'); the target applies them as MoR commits —
    // O(batch), no rewrite — and every batch triggers one incremental
    // refresh that folds the NET change (post-images minus masked
    // pre-images). Totals must track a full recompute after each batch.
    val cat = new LakeCatalog(spark, Files.createTempDirectory("sr-mor-wh").toString)
    cat.createDatabase("db")
    val srcTable = cat.table("db.cdc_target")
    val rollup = cat.table("db.cdc_agg")
    srcTable.createOrReplace(batchDf((0L, "a", "1.00"), (1L, "b", "2.00")))
    Rollup.refresh(srcTable, rollup, Seq("k"), Seq("v"))

    def cdc(rows: (Long, String, String, String)*): DataFrame =
      rows.map { case (id, k, v, op) => (id, k, v, op) }.toDF("id", "k", "v", "op")
        .select($"id", $"k", $"v".cast("decimal(10,2)").as("v"), $"op")
    val src = Files.createTempDirectory("sr-mor-src").toString
    // batch 1: update id 0 (a: 1.00 -> 10.00), insert id 2
    writeBatch(cdc((0L, "a", "10.00", "u"), (2L, "c", "5.00", "c")), src, 1)
    // batch 2: delete id 1 (b goes to zero live rows), update id 2
    writeBatch(cdc((1L, "b", "0.00", "d"), (2L, "c", "7.00", "u")), src, 2)

    val q = spark.readStream
      .schema(cdc().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ups = batch.filter(col("op") =!= "d").drop("op")
        val dels = batch.filter(col("op") === "d").select("id")
        if (!ups.isEmpty) { srcTable.mergeIntoMoR(ups, Seq("id")); () }
        if (!dels.isEmpty) { srcTable.deleteWhereExistsMoR(dels, Seq("id")); () }
        Rollup.refresh(srcTable, rollup, Seq("k"), Seq("v"))
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("sr-mor-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def totals(df: DataFrame) = df.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toPlainString)).toSeq
    // final state: a = {id0: 10.00}, c = {id2: 7.00}; b deleted entirely
    totals(rollup.read) shouldBe Seq(("a", 1L, "10.00"), ("c", 1L, "7.00"))
    // bit-equal to the full recompute of the final visible MoR state
    totals(srcTable.read.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))) shouldBe totals(rollup.read)
  }
}
